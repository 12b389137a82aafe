from .engine import GraphEngine  # noqa: F401
