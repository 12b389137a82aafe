"""Checkpoint inspection utilities.

Layout (written by GraphEngine.checkpoint, north-rule schema of
FIXTURES.md §2):

    <root>/<algo>/iter=<k>/part=<p>.parquet   per-shard vertex state
    <root>/<algo>/iter=<k>/metrics.parquet    per-shard iteration metrics
    <root>/<algo>/iter=<k>/lineage.json       algo params + parent info
    <root>/<algo>/iter=<k>/_SUCCESS           commit marker

The engine's resume path (GraphEngine.latest_checkpoint / restore)
consumes these; this module gives users the same visibility from a
plain Python session or a `ray job submit` driver.
"""

from __future__ import annotations

import json
import os

import ray.data as rd
from ray.data import Dataset

from ..graph.engine import GraphEngine

latest_checkpoint = GraphEngine.latest_checkpoint


def list_checkpoints(ckpt_root: str, algo: str) -> list[int]:
    """All COMPLETE (committed) iterations, ascending."""
    d = os.path.join(ckpt_root, algo)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(e.split("=")[1])
        for e in os.listdir(d)
        if e.startswith("iter=")
        and os.path.exists(os.path.join(d, e, "_SUCCESS"))
    )


def read_state(ckpt_root: str, algo: str, it: int | None = None) -> Dataset:
    """Vertex-state Dataset of a checkpoint (latest if it is None)."""
    if it is None:
        it = latest_checkpoint(ckpt_root, algo)
        if it is None:
            raise FileNotFoundError(f"no complete checkpoint under {ckpt_root}/{algo}")
    d = os.path.join(ckpt_root, algo, f"iter={it}")
    parts = [
        os.path.join(d, e) for e in sorted(os.listdir(d))
        if e.startswith("part=")
    ]
    return rd.read_parquet(parts)


def read_metrics(ckpt_root: str, algo: str) -> Dataset:
    """All committed iterations' per-shard metrics rows."""
    files = [
        os.path.join(ckpt_root, algo, f"iter={k}", "metrics.parquet")
        for k in list_checkpoints(ckpt_root, algo)
    ]
    if not files:
        raise FileNotFoundError(f"no metrics under {ckpt_root}/{algo}")
    return rd.read_parquet(files)


def read_lineage(ckpt_root: str, algo: str, it: int | None = None) -> dict:
    if it is None:
        it = latest_checkpoint(ckpt_root, algo)
    with open(
        os.path.join(ckpt_root, algo, f"iter={it}", "lineage.json")
    ) as f:
        return json.load(f)
