"""xdata_igraph_ray — a Ray-Data-native link-graph analytics engine.

Built from scratch (NOT a port) with the query semantics of
igraph/xdata-igraph (reference at /root/reference, cited per-module as
``file:line``).  Pipelines are ``ray.data.Dataset`` transforms; the
iterative graph kernels (PageRank, WCC, SCC, LPA) run on a partitioned
BSP shard engine (per-vertex-range CSR Arrow/numpy blocks held in Ray
actors, combiner-pre-aggregated message exchange through the object
store) because a per-superstep Ray Data ``groupby`` all-to-all costs
10-30 s of fixed overhead per iteration in this Ray version (measured;
see BASELINE.md) — two orders of magnitude more than the exchange
itself.  Datasets remain the ingress/egress interface everywhere.

Nothing in this package calls ``ray.init()``; sessions are owned by the
caller (bench.py, tests/conftest.py, or the driving harness).
"""

__version__ = "0.1.0"
