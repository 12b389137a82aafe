"""Job entrypoint: the ``ray job submit`` surface of the engine.

    python -m xdata_igraph_ray.pipelines.run \
        --algo pagerank --edges /path/edges_parquet --out /path/out \
        --ckpt /path/ckpt --resume

Reads an edge table (or a pages table with ``--pages``, running the
extraction + dictionary build first), runs the requested algorithm
with per-iteration Parquet checkpoints + lineage + metrics, and writes
the result as partitioned Parquet.  A killed run restarted with
``--resume`` continues from the last complete ``iter=k`` checkpoint
(GraphEngine.latest_checkpoint scans for ``_SUCCESS`` markers).

Owns its Ray session only when none exists (``ray job submit`` drivers
init Ray themselves).
"""

from __future__ import annotations

import argparse
import json
import logging
import sys


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--algo", required=True,
                    choices=["pagerank", "wcc", "scc", "lpa", "triangles",
                             "coreness"])
    ap.add_argument("--edges", help="edge-table parquet path/dir")
    ap.add_argument("--pages", help="pages parquet (extraction ingest path)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--ckpt")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--num-shards", type=int, default=8)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--damping", type=float, default=0.85)
    ap.add_argument("--max-iter", type=int, default=200)
    ap.add_argument("--ckpt-every", type=int, default=5)
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=args.num_cpus,
            include_dashboard=False, logging_level="ERROR",
        )
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from ..graph.engine import GraphEngine

    if args.pages:
        from ..graph.build import build_graph_tables

        from ..sources.readers import read_parquet_clean

        verts, edges = build_graph_tables(read_parquet_clean(args.pages),
                                          P=args.num_shards)
        verts.write_parquet(args.out + "/vertices")
    elif args.edges:
        from ..sources.readers import read_parquet_clean

        edges = read_parquet_clean(args.edges)
    else:
        ap.error("one of --edges / --pages is required")

    eng = GraphEngine.from_edges(edges, P=args.num_shards)
    info: dict
    if args.algo == "pagerank":
        from ..graph.pagerank import pagerank

        info = pagerank(
            eng, damping=args.damping, tol=args.tol, max_iter=args.max_iter,
            ckpt_root=args.ckpt, ckpt_every=args.ckpt_every,
            resume=args.resume,
        )
        out_ds = eng.state_dataset(["pr"], rename={"pr": "score"})
    elif args.algo == "wcc":
        from ..graph.components import wcc

        info = wcc(eng, ckpt_root=args.ckpt, ckpt_every=args.ckpt_every,
                   resume=args.resume)
        out_ds = eng.state_dataset(["label"], rename={"label": "wcc"})
    elif args.algo == "scc":
        from ..graph.components import scc

        info = scc(eng)
        out_ds = eng.state_dataset(["scc"])
    elif args.algo == "lpa":
        from ..graph.lpa import label_propagation

        info = label_propagation(eng)
        out_ds = eng.state_dataset(["label"])
    elif args.algo == "coreness":
        from ..graph.cores import coreness

        info = {"rounds": coreness(eng)}
        out_ds = eng.state_dataset(["core"])
    else:  # triangles
        from ..graph.triangles import triangles

        total, per_v = triangles(edges, eng.n, P=args.num_shards)
        info = {"total": total}
        out_ds = per_v

    out_ds.write_parquet(args.out + "/result")
    with open(args.out + "/RUN.json", "w") as f:
        json.dump({"algo": args.algo, **{k: v for k, v in info.items()}}, f)
    print(json.dumps({"algo": args.algo, **info}))
    return info


if __name__ == "__main__":
    main()
