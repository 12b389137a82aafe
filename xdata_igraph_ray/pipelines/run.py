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
                             "coreness", "sssp", "louvain", "betweenness",
                             "maxflow", "walks", "mst", "biconnected"])
    ap.add_argument("--weighted", action="store_true",
                    help="use the edge table's weight column")
    ap.add_argument("--source", type=int, default=0)
    ap.add_argument("--target", type=int, default=None)
    ap.add_argument("--num-sources", type=int, default=64,
                    help="betweenness sample size")
    ap.add_argument("--walks", type=int, default=1000)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--seed", type=int, default=42)
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

    if args.algo == "maxflow":
        from ..graph import flow as flowmod

        if args.target is None:
            ap.error("--target is required for maxflow")
        feng = flowmod.flow_network(edges, P=args.num_shards,
                                    weighted=args.weighted)
        r = flowmod.maxflow(feng, args.source, args.target,
                            with_flow=True, with_cut=False)
        r["flow"].write_parquet(args.out + "/result")
        feng.shutdown()
        info = {"value": r["value"]}
        with open(args.out + "/RUN.json", "w") as f:
            json.dump({"algo": "maxflow", **info}, f)
        print(json.dumps({"algo": "maxflow", **info}))
        return info

    if args.algo == "louvain":
        from ..graph.community import louvain

        from ..exchange import block_refs, _coerce_arrow

        refs = block_refs(edges)

        @ray.remote
        def _max_vid(t):
            import pyarrow.compute as pc

            t = _coerce_arrow(t)
            if len(t) == 0:
                return -1
            return max(int(pc.max(t["src"]).as_py()),
                       int(pc.max(t["dst"]).as_py()))

        n = max(int(m) for m in ray.get(
            [_max_vid.remote(r) for r in refs]
        )) + 1
        membership, k = louvain(refs, n=n, P=args.num_shards)
        membership.write_parquet(args.out + "/result")
        info = {"communities": k}
        with open(args.out + "/RUN.json", "w") as f:
            json.dump({"algo": "louvain", **info}, f)
        print(json.dumps({"algo": "louvain", **info}))
        return info

    if args.algo in ("mst", "biconnected"):
        from ..exchange import _coerce_arrow, block_refs

        refs = block_refs(edges)

        @ray.remote
        def _max_vid2(t):
            import pyarrow.compute as pc

            t = _coerce_arrow(t)
            if len(t) == 0:
                return -1
            return max(int(pc.max(t["src"]).as_py()),
                       int(pc.max(t["dst"]).as_py()))

        n = max(int(m) for m in ray.get(
            [_max_vid2.remote(r) for r in refs]
        )) + 1
        if args.algo == "mst":
            from ..graph.mst import minimum_spanning_tree

            out_ds = minimum_spanning_tree(
                refs, n, P=args.num_shards, weighted=args.weighted
            )
            info = {"n": n}
        else:
            from ..graph.biconnectivity import biconnected

            eb, artic, br = biconnected(refs, n, P=args.num_shards)
            artic.write_parquet(args.out + "/articulation_points")
            br.write_parquet(args.out + "/bridges")
            out_ds = eb
            info = {"n": n}
        out_ds.write_parquet(args.out + "/result")
        with open(args.out + "/RUN.json", "w") as f:
            json.dump({"algo": args.algo, **info}, f)
        print(json.dumps({"algo": args.algo, **info}))
        return info

    eng = GraphEngine.from_edges(edges, P=args.num_shards,
                                 weighted=args.weighted)
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

        info = scc(eng, ckpt_root=args.ckpt, ckpt_every=args.ckpt_every,
                   resume=args.resume)
        out_ds = eng.state_dataset(["scc"])
    elif args.algo == "lpa":
        from ..graph.lpa import label_propagation

        info = label_propagation(
            eng, ckpt_root=args.ckpt, ckpt_every=args.ckpt_every,
            resume=args.resume,
        )
        out_ds = eng.state_dataset(["label"])
    elif args.algo == "coreness":
        from ..graph.cores import coreness

        info = {"rounds": coreness(eng)}
        out_ds = eng.state_dataset(["core"])
    elif args.algo == "sssp":
        import numpy as np

        if args.weighted:
            from ..graph.paths import sssp_weighted

            d = sssp_weighted(eng, [args.source])
            info = {"reached": int(np.isfinite(d).sum())}
        else:
            from ..graph.paths import sssp

            d = sssp(eng, [args.source])
            info = {"reached": int((d >= 0).sum())}
        import pyarrow as pa
        import ray.data as rd2

        out_ds = rd2.from_arrow(pa.table({
            "vid": np.arange(eng.n, dtype=np.int64), "dist": d,
        }))
    elif args.algo == "betweenness":
        import numpy as np

        from ..graph.centrality import betweenness

        step = max(1, eng.n // args.num_sources)
        bc = betweenness(eng, sources=np.arange(0, eng.n, step), wave=64)
        import pyarrow as pa
        import ray.data as rd2

        out_ds = rd2.from_arrow(pa.table({
            "vid": np.arange(eng.n, dtype=np.int64), "betweenness": bc,
        }))
        info = {"sources": int(len(np.arange(0, eng.n, step)))}
    elif args.algo == "walks":
        from ..graph.paths import random_walks

        import numpy as np

        starts = np.arange(args.walks, dtype=np.int64) % eng.n
        out_ds = random_walks(eng, starts, args.steps, seed=args.seed,
                              weighted=args.weighted)
        info = {"walks": args.walks, "steps": args.steps}
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
