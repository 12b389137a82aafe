"""Checkpoint/resume evidence at bench scale (VERDICT r4 task 8).

Runs pagerank and lpa on the cached 101.6M-edge bench graph three
ways — uninterrupted, checkpointing every K iterations, and resumed
from a mid-run checkpoint — and reports checkpoint bytes, write and
restore walls, and whether resumed == uninterrupted bit-for-bit.

    python tools/ckpt_scale.py [--vertices 8000000]
"""

from __future__ import annotations

import argparse
import glob
import hashlib
import json
import os
import shutil
import sys
import time

import numpy as np


def _state_hash(eng, key) -> str:
    arrs = eng.state_arrays(key)
    return hashlib.sha256(np.ascontiguousarray(arrs).tobytes()).hexdigest()[:16]


def _dir_bytes(root) -> int:
    return sum(os.path.getsize(f) for f in
               glob.glob(os.path.join(root, "**", "*"), recursive=True)
               if os.path.isfile(f))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vertices", type=int, default=8_000_000)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--P", type=int, default=32)
    args = ap.parse_args()

    import ray
    import ray.data as rd
    ray.init(address="local", num_cpus=args.cpus,
             include_dashboard=False, logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False
    import logging
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    from xdata_igraph_ray.graph.engine import GraphEngine
    from xdata_igraph_ray.graph.lpa import label_propagation
    from xdata_igraph_ray.graph.pagerank import pagerank

    path = bench._edges_parquet(args.vertices)
    edges = rd.read_parquet(path, override_num_blocks=args.P)
    out = {"vertices": args.vertices, "P": args.P}

    for algo, state_key in (("pagerank", "pr"), ("lpa", "label")):
        ck = f"/tmp/ckpt_scale_{algo}"
        shutil.rmtree(ck, ignore_errors=True)

        def run(ckpt_root=None, resume=False):
            eng = GraphEngine.from_edges(edges, n=args.vertices, P=args.P)
            t0 = time.time()
            if algo == "pagerank":
                info = pagerank(eng, tol=1e-6, ckpt_root=ckpt_root,
                                ckpt_every=5, resume=resume)
            else:
                info = label_propagation(eng, max_iter=60,
                                         ckpt_root=ckpt_root,
                                         ckpt_every=5, resume=resume)
            wall = time.time() - t0
            h = _state_hash(eng, state_key)
            eng.shutdown()
            return wall, h, info

        wall_plain, h_plain, info_plain = run()
        wall_ckpt, h_ckpt, info_ckpt = run(ckpt_root=ck)
        ckpt_bytes = _dir_bytes(ck)
        # drop the final checkpoints so resume starts mid-run
        its = sorted(
            int(os.path.basename(d).split("=")[1])
            for d in glob.glob(os.path.join(ck, algo, "iter=*")))
        keep_until = its[len(its) // 2] if len(its) > 1 else its[0]
        for d in glob.glob(os.path.join(ck, algo, "iter=*")):
            if int(os.path.basename(d).split("=")[1]) > keep_until:
                shutil.rmtree(d)
        t0 = time.time()
        wall_res, h_res, info_res = run(ckpt_root=ck, resume=True)
        out[algo] = {
            "wall_plain_s": round(wall_plain, 2),
            "wall_ckpt_s": round(wall_ckpt, 2),
            "ckpt_overhead_s": round(wall_ckpt - wall_plain, 2),
            "ckpt_bytes": ckpt_bytes,
            "n_checkpoints": len(its),
            "resumed_from_iter": keep_until,
            "wall_resume_s": round(wall_res, 2),
            "hash_plain": h_plain,
            "hash_ckpt": h_ckpt,
            "hash_resumed": h_res,
            "resume_identical": h_res == h_plain == h_ckpt,
        }
        print(json.dumps({algo: out[algo]}), flush=True)
        shutil.rmtree(ck, ignore_errors=True)

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
