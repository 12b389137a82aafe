"""10^9-edge soak of the north-rule kernels (VERDICT r4 task 1).

Generates a power-law web-shaped edge table in resumable per-chunk
parquet files (same distribution family as sources/synth.generate_edges
— capped-zipf out-degree, zipf-over-rank targets — but chunk-parallel:
each chunk draws from its own seeded PCG64 stream and targets mix
through a fixed affine bijection instead of a materialized 80M-entry
permutation, so generation is O(chunk) memory and embarrassingly
parallel), then runs pagerank / wcc / lpa / triangles with per-kernel
walls, resident shard bytes, object-store peak, and spill evidence.

Usage:
    python tools/soak.py gen  [--vertices 80000000] [--chunks 64]
    python tools/soak.py run  [--kernels pagerank,wcc,lpa,triangles]

The engine runs narrow=True (int32 CSR arrays — bit-identical to the
int64 engine for these kernels, test_engine_modes.py) so the 2x1.0e9
resident arcs fit the single 128 GiB node; a real cluster would not
need it at this scale but benefits identically in DRAM traffic.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import threading
import time

import numpy as np

SEED = 42
MEAN_OUT = 12.0
DANGLING = 0.05
# fixed odd multiplier (Fibonacci-hash constant); made coprime with n
# at runtime — spreads zipf ranks over vids like synth's permutation
AFFINE_A = 2_654_435_761
AFFINE_B = 1_442_695_040_888_963_407 % (1 << 31)


def _chunk_edges(n: int, chunk: int, chunks: int, seed: int):
    """(src, dst) int64 arrays for this chunk's vertex range."""
    import math

    lo = chunk * n // chunks
    hi = (chunk + 1) * n // chunks
    rng = np.random.default_rng(np.random.PCG64(seed * 100_003 + chunk))
    size = hi - lo
    k = np.minimum(rng.zipf(1.7, size), 4 * int(MEAN_OUT) + 8)
    k = np.maximum(1, np.round(k * (MEAN_OUT / 5.7))).astype(np.int64)
    k[rng.random(size) < DANGLING] = 0
    total = int(k.sum())
    ranks = rng.zipf(1.3, total)
    a = AFFINE_A
    while math.gcd(a, n) != 1:
        a += 2
    dst = ((ranks - 1) % n * a + AFFINE_B) % n
    src = np.repeat(np.arange(lo, hi, dtype=np.int64), k)
    return src, dst.astype(np.int64)


def cmd_gen(args):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    os.makedirs(args.dir, exist_ok=True)
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level="ERROR")

    @ray.remote
    def gen_one(c):
        path = os.path.join(args.dir, f"edges_{c:05d}.parquet")
        if os.path.exists(path):
            return pq.read_metadata(path).num_rows
        src, dst = _chunk_edges(args.vertices, c, args.chunks, SEED)
        pq.write_table(pa.table({"src": src, "dst": dst}), path + ".tmp",
                       compression="zstd")
        os.rename(path + ".tmp", path)
        return len(src)

    t0 = time.time()
    counts = ray.get([gen_one.remote(c) for c in range(args.chunks)])
    total = int(sum(counts))
    print(json.dumps({
        "vertices": args.vertices, "edges": total,
        "chunks": args.chunks, "gen_s": round(time.time() - t0, 1),
        "bytes": sum(os.path.getsize(p) for p in
                     glob.glob(os.path.join(args.dir, "*.parquet"))),
    }))
    ray.shutdown()


class _StorePeak(threading.Thread):
    """Samples object-store usage + spill bytes every second."""

    def __init__(self):
        super().__init__(daemon=True)
        import ray
        self._ray = ray
        self.total = ray.cluster_resources().get("object_store_memory", 0)
        self.peak = 0.0
        self.stop = threading.Event()

    def run(self):
        while not self.stop.is_set():
            try:
                avail = self._ray.available_resources().get(
                    "object_store_memory", self.total)
                self.peak = max(self.peak, self.total - avail)
            except Exception:
                pass
            self.stop.wait(1.0)

    def spill_bytes(self) -> int:
        tot = 0
        pats = ("/tmp/ray/session_*/ray_spilled_objects*",
                "/tmp/ray/ray/session_*/ray_spilled_objects*",
                "/tmp/ray/*/session_*/ray_spilled_objects*")
        for pat in pats:
            for d in glob.glob(pat):
                for f in glob.glob(os.path.join(d, "*")):
                    try:
                        tot += os.path.getsize(f)
                    except OSError:
                        pass
        return tot


def cmd_run(args):
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=args.cpus,
             include_dashboard=False, logging_level="ERROR",
             object_store_memory=args.object_store_gb << 30)
    rd.DataContext.get_current().enable_progress_bars = False
    import logging
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from xdata_igraph_ray.graph.engine import GraphEngine

    n = args.vertices
    P = args.P
    kernels = args.kernels.split(",")
    peak = _StorePeak()
    peak.start()
    out = {"vertices": n, "P": P, "num_cpus": args.cpus,
           "narrow": True, "kernels": {}}

    files = sorted(glob.glob(os.path.join(args.dir, "*.parquet")))
    if not files:
        raise SystemExit(f"no chunks in {args.dir}; run gen first")
    edges = rd.read_parquet(files, override_num_blocks=max(P, len(files)))

    eng = None
    if {"pagerank", "wcc", "lpa"} & set(kernels):
        t0 = time.time()
        eng = GraphEngine.from_edges(edges, n=n, P=P, narrow=True)
        build_s = time.time() - t0
        mems = ray.get([s.mem_report.remote() for s in eng.shards])
        out["edges"] = eng.edge_count
        out["build_s"] = round(build_s, 1)
        out["resident_csr_gb"] = round(
            sum(m["csr"] for m in mems) / 2**30, 2)
        out["resident_rss_gb"] = round(
            sum(m["rss"] for m in mems) / 2**30, 2)
        out["build_store_peak_gb"] = round(peak.peak / 2**30, 2)

    for kern in kernels:
        t0 = time.time()
        info = {}
        if kern == "pagerank":
            from xdata_igraph_ray.graph.pagerank import pagerank
            r = pagerank(eng, tol=1e-6)
            info = {"iterations": r.get("iterations"),
                    "edges_per_sec": round(r.get("edges_per_sec", 0)),
                    "recv_bytes": r.get("recv_bytes")}
        elif kern == "wcc":
            from xdata_igraph_ray.graph.components import wcc as wcc_fn
            r = wcc_fn(eng)
            info = {"iterations": r.get("iterations"),
                    "components": r.get("components")}
        elif kern == "lpa":
            from xdata_igraph_ray.graph.lpa import label_propagation
            r = label_propagation(eng, max_iter=60)
            info = {"iterations": r.get("iterations"),
                    "communities": r.get("communities")}
        elif kern == "triangles":
            if eng is not None:
                eng.shutdown()
                eng = None
            from xdata_igraph_ray.graph.triangles import triangles
            total, _ = triangles(edges, n=n, P=P, per_vertex=False)
            info = {"triangles_total": int(total)}
        info["wall_s"] = round(time.time() - t0, 1)
        info["store_peak_gb"] = round(peak.peak / 2**30, 2)
        info["spill_bytes"] = peak.spill_bytes()
        out["kernels"][kern] = info
        print(json.dumps({kern: info}), flush=True)

    if eng is not None:
        eng.shutdown()
    peak.stop.set()
    out["store_peak_gb"] = round(peak.peak / 2**30, 2)
    out["spill_bytes_final"] = peak.spill_bytes()
    print(json.dumps(out))
    ray.shutdown()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["gen", "run"])
    ap.add_argument("--vertices", type=int, default=80_000_000)
    ap.add_argument("--chunks", type=int, default=64)
    ap.add_argument("--dir", default="/tmp/soak_edges")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--P", type=int, default=32)
    ap.add_argument("--object-store-gb", type=int, default=20)
    ap.add_argument("--kernels",
                    default="pagerank,wcc,lpa,triangles")
    args = ap.parse_args()
    if args.mode == "gen":
        cmd_gen(args)
    else:
        cmd_run(args)


if __name__ == "__main__":
    main()
