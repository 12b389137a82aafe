#!/usr/bin/env python
"""Headline benchmarks.  Prints ONE JSON line:
{"metric": ..., "value": <headline sec>, "unit": "sec",
 "queries": {...}, "sf": ..., "num_cpus": N, ...extras}

Workloads (BASELINE.md):
* pagerank_web — PageRank (damping .85, tol 1e-6) on the deterministic
  power-law web graph (>= 1e7 edges by default; override with
  GRAFT_BENCH_VERTICES).  The headline value; edges/sec + iterations
  reported alongside.
* wcc_web / lpa_web — components + label propagation on the same graph.
* extract_pages — html->text+edges extraction over the pages fixture.
* triangles_web — exact triangle count on a medium power-law graph.
* dedup/knn/query benches over the $GRAFT_SF_DIR tables.

`bench.py --scaling` runs the same job in two fresh processes at
num_cpus=8 and 32 (N vs 4N stand-in, see BASELINE.md) and reports both
throughputs + scaling efficiency.
"""

from __future__ import annotations

import json
import logging
import os
import subprocess
import sys
import time

from xdata_igraph_ray.sources.readers import read_parquet_clean as _read_pq

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_V = int(os.environ.get("GRAFT_BENCH_VERTICES", "1000000"))
TRI_V = int(os.environ.get("GRAFT_TRI_VERTICES", "200000"))
CACHE = "/tmp/graft_bench"



def _cpu_times():
    """(total_jiffies, steal_jiffies) from /proc/stat — BASELINE.md §5:
    this sandbox sees 20-30% hypervisor steal storms; every timed
    workload reports the steal%% observed during its own window so a
    slow number is attributable."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        return sum(vals), (vals[7] if len(vals) > 7 else 0)
    except Exception:
        return 0, 0


class _Timed:
    """Context manager: wall time into queries[name], steal%% of the
    window into steal[name]."""

    def __init__(self, queries, steal, name):
        self.q, self.s, self.name = queries, steal, name

    def __enter__(self):
        self.t0 = time.time()
        self.c0 = _cpu_times()
        return self

    def __exit__(self, *exc):
        tot0, st0 = self.c0
        tot1, st1 = _cpu_times()
        self.q[self.name] = round(time.time() - self.t0, 3)
        dt = tot1 - tot0
        self.s[self.name] = round(100.0 * (st1 - st0) / dt, 1) if dt else 0.0
        return False


def _edges_parquet(n: int) -> str:
    """Edge table cached on disk so scaling runs share the same input
    (and generation stays off the clock)."""
    import pyarrow.parquet as pq

    from xdata_igraph_ray.sources.synth import GEN_VERSION

    path = os.path.join(CACHE, f"edges_v{GEN_VERSION}_{n}.parquet")
    if not os.path.exists(path):
        os.makedirs(CACHE, exist_ok=True)
        from xdata_igraph_ray.sources.synth import generate_edges

        pq.write_table(generate_edges(n, seed=42), path + ".tmp",
                       row_group_size=1 << 20)
        os.replace(path + ".tmp", path)
    return path


def _layered_flow_parquet() -> str:
    """Deterministic 50x2000 layered flow network (~1M edges): s feeds
    layer 0, layer 49 feeds t, every unit of flow crosses all layers."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(CACHE, "flow_layered_50x2000.parquet")
    if not os.path.exists(path):
        os.makedirs(CACHE, exist_ok=True)
        rng = np.random.default_rng(2)
        L, W, K = 50, 2000, 10
        s, t = L * W, L * W + 1
        src_l, dst_l, cap_l = [], [], []
        for layer in range(L - 1):
            u = np.repeat(np.arange(layer * W, (layer + 1) * W), K)
            v = (layer + 1) * W + rng.integers(0, W, len(u))
            src_l.append(u)
            dst_l.append(v)
            cap_l.append(rng.integers(1, 8, len(u)).astype(float))
        src_l.append(np.full(W, s))
        dst_l.append(np.arange(W))
        cap_l.append(np.full(W, 20.0))
        src_l.append(np.arange((L - 1) * W, L * W))
        dst_l.append(np.full(W, t))
        cap_l.append(np.full(W, 20.0))
        tbl = pa.table({
            "src": np.concatenate(src_l), "dst": np.concatenate(dst_l),
            "weight": np.concatenate(cap_l),
        })
        pq.write_table(tbl, path + ".tmp", row_group_size=1 << 20)
        os.replace(path + ".tmp", path)
    return path


def _sqrt_probe() -> float:
    """Single-core speed probe (BASELINE.md §5/§6): 10M math.sqrt
    iterations.  ~0.7-0.9 s on a healthy instance class, 1.3-2.2 s on
    the slow/throttled classes — printed in the JSON so every bench
    artifact carries its own host attribution."""
    import math

    t0 = time.time()
    x = 0.0
    for i in range(10_000_000):
        x += math.sqrt(i)
    return round(time.time() - t0, 3)


def main():
    import ray
    import ray.data as rd

    probe_before = _sqrt_probe()
    ray.init(
        address="local", num_cpus=NCPU, include_dashboard=False,
        logging_level="ERROR",
    )
    rd.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from xdata_igraph_ray.graph.components import wcc
    from xdata_igraph_ray.graph.engine import GraphEngine
    from xdata_igraph_ray.graph.lpa import label_propagation
    from xdata_igraph_ray.graph.pagerank import pagerank
    from xdata_igraph_ray.graph.triangles import triangles
    from xdata_igraph_ray.stages.extract import extracted_edges

    queries: dict[str, float] = {}
    steal: dict[str, float] = {}
    extras: dict = {}
    P = int(os.environ.get("GRAFT_BENCH_P", max(2, min(NCPU, 32))))

    # -- pagerank / wcc / lpa on the big web graph -------------------------
    path = _edges_parquet(BENCH_V)
    # one read block per engine shard: Ray's default splits a cached
    # 33 MB file into ~200 tiny blocks whose routing/ingest overhead
    # dominated build_graph (measured 56 s -> 2.8 s on the read step)
    edges = _read_pq(path, override_num_blocks=P)
    # warm the OS page cache with a REAL data pass (parquet count()
    # reads only metadata), so timed runs measure compute+shuffle
    with open(path, "rb") as f:
        while f.read(1 << 24):
            pass
    with _Timed(queries, steal, "build_graph"):
        eng = GraphEngine.from_edges(edges, n=BENCH_V, P=P)

    with _Timed(queries, steal, "pagerank_web"):
        info = pagerank(eng, tol=1e-6)
    extras["pagerank_iterations"] = info["iterations"]
    extras["pagerank_edges_per_sec"] = round(info["edges_per_sec"])
    extras["edges"] = eng.edge_count

    if os.environ.get("GRAFT_BENCH_FAST"):
        # scaling mode: headline job only
        out = {
            "metric": "pagerank_web_wall_sec (1e-6 tol, power-law web graph)",
            "value": queries["pagerank_web"], "unit": "sec",
            "queries": queries, "steal_pct": steal, "sf": SF_DIR,
            "num_cpus": NCPU, "sqrt_probe_s": probe_before, **extras,
        }
        print(json.dumps(out))
        eng.shutdown()
        ray.shutdown()
        return out

    with _Timed(queries, steal, "wcc_web"):
        wcc(eng)

    with _Timed(queries, steal, "lpa_web"):
        label_propagation(eng, max_iter=60)
    eng.shutdown()

    # -- triangles on a medium power-law graph -----------------------------
    # first call pays exchange-pool worker spin-up + parquet read
    # (BASELINE.md §6 addendum: 3.8 s cold vs 1.3 s warm on the same
    # count) — report the cold run as an extra and time steady state
    tri_path = _edges_parquet(TRI_V)
    with _Timed(extras_t := {}, steal, "triangles_web_cold"):
        total, _ = triangles(
            _read_pq(tri_path, override_num_blocks=P), n=TRI_V, P=P,
            per_vertex=False
        )
    extras["triangles_web_cold_s"] = extras_t["triangles_web_cold"]
    with _Timed(queries, steal, "triangles_web"):
        total, _ = triangles(
            _read_pq(tri_path, override_num_blocks=P), n=TRI_V, P=P,
            per_vertex=False
        )
    extras["triangles_total"] = total

    # -- round-2 operators on the medium graph -----------------------------
    import numpy as np

    from xdata_igraph_ray.graph.centrality import betweenness
    from xdata_igraph_ray.graph.community import louvain

    eng2 = GraphEngine.from_edges(_read_pq(tri_path), n=TRI_V, P=P)
    with _Timed(queries, steal, "betweenness_sampled_web"):
        bc = betweenness(
            eng2, sources=np.arange(0, TRI_V, TRI_V // 64), wave=64
        )
    eng2.shutdown()

    with _Timed(queries, steal, "louvain_web"):
        _, ncomm = louvain(_read_pq(tri_path), n=TRI_V, P=P)
    extras["louvain_communities"] = ncomm

    # -- max-flow on a deep layered network (flow crosses 50 layers) -------
    from xdata_igraph_ray.graph import flow as flowmod

    mf_path = _layered_flow_parquet()
    with _Timed(queries, steal, "maxflow_layered"):
        eng3 = flowmod.flow_network(
            _read_pq(mf_path), n=50 * 2000 + 2, P=P
        )
        r = flowmod.maxflow(eng3, 50 * 2000, 50 * 2000 + 1,
                            with_flow=False, with_cut=True)
        eng3.shutdown()
    cutcap = float(sum(r["cut"]["capacity"].to_pylist()))
    assert abs(cutcap - r["value"]) < 1e-6, "max-flow-min-cut certificate"
    extras["maxflow_value"] = r["value"]

    # -- extraction over the pages fixture ---------------------------------
    import __ray_entry__ as entry

    paths = entry.pages_fixture(SF_DIR)
    pages = _read_pq(paths["pages"])
    pages.count()  # warm
    with _Timed(queries, steal, "extract_pages"):
        extracted_edges(pages).materialize()

    # -- sf-table benches ---------------------------------------------------
    with _Timed(queries, steal, "lineitem_pricing"):
        entry.q_lineitem_pricing(SF_DIR).materialize()

    with _Timed(queries, steal, "minhash_docs"):
        entry.q_minhash_pairs(SF_DIR).materialize()

    with _Timed(queries, steal, "knn_embeddings"):
        entry.q_knn(SF_DIR)

    out = {
        "metric": "pagerank_web_wall_sec (1e-6 tol, power-law web graph)",
        "value": queries["pagerank_web"],
        "unit": "sec",
        "queries": queries,
        "steal_pct": steal,
        "sf": SF_DIR,
        "num_cpus": NCPU,
        "sqrt_probe_s": probe_before,
        "sqrt_probe_after_s": _sqrt_probe(),
        **extras,
    }
    print(json.dumps(out))
    ray.shutdown()
    return out


def _bw_worker(barrier, n, passes, q):
    """STREAM-style 'add' kernel: c = a + b over n float64 elements,
    3 x 8 bytes of memory traffic per element per pass."""
    import numpy as np

    a = np.ones(n)
    b = np.ones(n)
    c = np.zeros(n)
    np.add(a, b, out=c)  # fault every page before the timed window
    barrier.wait()
    t0 = time.time()
    for _ in range(passes):
        np.add(a, b, out=c)
    q.put(time.time() - t0)


def _sqrt_worker(barrier, iters, q):
    import math

    barrier.wait()
    t0 = time.time()
    x = 0.0
    for i in range(iters):
        x += math.sqrt(i)
    q.put(time.time() - t0)


def bwprobe():
    """Direct evidence for the single-node memory-bandwidth ceiling
    (BASELINE.md §6/§7): measure aggregate DRAM bandwidth with P
    barrier-synced STREAM-add processes (arrays 16x any LLC) and, as a
    control, aggregate scalar-compute throughput with the same process
    counts.  If compute scales ~P/8 from 8 to 32 procs while bandwidth
    stays ~flat, a bandwidth-bound kernel CANNOT scale 8->32 cpus on
    this box — while a real N->4N *node* scale-out adds memory
    controllers per node.  Prints one JSON line."""
    import multiprocessing as mp

    ctx = mp.get_context("spawn")
    n = (128 << 20) // 8  # 128 MiB per array, 3 arrays per process
    passes = 8
    sqrt_iters = 10_000_000
    levels = [1, 8, 32]
    bw, sq = {}, {}
    for P in levels:
        for kind in ("bw", "sqrt"):
            barrier = ctx.Barrier(P)
            q = ctx.Queue()
            target = _bw_worker if kind == "bw" else _sqrt_worker
            args = ((barrier, n, passes, q) if kind == "bw"
                    else (barrier, sqrt_iters, q))
            procs = [ctx.Process(target=target, args=args)
                     for _ in range(P)]
            for p in procs:
                p.start()
            times = sorted(q.get() for _ in procs)
            for p in procs:
                p.join()
            if kind == "bw":
                gbps = P * passes * 3 * 8 * n / max(times) / 1e9
                bw[str(P)] = {"GBps": round(gbps, 1),
                              "t_min": round(times[0], 3),
                              "t_max": round(times[-1], 3)}
            else:
                rate = P * sqrt_iters / max(times) / 1e6
                sq[str(P)] = {"Mops": round(rate, 1),
                              "t_min": round(times[0], 3),
                              "t_max": round(times[-1], 3)}
    print(json.dumps({
        "metric": "memory-bandwidth ceiling probe (STREAM add, 128 MiB "
                  "arrays, barrier-synced) + scalar-compute control",
        "stream_add": bw,
        "sqrt_compute": sq,
        "bw_scaling_8_to_32":
            round(bw["32"]["GBps"] / bw["8"]["GBps"], 2),
        "sqrt_scaling_8_to_32":
            round(sq["32"]["Mops"] / sq["8"]["Mops"], 2),
    }))


def scalerun(workload: str):
    """Child mode: time ONE kernel on the cached BENCH_V graph in this
    process's fresh Ray session and print one JSON line.  Setup that a
    steady-state cluster amortizes (engine build, exchange-pool worker
    spin-up on a tiny graph) runs untimed first, so each leg measures
    the kernel, not process cold-start."""
    import ray
    import ray.data as rd

    probe = _sqrt_probe()
    ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
             logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from xdata_igraph_ray.graph.engine import GraphEngine

    P = int(os.environ.get("GRAFT_BENCH_P", max(2, min(NCPU, 32))))
    path = _edges_parquet(BENCH_V)
    with open(path, "rb") as f:  # OS page cache warm (real data pass)
        while f.read(1 << 24):
            pass
    edges = _read_pq(path, override_num_blocks=P)
    queries: dict[str, float] = {}
    steal: dict[str, float] = {}
    extras: dict = {"edges": None}

    if workload in ("pagerank", "wcc", "lpa"):
        from xdata_igraph_ray.graph.components import wcc as wcc_fn
        from xdata_igraph_ray.graph.lpa import label_propagation
        from xdata_igraph_ray.graph.pagerank import pagerank

        narrow = os.environ.get("GRAFT_NARROW", "0") == "1"
        eng = GraphEngine.from_edges(edges, n=BENCH_V, P=P,
                                     narrow=narrow)  # untimed
        extras["edges"] = eng.edge_count
        extras["per_dest_refs"] = eng.per_dest_refs
        extras["narrow"] = narrow
        if workload == "pagerank":
            with _Timed(queries, steal, workload):
                info = pagerank(eng, tol=1e-6)
            extras["iterations"] = info["iterations"]
            extras["edges_per_sec"] = round(info["edges_per_sec"])
            extras["recv_bytes"] = info["recv_bytes"]
        elif workload == "wcc":
            with _Timed(queries, steal, workload):
                wcc_fn(eng)
        else:
            with _Timed(queries, steal, workload):
                info = label_propagation(eng, max_iter=60)
            extras["iterations"] = info["iterations"]
            extras["recv_bytes"] = info["recv_bytes"]
        eng.shutdown()
    elif workload == "triangles":
        from xdata_igraph_ray.graph.triangles import triangles

        tiny = _edges_parquet(20_000)
        triangles(_read_pq(tiny), n=20_000, P=P, per_vertex=False)  # warm
        tri_stats: dict = {}
        with _Timed(queries, steal, workload):
            total, _ = triangles(edges, n=BENCH_V, P=P,
                                 per_vertex=False, stats=tri_stats)
        extras["triangles_total"] = total
        extras.update(tri_stats)
    elif workload == "louvain":
        from xdata_igraph_ray.graph import community as communitymod
        from xdata_igraph_ray.graph.community import louvain

        with _Timed(queries, steal, workload):
            _, ncomm = louvain(edges, n=BENCH_V, P=P)
        extras["communities"] = ncomm
        extras["recv_bytes"] = communitymod.LAST_RUN_STATS.get(
            "recv_bytes")
    elif workload == "betweenness":
        from xdata_igraph_ray.graph.centrality import betweenness

        tri_path = _edges_parquet(TRI_V)
        eng2 = GraphEngine.from_edges(
            _read_pq(tri_path, override_num_blocks=P), n=TRI_V, P=P)
        extras["edges"] = eng2.edge_count
        import numpy as _np

        with _Timed(queries, steal, workload):
            bc = betweenness(
                eng2, sources=_np.arange(0, TRI_V, TRI_V // 64), wave=64)
        extras["bc_sum"] = round(float(bc.sum()), 2)
        eng2.shutdown()
    elif workload == "maxflow":
        from xdata_igraph_ray.graph import flow as flowmod

        mf_path = _layered_flow_parquet()
        eng3 = flowmod.flow_network(
            _read_pq(mf_path), n=50 * 2000 + 2, P=P)  # untimed build
        with _Timed(queries, steal, workload):
            r = flowmod.maxflow(eng3, 50 * 2000, 50 * 2000 + 1,
                                with_flow=False, with_cut=False)
        extras["maxflow_value"] = r["value"]
        eng3.shutdown()
    elif workload in ("extract10x", "minhash10x"):
        # 10x-the-fixture corpora so the compute portion dominates the
        # fixed session/stage overhead (the sf0.1 legs are floor-bound:
        # 100k pages / 5k docs — BASELINE §7 webtext table)
        if workload == "extract10x":
            from xdata_igraph_ray.sources.synth import generate_pages
            from xdata_igraph_ray.stages.extract import extracted_edges

            paths = generate_pages("/tmp/graft_bench/pages_1m",
                                   1_000_000, seed=42)
            pages = rd.read_parquet(paths["pages"],
                                    override_num_blocks=2 * P)
            pages.count()  # warm the read
            with _Timed(queries, steal, workload):
                out = extracted_edges(pages).materialize()
            extras["rows"] = out.count()
        else:
            from xdata_igraph_ray.sources.synth import generate_documents
            from xdata_igraph_ray.stages.dedup import minhash_lsh_pairs

            ddir = generate_documents("/tmp/graft_bench/docs_100k",
                                      100_000, seed=42)
            docs = rd.read_parquet(ddir, override_num_blocks=P)
            docs.count()  # warm
            with _Timed(queries, steal, workload):
                out = minhash_lsh_pairs(
                    docs, threshold=0.7, P=P).materialize()
            extras["rows"] = out.count()
    elif workload in ("extract", "minhash"):
        # webtext data-pipeline stages over the sf fixture (these don't
        # consume the cached edge graph)
        import __ray_entry__ as entry

        if workload == "extract":
            from xdata_igraph_ray.stages.extract import extracted_edges

            paths = entry.pages_fixture(SF_DIR)
            pages = _read_pq(paths["pages"])
            pages.count()  # warm the read
            with _Timed(queries, steal, workload):
                out = extracted_edges(pages).materialize()
            extras["rows"] = out.count()
        else:
            entry.q_lineitem_pricing(SF_DIR).materialize()  # warm session
            with _Timed(queries, steal, workload):
                out = entry.q_minhash_pairs(SF_DIR).materialize()
            extras["rows"] = out.count()
    else:
        raise SystemExit(f"unknown scalerun workload {workload!r}")

    print(json.dumps({
        "workload": workload, "wall_s": queries[workload],
        "steal_pct": steal[workload], "num_cpus": NCPU, "P": P,
        "vertices": BENCH_V, "sqrt_probe_s": probe, **extras,
    }))
    ray.shutdown()


def scaling_all():
    """Paired 8-vs-32-cpu legs for each workload in
    $GRAFT_SCALING_WORKLOADS (default: pagerank,lpa,louvain,triangles)
    on the same cached >=1e8-edge input; prints one JSON line per
    workload with per-round PAIRED efficiencies (legs of a pair run
    back-to-back so host drift cancels — BASELINE.md §6)."""
    scale_v = int(os.environ.get("GRAFT_BENCH_VERTICES", "8000000"))
    _edges_parquet(scale_v)
    workloads = os.environ.get(
        "GRAFT_SCALING_WORKLOADS", "pagerank,lpa,louvain,triangles"
    ).split(",")
    rounds = int(os.environ.get("GRAFT_SCALING_ROUNDS", "2"))
    lo, hi = 8, 32

    def run(workload: str, ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_BENCH_VERTICES=str(scale_v))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--scalerun", workload],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    results = {}
    for w in workloads:
        w = w.strip()
        lo_r, hi_r = [], []
        for _ in range(rounds):
            lo_r.append(run(w, lo))
            hi_r.append(run(w, hi))
        t_lo = min(r["wall_s"] for r in lo_r)
        t_hi = min(r["wall_s"] for r in hi_r)
        paired = [round((a["wall_s"] / b["wall_s"]) / (hi / lo), 3)
                  for a, b in zip(lo_r, hi_r)]
        row = {
            "sec_8": t_lo, "sec_32": t_hi,
            "sec_8_rounds": [r["wall_s"] for r in lo_r],
            "sec_32_rounds": [r["wall_s"] for r in hi_r],
            "steal_8_rounds": [r["steal_pct"] for r in lo_r],
            "steal_32_rounds": [r["steal_pct"] for r in hi_r],
            "probe_8_rounds": [r["sqrt_probe_s"] for r in lo_r],
            "probe_32_rounds": [r["sqrt_probe_s"] for r in hi_r],
            "scaling_efficiency": round((t_lo / t_hi) / (hi / lo), 3),
            "scaling_efficiency_paired_rounds": paired,
        }
        for k in ("edges", "iterations", "recv_bytes", "triangles_total",
                  "communities", "per_dest_refs"):
            if k in hi_r[-1]:
                row[k] = hi_r[-1][k]
        results[w] = row
        print(json.dumps({"workload": w, **row}), flush=True)
    print(json.dumps({
        "metric": f"scaling N={lo} -> 4N={hi} cpus, "
                  f"{rounds} paired rounds, vertices={scale_v}",
        "workloads": results,
    }))


def scaling():
    """Same pagerank job in fresh processes at 8 and 32 CPUs.  Uses a
    ~1e8-edge graph by default: at <2e7 edges the job is latency-bound
    at BOTH levels and the ratio measures scheduling, not scaling."""
    scale_v = int(os.environ.get("GRAFT_BENCH_VERTICES", "8000000"))
    _edges_parquet(scale_v)  # pre-generate so both runs share input

    def run(ncpu: int) -> dict:
        env = dict(
            os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=SF_DIR,
            GRAFT_BENCH_FAST="1", GRAFT_BENCH_VERTICES=str(scale_v),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    # Hypervisor steal storms (see BASELINE.md §5: 20-30% steal for
    # minutes at a time) wreck any single leg.  Interleave the two
    # legs best-of-N: each leg's MINIMUM is the engine cost the
    # instance was able to deliver; a storm inflates some rounds but
    # cannot deflate any.
    rounds = int(os.environ.get("GRAFT_SCALING_ROUNDS", "3"))
    lo_walls, hi_walls = [], []
    lo_steal, hi_steal = [], []
    lo_probe, hi_probe = [], []
    lo_eps = hi_eps = 0
    edges = iters = None
    for _ in range(rounds):
        r_lo, r_hi = run(lo), run(hi)
        lo_walls.append(r_lo["queries"]["pagerank_web"])
        hi_walls.append(r_hi["queries"]["pagerank_web"])
        lo_steal.append(r_lo["steal_pct"].get("pagerank_web", 0.0))
        hi_steal.append(r_hi["steal_pct"].get("pagerank_web", 0.0))
        lo_probe.append(r_lo.get("sqrt_probe_s"))
        hi_probe.append(r_hi.get("sqrt_probe_s"))
        lo_eps = max(lo_eps, r_lo["pagerank_edges_per_sec"])
        hi_eps = max(hi_eps, r_hi["pagerank_edges_per_sec"])
        edges = r_hi["edges"]
        iters = r_hi["pagerank_iterations"]
    t_lo, t_hi = min(lo_walls), min(hi_walls)
    eff = (t_lo / t_hi) / (hi / lo)
    # Per-round PAIRED efficiencies: each round's legs run back-to-back
    # on the same machine state, so the pair ratio cancels slow host
    # drift that the cross-round min-of-column pairing cannot (observed
    # 2026-08-18: a recovering host gave per-leg minima from different
    # rounds and a meaningless headline ratio).
    eff_rounds = [round((a / b) / (hi / lo), 3)
                  for a, b in zip(lo_walls, hi_walls)]
    print(json.dumps({
        "metric": f"pagerank_web scaling N={lo} -> 4N={hi} cpus "
                  f"(best of {rounds} interleaved rounds per leg)",
        "sec_8": t_lo, "sec_32": t_hi,
        "sec_8_rounds": lo_walls, "sec_32_rounds": hi_walls,
        "steal_pct_8_rounds": lo_steal, "steal_pct_32_rounds": hi_steal,
        "sqrt_probe_8_rounds": lo_probe, "sqrt_probe_32_rounds": hi_probe,
        "edges_per_sec_8": lo_eps,
        "edges_per_sec_32": hi_eps,
        "scaling_efficiency": round(eff, 3),
        "scaling_efficiency_paired_rounds": eff_rounds,
        "edges": edges,
        "iterations": iters,
    }))


if __name__ == "__main__":
    if "--bwprobe" in sys.argv:
        bwprobe()
    elif "--scalerun" in sys.argv:
        scalerun(sys.argv[sys.argv.index("--scalerun") + 1])
    elif "--scaling-all" in sys.argv:
        scaling_all()
    elif "--scaling" in sys.argv:
        scaling()
    else:
        main()
