"""Checkpoint / kill / resume (north rule: a killed job resumes
mid-algorithm from the last complete Parquet checkpoint)."""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from xdata_igraph_ray.graph.components import wcc
from xdata_igraph_ray.graph.engine import GraphEngine
from xdata_igraph_ray.graph.pagerank import pagerank

from .oracles import gnm_edges, pagerank_ref

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_wcc_resume_equals_uninterrupted(tmp_path):
    src, dst = gnm_edges(400, 900, seed=6)
    tbl = pa.table({"src": src, "dst": dst})
    ck = str(tmp_path / "ck")
    e1 = GraphEngine.from_edges(tbl, n=400, P=3)
    wcc(e1, max_iter=2, ckpt_root=ck, ckpt_every=1, renumber=False)
    assert GraphEngine.latest_checkpoint(ck, "wcc") is not None
    e2 = GraphEngine.from_edges(tbl, n=400, P=3)
    wcc(e2, ckpt_root=ck, resume=True)
    want_eng = GraphEngine.from_edges(tbl, n=400, P=3)
    wcc(want_eng)
    assert (e2.state_arrays("label") == want_eng.state_arrays("label")).all()
    for e in (e1, e2, want_eng):
        e.shutdown()


def test_checkpoint_layout(tmp_path):
    src, dst = gnm_edges(200, 600, seed=2)
    ck = str(tmp_path / "ck")
    eng = GraphEngine.from_edges(pa.table({"src": src, "dst": dst}), n=200, P=2)
    pagerank(eng, tol=1e-10, ckpt_root=ck, ckpt_every=5)
    last = GraphEngine.latest_checkpoint(ck, "pagerank")
    d = os.path.join(ck, "pagerank", f"iter={last}")
    assert os.path.exists(os.path.join(d, "_SUCCESS"))
    assert os.path.exists(os.path.join(d, "part=0.parquet"))
    lineage = json.load(open(os.path.join(d, "lineage.json")))
    assert lineage["algo"] == "pagerank" and lineage["iter"] == last
    metrics = pq.read_table(os.path.join(d, "metrics.parquet"))
    assert set(metrics.column_names) >= {"part", "iter", "wall_s", "delta"}
    # per-superstep message bytes are measured, not placeholder zeros
    assert (metrics["bytes"].to_numpy() > 0).all()
    eng.shutdown()


@pytest.mark.slow
def test_kill_and_resume_subprocess(tmp_path):
    """SIGKILL the job mid-algorithm; resume run must converge to the
    oracle answer."""
    from xdata_igraph_ray.sources.synth import generate_edges

    edges = generate_edges(60_000, seed=11)
    epath = str(tmp_path / "edges.parquet")
    pq.write_table(edges, epath)
    ck = str(tmp_path / "ck")
    out1 = str(tmp_path / "out1")
    cmd = [
        sys.executable, "-m", "xdata_igraph_ray.pipelines.run",
        "--algo", "pagerank", "--edges", epath, "--out", out1,
        "--ckpt", ck, "--ckpt-every", "1", "--tol", "1e-12",
        "--num-shards", "3", "--num-cpus", "3",
    ]
    env = {k: v for k, v in os.environ.items() if k != "RAY_ADDRESS"}
    proc = subprocess.Popen(cmd, cwd=REPO, env=env,
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    # wait until at least one complete checkpoint exists, then kill
    deadline = time.time() + 120
    while time.time() < deadline:
        if GraphEngine.latest_checkpoint(ck, "pagerank") is not None:
            break
        if proc.poll() is not None:
            break
        time.sleep(0.2)
    if proc.poll() is None:
        proc.send_signal(signal.SIGKILL)
        proc.wait()
    killed_at = GraphEngine.latest_checkpoint(ck, "pagerank")
    assert killed_at is not None, "no checkpoint was written before kill"

    out2 = str(tmp_path / "out2")
    cmd2 = [
        sys.executable, "-m", "xdata_igraph_ray.pipelines.run",
        "--algo", "pagerank", "--edges", epath, "--out", out2,
        "--ckpt", ck, "--resume", "--tol", "1e-12",
        "--num-shards", "3", "--num-cpus", "3",
    ]
    res = subprocess.run(cmd2, cwd=REPO, env=env, capture_output=True,
                         text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    got = (
        pq.read_table(os.path.join(out2, "result"))
        .to_pandas().sort_values("vid")["score"].to_numpy()
    )
    want = pagerank_ref(
        edges["src"].to_numpy(), edges["dst"].to_numpy(),
        int(max(edges["src"].to_numpy().max(),
                edges["dst"].to_numpy().max())) + 1,
    )
    np.testing.assert_allclose(got, want, atol=1e-8)


def test_checkpoint_inspection(tmp_path):
    from xdata_igraph_ray.state import checkpoints as ck

    src, dst = gnm_edges(150, 400, seed=8)
    root = str(tmp_path / "ck")
    eng = GraphEngine.from_edges(pa.table({"src": src, "dst": dst}),
                                 n=150, P=2)
    pagerank(eng, tol=1e-10, ckpt_root=root, ckpt_every=3)
    its = ck.list_checkpoints(root, "pagerank")
    assert its and its[-1] == ck.latest_checkpoint(root, "pagerank")
    state = ck.read_state(root, "pagerank").to_pandas()
    assert len(state) == 150 and "pr" in state.columns
    metrics = ck.read_metrics(root, "pagerank").to_pandas()
    assert {"part", "iter", "wall_s", "delta"} <= set(metrics.columns)
    lin = ck.read_lineage(root, "pagerank")
    assert lin["algo"] == "pagerank" and lin["damping"] == 0.85
    eng.shutdown()


def test_lpa_resume_equals_uninterrupted(tmp_path):
    from xdata_igraph_ray.graph.lpa import label_propagation

    src, dst = gnm_edges(300, 1200, seed=9)
    tbl = pa.table({"src": src, "dst": dst})
    ck = str(tmp_path / "ck")
    e1 = GraphEngine.from_edges(tbl, n=300, P=3)
    label_propagation(e1, mode="all", max_iter=3, ckpt_root=ck,
                      ckpt_every=1, renumber=False)
    assert GraphEngine.latest_checkpoint(ck, "lpa") is not None
    e2 = GraphEngine.from_edges(tbl, n=300, P=3)
    r = label_propagation(e2, mode="all", ckpt_root=ck, resume=True,
                          renumber=False)
    assert r["resumed_from"] is not None
    want_eng = GraphEngine.from_edges(tbl, n=300, P=3)
    label_propagation(want_eng, mode="all", renumber=False)
    assert (e2.state_arrays("label")
            == want_eng.state_arrays("label")).all()
    # checkpoint layout matches the commit protocol
    last = GraphEngine.latest_checkpoint(ck, "lpa")
    d = os.path.join(ck, "lpa", f"iter={last}")
    assert os.path.exists(os.path.join(d, "_SUCCESS"))
    lineage = json.load(open(os.path.join(d, "lineage.json")))
    assert lineage["algo"] == "lpa"
    for e in (e1, e2, want_eng):
        e.shutdown()


def test_scc_resume_equals_uninterrupted(tmp_path):
    from xdata_igraph_ray.graph.components import scc

    src, dst = gnm_edges(300, 700, seed=11)
    tbl = pa.table({"src": src, "dst": dst})
    ck = str(tmp_path / "ck")
    e1 = GraphEngine.from_edges(tbl, n=300, P=3)
    # run a couple of peel rounds only, checkpointing each
    try:
        scc(e1, max_rounds=2, ckpt_root=ck, ckpt_every=1,
            renumber=False)
    except RuntimeError:
        pass  # stopped mid-algorithm by design
    assert GraphEngine.latest_checkpoint(ck, "scc") is not None
    e2 = GraphEngine.from_edges(tbl, n=300, P=3)
    r = scc(e2, ckpt_root=ck, resume=True, renumber=True)
    assert r["resumed_from"] is not None
    want_eng = GraphEngine.from_edges(tbl, n=300, P=3)
    want = scc(want_eng, renumber=True)
    assert (e2.state_arrays("scc")
            == want_eng.state_arrays("scc")).all()
    assert r["components"] == want["components"]
    for e in (e1, e2, want_eng):
        e.shutdown()
