"""power_law_fit (igraph_power_law_fit, src/other.c:325-409; vendored
plfit src/plfit/plfit.c) vs an independent literal transcription of
the C scan, brute-force Hurwitz zeta, and planted-exponent recovery."""

from __future__ import annotations

import math

import numpy as np
import pytest

from xdata_igraph_ray.graph.plfit import (
    hurwitz_zeta,
    kolmogorov_p,
    power_law_fit,
)


def test_hurwitz_zeta_brute():
    for a in (1.5, 2.0, 2.5, 3.7):
        for q in (1.0, 2.0, 5.5, 37.0):
            N = 100_000
            brute = (math.fsum((q + k) ** -a for k in range(N))
                     + (q + N) ** (1 - a) / (a - 1)
                     + 0.5 * (q + N) ** -a
                     + a / 12 * (q + N) ** (-a - 1))
            got = float(hurwitz_zeta(a, q))
            assert abs(got - brute) / brute < 1e-13, (a, q)
    assert abs(float(hurwitz_zeta(2.0, 1.0)) - math.pi ** 2 / 6) < 1e-13
    # vectorized over q
    qs = np.array([1.0, 2.0, 10.0])
    vec = hurwitz_zeta(2.5, qs)
    for i, q in enumerate(qs):
        assert vec[i] == float(hurwitz_zeta(2.5, q))


def test_kolmogorov_p_properties():
    # mirrors kolmogorov.c:23-58; check regime boundaries + monotone
    assert kolmogorov_p(0.0, 100) == 1.0
    assert kolmogorov_p(0.01, 100) == 1.0         # z = 0.1 < 0.2
    assert kolmogorov_p(10.0, 100) == 0.0         # z huge
    zs = [0.3, 0.5, 0.76, 1.0, 1.36, 2.0, 3.0]
    ps = [kolmogorov_p(z, 1) for z in zs]
    assert all(0.0 <= p <= 1.0 for p in ps)
    assert all(a >= b for a, b in zip(ps, ps[1:]))
    # the classic quantile: Q(1.36) ~ 0.049
    assert abs(kolmogorov_p(1.36, 1) - 0.049) < 0.002
    # middle-regime series value at z=1: 2*(e^-2 - e^-8 + e^-18 - e^-32)
    want = 2 * (math.exp(-2) - math.exp(-8) + math.exp(-18)
                - math.exp(-32))
    assert abs(kolmogorov_p(1.0, 1) - want) < 1e-12


def _replay_continuous(xs):
    """Literal transcription of plfit_continuous's linear-scan path
    (plfit.c:303-386) with per-sample loops."""
    xs = np.sort(np.asarray(xs, dtype=np.float64))
    n = len(xs)
    uniq_idx = [i for i in range(n) if i == 0 or xs[i] != xs[i - 1]]
    best = None
    for ui in range(len(uniq_idx) - 1):     # excludes largest unique
        i0 = uniq_idx[ui]
        xmin = xs[i0]
        tail = xs[i0:]
        m = len(tail)
        logsum = sum(math.log(x / xmin) for x in tail)
        if logsum <= 0:
            continue
        alpha = 1 + m / logsum
        D = 0.0
        for k, x in enumerate(tail):        # plfit.c:190-197
            d = abs(1 - (xmin / x) ** (alpha - 1) - k / m)
            D = max(D, d)
        if best is None or D < best[2]:
            best = (alpha, xmin, D, m, logsum)
    alpha, xmin, D, m, logsum = best
    best_n = m + 1                          # plfit.c:371
    p = kolmogorov_p(D, best_n)
    L = -alpha * logsum + m * math.log((alpha - 1) / xmin)
    return {"alpha": alpha, "xmin": xmin, "D": D, "p": p, "L": L,
            "n_tail": m}


def test_continuous_vs_literal_replay():
    rng = np.random.default_rng(5)
    xs = 2.0 * (1 - rng.random(400)) ** (-1 / 1.2)  # alpha = 2.2
    got = power_law_fit(xs, force_continuous=True)
    want = _replay_continuous(xs)
    for k in ("alpha", "xmin", "D", "p", "L"):
        assert got[k] == pytest.approx(want[k], rel=1e-12, abs=1e-12), k
    assert got["n_tail"] == want["n_tail"]


def _replay_discrete(xs):
    """Literal transcription of plfit_discrete (plfit.c:708-780),
    with alpha via dense grid + local refine on the same concave LL
    the L-BFGS path maximizes."""
    xs = np.sort(np.asarray(xs, dtype=np.float64))
    n = len(xs)

    def alpha_for(tail, xmin):
        logsum = sum(math.log(x) for x in tail)
        m = len(tail)

        def ll(a):
            return -a * logsum - m * math.log(float(hurwitz_zeta(a, xmin)))

        grid = np.arange(1.01, 8.0, 0.01)
        ls = [ll(a) for a in grid]
        j = int(np.argmax(ls))
        lo = grid[max(0, j - 1)]
        hi = grid[min(len(grid) - 1, j + 1)]
        for _ in range(80):                 # bisect on the gradient
            m1 = lo + (hi - lo) / 3
            m2 = hi - (hi - lo) / 3
            if ll(m1) < ll(m2):
                lo = m1
            else:
                hi = m2
        return (lo + hi) / 2, logsum, m

    def ks(tail, xmin, alpha):
        m = len(tail)
        hz0 = float(hurwitz_zeta(alpha, xmin))
        D, k = 0.0, 0
        while k < m:
            x = tail[k]
            d = abs(1 - float(hurwitz_zeta(alpha, x)) / hz0 - k / m)
            D = max(D, d)
            while k < m and tail[k] == x:
                k += 1
        return D

    # end_xmin walk-back over the last two distinct groups
    e = n - 1
    px = 0
    prev = xs[e]
    while e > 0 and xs[e] == prev:
        e -= 1
    prev = xs[e]
    while e > 0 and xs[e] == prev:
        e -= 1
    best = None
    prev_x = 0.0
    i = 0
    while i < e:
        while i < e and xs[i] == prev_x:
            i += 1
        if i >= e:
            break
        xmin = xs[i]
        tail = xs[i:]
        alpha, logsum, m = alpha_for(tail, xmin)
        D = ks(tail, xmin, alpha)
        if best is None or D < best[2]:
            best = (alpha, xmin, D, m, logsum)
        prev_x = xmin
        i += 1
    alpha, xmin, D, m, logsum = best
    L = -alpha * logsum - m * math.log(float(hurwitz_zeta(alpha, xmin)))
    return {"alpha": alpha, "xmin": xmin, "D": D,
            "p": kolmogorov_p(D, m), "L": L, "n_tail": m}


def test_discrete_vs_literal_replay():
    rng = np.random.default_rng(6)
    xs = np.floor((1 - rng.random(600)) ** (-1 / 1.5)).astype(float)
    xs = xs[xs >= 1]
    got = power_law_fit(xs)
    want = _replay_discrete(xs)
    assert got["xmin"] == want["xmin"]
    assert got["n_tail"] == want["n_tail"]
    # alpha optimizers differ (golden section vs grid+ternary);
    # agree to ~1e-6 which drags D/L/p along
    assert got["alpha"] == pytest.approx(want["alpha"], abs=2e-6)
    assert got["D"] == pytest.approx(want["D"], abs=1e-6)
    assert got["L"] == pytest.approx(want["L"], rel=1e-6)
    assert got["p"] == pytest.approx(want["p"], abs=1e-5)


def test_recovery_and_fixed_xmin():
    rng = np.random.default_rng(7)
    xs = (1 - rng.random(50_000)) ** (-1 / 1.5)  # alpha 2.5, xmin 1
    r = power_law_fit(xs, force_continuous=True)
    assert r["continuous"] and abs(r["alpha"] - 2.5) < 0.05
    # fixed xmin: closed-form alpha = 1 + m / sum(ln(x/xmin))
    r2 = power_law_fit(xs, xmin=2.0, force_continuous=True)
    tail = xs[xs >= 2.0]
    want = 1 + len(tail) / np.log(tail / 2.0).sum()
    assert r2["alpha"] == pytest.approx(want, rel=1e-12)
    assert r2["xmin"] == 2.0
    # discrete planted
    xsd = np.floor((1 - rng.random(50_000)) ** (-1 / 1.5))
    xsd = xsd[xsd >= 1]
    rd = power_law_fit(xsd)
    assert not rd["continuous"] and 2.2 < rd["alpha"] < 2.8
    # finite-size correction kicks in under 50 samples
    small = np.sort(xs)[-40:]
    rs = power_law_fit(small, xmin=float(small[0]),
                       force_continuous=True)
    m = 40
    raw = 1 + m / np.log(small / small[0]).sum()
    assert rs["alpha"] == pytest.approx(raw * (m - 1) / m + 1 / m,
                                        rel=1e-12)


def test_error_cases():
    with pytest.raises(ValueError, match="discrete fit requires"):
        power_law_fit(np.array([0.0, 1.0, 2.0, 3.0]))
    with pytest.raises(ValueError, match="positive samples"):
        power_law_fit(np.array([-1.0, 1.5, 2.5]), force_continuous=True)
    with pytest.raises(ValueError, match="3 distinct"):
        power_law_fit(np.array([1.0, 2.0, 2.0]))
    with pytest.raises(ValueError, match="empty"):
        power_law_fit(np.array([]))
    with pytest.raises(ValueError, match="at least 1"):
        power_law_fit(np.array([1.0, 2.0, 3.0, 4.0]), xmin=0.5)


def test_dataset_input_matches_numpy(ray_session):
    import pyarrow as pa
    import ray
    import ray.data as rd

    rng = np.random.default_rng(8)
    xs = np.floor((1 - rng.random(20_000)) ** (-1 / 1.4))
    xs = xs[xs >= 1]
    ds = rd.from_arrow(pa.table({"d": xs.astype(np.int64)}))
    got = power_law_fit(ds, col="d", P=4)
    want = power_law_fit(xs.astype(float))
    for k in ("alpha", "xmin", "D", "p", "L"):
        assert got[k] == want[k], k
    assert got["n_tail"] == want["n_tail"]
