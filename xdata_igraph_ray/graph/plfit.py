"""Power-law distribution fitting — igraph_power_law_fit
(ref src/other.c:261-409) backed by the vendored plfit library
(ref src/plfit/plfit.c), i.e. the Clauset–Shalizi–Newman method
(SIAM Review 51(4):661-703, 2009).

Rebuilt Ray-Data-first rather than ported: the only data-dependent
quantity the whole fit needs is the VALUE-COUNT HISTOGRAM of the
sample column (distinct values + multiplicities).  For a web-graph
degree distribution the histogram is tiny relative to the samples
(distinct degrees grow like O(max_degree) while the sample count
grows with |V|), so the pipeline is

    samples Dataset --one groupby-count exchange--> (value, count)
    table on the driver --> vectorized numpy scan over candidate
    xmins

which reproduces plfit's linear-scan semantics exactly without ever
materializing the raw samples on the driver.

Pinned semantics (each mirrored from the reference, cited):

- discrete iff every sample is integral, unless ``force_continuous``
  (src/other.c:341-350); finite-size correction applied when the
  TOTAL sample count < 50 (src/other.c:339) as
  ``alpha = alpha*(n-1)/n + 1/n`` with plfit's n choice per path
  (plfit.c:118-120, 376-377: continuous auto-xmin passes tail+1).
- continuous: alpha = 1 + m / sum(ln(x/xmin)) over the tail
  (plfit.c:160); KS statistic D = max |1-(xmin/x)^(alpha-1) - m/n|
  walking the sorted tail (plfit.c:181-202 — with duplicates both
  the first and last index of a value bound the deviation); xmin =
  the unique sample value minimizing D, scanning all uniques but the
  largest (plfit.c:361-371).  plfit's DEFAULT tries a golden-section
  search first (plfit.c:334) which can land in a local minimum of D;
  we always run the exact linear scan (plfit's own fallback path) —
  pinned divergence, same objective.
- discrete: alpha maximizes -alpha*sum(ln x) - m*ln zeta(alpha,xmin)
  (plfit.c:501-511 / the L-BFGS evaluate at :460) — here by
  golden-section on the concave log-likelihood; D uses the Hurwitz-
  zeta CDF per DISTINCT tail value at its first-occurrence index
  (plfit.c:611-638); candidate xmins exclude the largest two distinct
  sample groups per plfit's end_xmin walk-back (plfit.c:738-749).
- p = Q_KS(D * sqrt(n_tail)) with plfit's piecewise Kolmogorov
  approximation mirrored digit-for-digit (kolmogorov.c:23-58).
- Hurwitz zeta via Euler–Maclaurin (the same approach as the GSL
  routine plfit borrows), vectorized over q.

Divergences (loud): samples <= 0 raise for the continuous fit and
samples < 1 raise for the discrete fit (plfit feeds them to log/zeta
and errors out mid-scan with an opaque message — filter zero degrees
first); fewer than 3 distinct values raise instead of returning
plfit's uninitialized best_result.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["power_law_fit", "hurwitz_zeta", "kolmogorov_p"]

# Bernoulli numbers B2, B4, ... B12 for the Euler-Maclaurin tail
_BERNOULLI = (1.0 / 6, -1.0 / 30, 1.0 / 42, -1.0 / 30, 5.0 / 66,
              -691.0 / 2730)
_EM_DIRECT = 16  # direct terms before the tail expansion


def hurwitz_zeta(alpha: float, q):
    """zeta(alpha, q) = sum_{k>=0} (q+k)^-alpha for alpha > 1,
    vectorized over q (Euler–Maclaurin, ~1e-12 relative — the same
    approach as the GSL routine plfit borrows)."""
    if alpha <= 1.0:
        raise ValueError("hurwitz_zeta requires alpha > 1")
    q = np.asarray(q, dtype=np.float64)
    if np.any(q <= 0):
        raise ValueError("hurwitz_zeta requires q > 0")
    return _hzeta(alpha, q)


def _hzeta(alpha: float, q):
    q = np.asarray(q, dtype=np.float64)
    k = np.arange(_EM_DIRECT, dtype=np.float64)
    direct = ((q[..., None] + k) ** -alpha).sum(axis=-1)
    qn = q + _EM_DIRECT
    res = direct + qn ** (1.0 - alpha) / (alpha - 1.0) + 0.5 * qn ** -alpha
    # Euler-Maclaurin correction terms:
    #   B_{2j}/(2j)! * (alpha)_{2j-1} * qn^{-(alpha+2j-1)}
    rising = 1.0
    fact = 1.0
    for j, b in enumerate(_BERNOULLI, start=1):
        rising *= (alpha + 2 * j - 3) * (alpha + 2 * j - 2) if j > 1 \
            else alpha
        fact *= (2 * j) * (2 * j - 1)
        res = res + b / fact * rising * qn ** (-(alpha + 2 * j - 1))
    return res


def kolmogorov_p(d: float, n: int) -> float:
    """plfit_ks_test_one_sample_p (kolmogorov.c:60-62): the
    Kolmogorov Q-function at d*sqrt(n), with plfit's piecewise
    approximation (kolmogorov.c:23-58) mirrored exactly."""
    z = d * math.sqrt(n)
    u = abs(z)
    if u < 0.2:
        return 1.0
    if u < 0.755:
        w = 2.50662827
        c1 = -1.2337005501361697
        v = 1.0 / (u * u)
        return 1 - w * (math.exp(c1 * v) + math.exp(9 * c1 * v)
                        + math.exp(25 * c1 * v)) / u
    if u < 6.8116:
        fj = (-2.0, -8.0, -18.0, -32.0)
        maxj = max(1, int(3.0 / u + 0.5))
        v = u * u
        r = [math.exp(fj[j] * v) if j < maxj else 0.0 for j in range(4)]
        return 2 * (r[0] - r[1] + r[2] - r[3])
    return 0.0


def _value_counts(data, col: str | None, P: int):
    """(values ascending float64, counts int64) — distributed
    groupby-count when given a Dataset / block refs, plain numpy
    otherwise."""
    if isinstance(data, np.ndarray):
        v, c = np.unique(np.asarray(data, dtype=np.float64),
                         return_counts=True)
        return v, c.astype(np.int64)
    import pyarrow as pa  # noqa: F401

    from ..exchange import groupby_agg

    if col is None:
        raise ValueError("col is required for Dataset input")
    counts = groupby_agg(data, [col], [(None, "count", "cnt")], P=P)
    df = counts.to_pandas()
    order = np.argsort(df[col].to_numpy(), kind="stable")
    return (df[col].to_numpy().astype(np.float64)[order],
            df["cnt"].to_numpy().astype(np.int64)[order])


def _fsc(alpha: float, n: int) -> float:
    """plfit_i_perform_finite_size_correction (plfit.c:118-120)."""
    return alpha * (n - 1) / n + 1.0 / n


def _ks_continuous(vals, counts, first_idx, xmin, alpha, n_tail):
    """D over the tail histogram (plfit.c:181-202).  With duplicates
    the per-sample scan's max deviation at a value is attained at its
    first or last occurrence index; both are in the histogram."""
    F = 1.0 - (xmin / vals) ** (alpha - 1.0)
    lo = first_idx / n_tail
    hi = (first_idx + counts - 1) / n_tail
    return float(np.maximum(np.abs(F - lo), np.abs(F - hi)).max())


def _alpha_discrete(logsum: float, m: int, xmin: float) -> float:
    """Maximize LL(alpha) = -alpha*logsum - m*ln zeta(alpha, xmin)
    (concave in alpha) by golden-section (plfit uses L-BFGS from 3.0,
    plfit.c:520-560; same optimum)."""
    def nll(a: float) -> float:
        return a * logsum + m * math.log(float(_hzeta(a, xmin)))

    lo, hi = 1.0 + 1e-7, 4.0
    # expand hi until the minimum is interior
    while hi < 512 and nll(hi) < nll(hi - 1e-3):
        hi *= 2.0
    invphi = (math.sqrt(5.0) - 1.0) / 2.0
    a, b = lo, hi
    c, d = b - invphi * (b - a), a + invphi * (b - a)
    fc, fd = nll(c), nll(d)
    while b - a > 1e-10:
        if fc < fd:
            b, d, fd = d, c, fc
            c = b - invphi * (b - a)
            fc = nll(c)
        else:
            a, c, fc = c, d, fd
            d = a + invphi * (b - a)
            fd = nll(d)
    return (a + b) / 2.0


def _ks_discrete(vals, first_idx, xmin, alpha, n_tail):
    """plfit_i_ks_test_discrete (plfit.c:611-638): per DISTINCT tail
    value at its first-occurrence index."""
    hz = _hzeta(alpha, vals)
    hz0 = float(_hzeta(alpha, xmin))
    F = 1.0 - hz / hz0
    return float(np.abs(F - first_idx / n_tail).max())


def power_law_fit(
    data,
    col: str | None = None,
    xmin: float = -1.0,
    force_continuous: bool = False,
    P: int = 8,
) -> dict:
    """igraph_power_law_fit (src/other.c:325-409).  ``data`` is a
    ray.data.Dataset (with ``col`` naming the sample column — e.g. a
    degree table), a block-ref list, or a numpy array.  ``xmin`` < 0
    selects the optimal threshold (minimum KS D); >= 0 fixes it.

    Returns dict(continuous, alpha, xmin, L, D, p, n_tail).
    """
    vals, counts = _value_counts(data, col, P)
    n_total = int(counts.sum())
    if n_total == 0:
        raise ValueError("power_law_fit: empty sample")
    discrete = not force_continuous and bool(
        np.all(vals == np.floor(vals)))
    fsc_on = n_total < 50  # src/other.c:339

    if discrete:
        if xmin < 0 and vals[0] < 1:
            raise ValueError(
                "power_law_fit: discrete fit requires samples >= 1 "
                "(zero degrees in the input? filter them, or pass "
                "force_continuous=True)")
        return _fit_discrete(vals, counts, n_total, xmin, fsc_on)
    if xmin < 0 and vals[0] <= 0:
        raise ValueError(
            "power_law_fit: continuous fit requires positive samples")
    return _fit_continuous(vals, counts, n_total, xmin, fsc_on)


def _tail_views(vals, counts, i):
    """(tail values, tail counts, first-occurrence index within the
    tail) for candidate start i."""
    v = vals[i:]
    c = counts[i:]
    fi = np.concatenate(([0], np.cumsum(c[:-1])))
    return v, c, fi


def _fit_continuous(vals, counts, n_total, xmin, fsc_on) -> dict:
    U = len(vals)
    if xmin >= 0:
        # plfit_estimate_alpha_continuous (plfit.c:221-265)
        if xmin <= 0:
            raise ValueError(
                "power_law_fit: fixed xmin must be greater than zero "
                "for the continuous fit (plfit XMIN_CHECK_ZERO)")
        keep = vals >= xmin
        if not keep.any():
            raise ValueError("no data point was larger than xmin")
        v, c = vals[keep], counts[keep]
        m = int(c.sum())
        logsum = float((c * (np.log(v) - math.log(xmin))).sum())
        if logsum == 0:
            raise ValueError("all samples equal xmin — alpha diverges")
        alpha = 1.0 + m / logsum
        fi = np.concatenate(([0], np.cumsum(c[:-1])))
        D = _ks_continuous(v, c, fi, xmin, alpha, m)
        if fsc_on:
            alpha = _fsc(alpha, m)
        L = -alpha * logsum + m * math.log((alpha - 1.0) / xmin)
        return {"continuous": True, "alpha": alpha, "xmin": float(xmin),
                "L": L, "D": D, "p": kolmogorov_p(D, m), "n_tail": m}

    if U < 2:
        raise ValueError(
            "power_law_fit: need >= 2 distinct values to scan xmin")
    logv = np.log(vals)
    suffix_m = np.cumsum(counts[::-1])[::-1]
    suffix_clogv = np.cumsum((counts * logv)[::-1])[::-1]

    def evaluate(i: int) -> dict | None:
        cand_xmin = float(vals[i])
        m = int(suffix_m[i])
        logsum = float(suffix_clogv[i]) - m * logv[i]
        if logsum <= 0:
            return None
        alpha = 1.0 + m / logsum
        v, c, fi = _tail_views(vals, counts, i)
        D = _ks_continuous(v, c, fi, cand_xmin, alpha, m)
        return {"alpha": alpha, "xmin": cand_xmin, "D": D,
                "m": m, "logsum": logsum}

    best = None

    def consider(i: int):
        nonlocal best
        r = evaluate(i)
        if r is not None and (best is None or r["D"] < best["D"]):
            best = r

    # candidate selection mirrors plfit's PLFIT_GSS_OR_LINEAR default
    # (plfit.c:334-371): golden-section search over the unique index
    # when there are many uniques (finds a LOCAL minimum of D — same
    # caveat as the reference's default), exhaustive linear scan over
    # all uniques but the largest otherwise.  The O(U) KS evaluation
    # makes the full scan O(U^2); GSS keeps the degree-distribution
    # case (huge n, modest U) exact and the all-distinct continuous
    # case tractable, exactly like plfit.
    if U > 4096:
        invphi = (math.sqrt(5.0) - 1.0) / 2.0
        a, b = 0, U - 5
        c = int(b - invphi * (b - a))
        d = int(a + invphi * (b - a))
        rc, rd = evaluate(c), evaluate(d)
        while b - a > 4:
            if (rc["D"] if rc else math.inf) < (rd["D"] if rd else math.inf):
                b, d, rd = d, c, rc
                c = int(b - invphi * (b - a))
                rc = evaluate(c)
            else:
                a, c, rc = c, d, rd
                d = int(a + invphi * (b - a))
                rd = evaluate(d)
        for i in range(a, min(b + 1, U - 1)):
            consider(i)
    else:
        for i in range(U - 1):
            consider(i)
    if best is None:
        raise ValueError("power_law_fit: no valid xmin candidate")
    # plfit.c:352/371: best_n counts one element below the tail
    best_n = best["m"] + 1
    alpha = _fsc(best["alpha"], best_n) if fsc_on else best["alpha"]
    L = (-alpha * best["logsum"]
         + best["m"] * math.log((alpha - 1.0) / best["xmin"]))
    return {"continuous": True, "alpha": alpha, "xmin": best["xmin"],
            "L": L, "D": best["D"], "p": kolmogorov_p(best["D"], best_n),
            "n_tail": best["m"]}


def _fit_discrete(vals, counts, n_total, xmin, fsc_on) -> dict:
    U = len(vals)
    if xmin >= 0:
        # plfit_estimate_alpha_discrete (plfit.c:658-706)
        if xmin < 1:
            raise ValueError("xmin must be at least 1")
        keep = vals >= xmin
        if not keep.any():
            raise ValueError("no data point was larger than xmin")
        v, c = vals[keep], counts[keep]
        m = int(c.sum())
        logsum = float((c * np.log(v)).sum())
        alpha = _alpha_discrete(logsum, m, float(xmin))
        fi = np.concatenate(([0], np.cumsum(c[:-1])))
        D = _ks_discrete(v, fi, float(xmin), alpha, m)
        if fsc_on:
            alpha = _fsc(alpha, m)
        L = -alpha * logsum - m * math.log(float(_hzeta(alpha, xmin)))
        return {"continuous": False, "alpha": alpha, "xmin": float(xmin),
                "L": L, "D": D, "p": kolmogorov_p(D, m), "n_tail": m}

    if U < 3:
        raise ValueError(
            "power_law_fit: need >= 3 distinct values for the "
            "discrete xmin scan (plfit returns uninitialized results "
            "here; we raise instead)")
    logv = np.log(vals)
    # candidate xmins: plfit.c:738-760 — px walks group starts while
    # strictly before end_xmin, which is the LAST element of the
    # (U-3)rd distinct group after the two walk-backs; so group i is
    # a candidate iff first_index(i) < last_index(U-3).
    cum = np.cumsum(counts)
    first_index = np.concatenate(([0], cum[:-1]))
    end_xmin_idx = cum[U - 3] - 1
    suffix_m = np.cumsum(counts[::-1])[::-1]
    suffix_clogv = np.cumsum((counts * logv)[::-1])[::-1]
    best = None
    for i in range(U):
        if first_index[i] >= end_xmin_idx:
            break
        cand_xmin = float(vals[i])
        m = int(suffix_m[i])
        logsum = float(suffix_clogv[i])
        alpha = _alpha_discrete(logsum, m, cand_xmin)
        v, _, fi = _tail_views(vals, counts, i)
        D = _ks_discrete(v, fi, cand_xmin, alpha, m)
        if best is None or D < best["D"]:
            best = {"alpha": alpha, "xmin": cand_xmin, "D": D,
                    "m": m, "logsum": logsum}
    if best is None:
        raise ValueError(
            "power_law_fit: discrete xmin scan produced no candidate "
            "(the three largest distinct values leave nothing to scan "
            "— need more distinct mass below them)")
    alpha = _fsc(best["alpha"], best["m"]) if fsc_on else best["alpha"]
    L = (-alpha * best["logsum"]
         - best["m"] * math.log(float(_hzeta(alpha, best["xmin"]))))
    return {"continuous": False, "alpha": alpha, "xmin": best["xmin"],
            "L": L, "D": best["D"], "p": kolmogorov_p(best["D"], best["m"]),
            "n_tail": best["m"]}
