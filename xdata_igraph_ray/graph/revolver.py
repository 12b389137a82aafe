"""Revolver: citation-evolution kernel measurement — the xdata fork's
``igraph_revolver_*`` suite (src/revolver_cit.c, 6200 LoC;
include/igraph_revolver.h).

A *citation graph* has vertices in arrival-time order (vertex id ==
arrival time); each new vertex ``c`` cites existing vertices.  The
revolver machinery estimates the attachment kernel ``A(x)`` — the
relative propensity of a vertex with property ``x`` (in-degree, age,
category, citation lag, recent-citation count, or products of these)
to receive the next citation — by replaying the evolution history:

  * ``mes``  — measure the kernel from the event stream (running mean
    of ``st[t]/ntk[x]`` over citation events, scaled by per-class
    exposure; src/revolver_cit.c:115-253 for the in-degree case),
  * ``st``   — per-step normalizing factor S(t) = sum over present
    vertices of A(x(v)) (src/revolver_cit.c:258-310),
  * ``exp``  — expected citations per class (kernel times the integral
    of ntk[x] d(cumulative outdeg/S), src/revolver_cit.c:312-386),
  * ``error``— log-likelihood of the history under the kernel vs the
    uniform null (src/revolver_cit.c:389-445),

iterated ``niter`` times from st == 1 (igraph_revolver_d and siblings,
src/revolver_cit.c:38-113).  Everything is DETERMINISTIC — no RNG
anywhere in the measurement path (unlike HRG/SIR).

Design: the reference's per-node sequential scan is re-expressed as a
**delta timeline**: every mutation of the reference's ``ntk``/``ntkl``
class-count arrays becomes one ``(citing-node, class, ±1)`` record,
generated VECTORIZED from the event table (per-target cumulative
counts by segmented cumsum; age/lag crossings from closed-form
schedules).  Class counts at estimate time, interval exposures
(``normfact``, with the reference's exact ==1-open / ==0-close / final
flush bookkeeping), and the expected-citation integral are per-class
segment reductions over that stream — no Python loop over nodes.  The
event extraction is one distributed-sortable pass over the edge list;
the O(E + n·agebins) delta arrays are a driver kernel like the repo's
other history-replay scopes (power_law_fit, HRG), behind a loud size
guard with the time-sharded chaining path documented on it.

Kernels (property of the CITED vertex):

  d    in-degree                                  (revolver_cit.c:38)
  e    static category                            (revolver_cit.c:1407)
  ad   (in-degree, age-bin)                       (revolver_cit.c:478)
  de   (category, in-degree)                      (revolver_cit.c:1726)
  l    citation lag (binned; never-cited class)   (revolver_cit.c:2096)
  r    recent citations inside a trailing window  (revolver_cit.c:3336)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MAX_DRIVER_DELTAS = 50_000_000
_INF = np.iinfo(np.int64).max


# ---------------------------------------------------------------------------
# event extraction


def _events(edges, n: int | None = None):
    """Time-ordered citation events (cit, to), sorted by (cit, to,
    input order) — igraph_neighbors' OUT enumeration order
    (src/type_indexededgelist.c:741: (from,to)-sorted, edge-id ties).
    Accepts a pyarrow Table, a Ray Dataset, or a (src, dst) tuple."""
    if isinstance(edges, tuple):
        cit = np.asarray(edges[0], np.int64)
        to = np.asarray(edges[1], np.int64)
    else:
        if not isinstance(edges, pa.Table):
            edges = pa.concat_tables(
                list(edges.iter_batches(batch_format="pyarrow")))
        cit = edges["src"].to_numpy().astype(np.int64)
        to = edges["dst"].to_numpy().astype(np.int64)
    if n is None:
        n = int(max(cit.max(initial=-1), to.max(initial=-1))) + 1
    order = np.lexsort((np.arange(len(cit)), to, cit))
    cit, to = cit[order], to[order]
    if len(cit) and np.any(to >= cit):
        raise ValueError("not a citation graph: every edge must cite a "
                         "strictly older vertex (dst < src)")
    if len(cit) > MAX_DRIVER_DELTAS:
        raise ValueError(
            f"revolver history of {len(cit)} events exceeds the driver "
            f"guard ({MAX_DRIVER_DELTAS}); shard the history by time "
            "range and chain the class-count state between shards")
    return cit, to, n


def _prior_counts(cit, to):
    """Per event (in (cit,to) order): in-degree of ``to`` counting
    only earlier NODES' citations (estimate-time value) and counting
    earlier events INCLUDING same-batch copies (update-time value)."""
    m = len(to)
    if m == 0:
        z = np.zeros(0, np.int64)
        return z, z
    order = np.argsort(to, kind="stable")  # keeps (cit, seq) order
    ts = to[order]
    starts = np.flatnonzero(np.r_[True, ts[1:] != ts[:-1]])
    lens = np.diff(np.r_[starts, m])
    cum_sorted = np.arange(m) - np.repeat(starts, lens)
    cum_all = np.empty(m, np.int64)
    cum_all[order] = cum_sorted
    grp = np.r_[True, (cit[1:] != cit[:-1]) | (to[1:] != to[:-1])]
    gstarts = np.flatnonzero(grp)
    within = np.arange(m) - np.repeat(gstarts, np.diff(np.r_[gstarts, m]))
    return cum_all - within, cum_all


def _per_target_keys(cit, to, n):
    """Sorted composite keys to*(n+1)+cit for vectorized per-target
    range counting (citation times per target)."""
    key = to * np.int64(n + 1) + cit
    return np.sort(key)


def _count_cites_upto(keys_sorted, n, v, c):
    """#citations of each v[i] with citing node <= c[i]."""
    return (np.searchsorted(keys_sorted, v * np.int64(n + 1) + c,
                            side="right")
            - np.searchsorted(keys_sorted, v * np.int64(n + 1),
                              side="left"))


# ---------------------------------------------------------------------------
# the delta timeline


class _Spec:
    """One kernel-measurement problem, fully materialized.

    est_c / est_cls       citing node and flat class per citation
                          event at estimate time (pre-batch state)
    d_cd / d_cls / d_sg   delta stream in execution order; each delta
                          is tagged with the citing node whose body
                          performed it (cd == 0: vertex-0 pre-seed,
                          E == 0 by construction)
    nflat                 internal flat class count (includes the
                          reference's over-allocation padding)
    public(arr2d)         trims a (rows, nflat) stat to the kernel's
                          public shape
    """

    def __init__(self, n, nflat, est_c, est_cls, d_cd, d_cls, d_sg,
                 public):
        self.n, self.nflat = n, nflat
        self.est_c, self.est_cls = est_c, est_cls
        self.d_cd, self.d_cls, self.d_sg = d_cd, d_cls, d_sg
        self.public = public
        if len(d_cd) > MAX_DRIVER_DELTAS:
            raise ValueError("revolver delta stream exceeds the driver "
                             "guard; shard the history by time range")
        order = np.argsort(d_cls, kind="stable")  # keeps execution order
        self._seg_cd = d_cd[order]
        sg = d_sg[order]
        self._seg_sg = sg
        segcls = d_cls[order]
        self._seg_cls = segcls
        self._starts = np.searchsorted(segcls, np.arange(nflat + 1))
        cum = np.cumsum(sg)
        base = np.zeros(len(sg), dtype=np.int64)
        s = self._starts[:-1]
        nz = s[(s < len(sg))]
        if len(sg):
            seg_base = np.zeros(nflat, np.int64)
            valid = self._starts[:-1] < self._starts[1:]
            seg_base[valid] = np.where(
                self._starts[:-1][valid] > 0,
                cum[self._starts[:-1][valid] - 1], 0)
            base = np.repeat(seg_base, np.diff(self._starts))
        self._seg_cum = cum - base
        del nz

    def _segment(self, k):
        s, e = self._starts[k], self._starts[k + 1]
        return s, e

    def ntk_at_estimates(self) -> np.ndarray:
        """Class count at each estimate = pre-seed + all deltas from
        bodies of citing nodes < c (strict: body b's deltas are
        visible from body b+1 on).  One composite-key searchsorted —
        the segment array is sorted by (class, cd)."""
        if len(self.est_c) == 0:
            return np.zeros(0, np.float64)
        width = np.int64(self.n + 1)
        if self.nflat * width < (1 << 62):
            key = self._seg_cls.astype(np.int64) * width + self._seg_cd
            q = self.est_cls.astype(np.int64) * width + self.est_c
            pos = np.searchsorted(key, q, side="left")
            starts = self._starts[self.est_cls]
            vals = np.where(
                pos > starts,
                self._seg_cum[np.maximum(pos - 1, 0)], 0)
            return vals.astype(np.float64)
        out = np.zeros(len(self.est_c), np.float64)
        for k in np.unique(self.est_cls):
            s, e = self._segment(k)
            mask = self.est_cls == k
            pos = s + np.searchsorted(self._seg_cd[s:e], self.est_c[mask],
                                      side="left")
            vals = np.where(pos > s,
                            self._seg_cum[np.maximum(pos - 1, s)], 0)
            out[mask] = vals
        return out

    def normfact(self, ecum_rows: np.ndarray) -> np.ndarray:
        """Per-class exposure in event-counter units, with the
        reference's exact bookkeeping: ch set when a +1 makes the
        count 1, exposure added when a -1 makes it 0, final flush when
        the count ends nonzero (src/revolver_cit.c:199-243).
        ``ecum_rows``: (n_ccat, n) cumulative counters by citing node;
        returns (n_ccat, nflat)."""
        ncc = ecum_rows.shape[0]
        etot = ecum_rows[:, -1]
        nf = np.zeros((ncc, self.nflat))
        m = len(self._seg_cd)
        if m == 0:
            return nf
        cum, sg, cd, cls = (self._seg_cum, self._seg_sg, self._seg_cd,
                            self._seg_cls)
        # flagged rows: opens (+1 making the count exactly 1) and
        # closes (-1 making it exactly 0).  Within a class they
        # strictly alternate open, close, open, ... (a count can only
        # reach 1 upward through an open and 0 downward through a
        # close), so every close pairs with the immediately preceding
        # flagged row of its class.
        fidx = np.flatnonzero(((sg > 0) & (cum == 1))
                              | ((sg < 0) & (cum == 0)))
        if len(fidx):
            fcls = cls[fidx]
            fcd = cd[fidx]
            fopen = sg[fidx] > 0
            prev_cd = np.empty(len(fidx), np.int64)
            prev_cd[1:] = fcd[:-1]
            prev_cd[0] = 0
            closes = ~fopen
            # spans for closes, summed per class (per E-counter row)
            if np.any(closes):
                spans = (ecum_rows[:, fcd[closes]]
                         - ecum_rows[:, prev_cd[closes]])
                np.add.at(nf.T, fcls[closes], spans.T)
        # final flush mirrors the C exactly: every class whose FINAL
        # count is nonzero (negative dips from the mirrored l-rescan
        # quirk included) flushes etot - ch, where ch is the last
        # open's counter value (0 if the class never opened)
        ch_cd = np.zeros(self.nflat, np.int64)
        if len(fidx) and np.any(fopen):
            ocls = fcls[fopen]
            ocd = fcd[fopen]
            last_sel = np.r_[ocls[1:] != ocls[:-1], True]
            ch_cd[ocls[last_sel]] = ocd[last_sel]
        nonempty = self._starts[1:] > self._starts[:-1]
        ends = self._starts[1:] - 1
        kcls = np.flatnonzero(nonempty)
        fin = cum[ends[kcls]]
        fl = kcls[fin != 0]
        if len(fl):
            flush = etot[:, None] - ecum_rows[:, ch_cd[fl]]
            np.add.at(nf.T, fl, flush.T)
        return nf

    def integral(self, mu: np.ndarray, mu_end: float) -> np.ndarray:
        """Per-class ∫ count d(mu): the expected-citations integral
        (igraph_revolver_exp_d's count-before-transition × span
        accumulation, src/revolver_cit.c:341-376).  Segmented global
        arithmetic — no per-class loop."""
        out = np.zeros(self.nflat)
        mtot = len(self._seg_cd)
        if mtot == 0:
            return out
        cum = self._seg_cum
        m = mu[self._seg_cd]
        starts_mask = np.zeros(mtot, bool)
        nonempty = self._starts[:-1][self._starts[:-1]
                                     < self._starts[1:]]
        starts_mask[nonempty] = True
        prev = np.empty(mtot, cum.dtype)
        prev[1:] = cum[:-1]
        prev[starts_mask] = 0
        dm = np.empty(mtot)
        dm[1:] = m[1:] - m[:-1]
        dm[starts_mask] = m[starts_mask]          # minus mu "at ch=0"
        np.add.at(out, self._seg_cls, prev * dm)
        kcls = np.flatnonzero(self._starts[1:] > self._starts[:-1])
        ends = self._starts[1:] - 1
        out[kcls] += cum[ends[kcls]] * (mu_end - m[ends[kcls]])
        return out

    def st(self, kernel_flat: np.ndarray) -> np.ndarray:
        """st[c] = sum of sign * K[class] over deltas with cd <= c —
        the reference's st recurrence collapses to a cumsum over the
        SAME delta stream (new-node term == the arrival delta,
        citation/aging terms == their ±K pairs;
        src/revolver_cit.c:258-310)."""
        per_c = np.zeros(self.n)
        np.add.at(per_c, self.d_cd, self.d_sg * kernel_flat[self.d_cls])
        return np.cumsum(per_c)


def _merge_exec(parts):
    """Concatenate delta parts [(cd, cls, sg, phase), ...] and order
    by (cd, phase, construction order) — the reference body's order:
    citations 0, arrival 1, window-expiry 2, aging 3."""
    cd = np.concatenate([np.asarray(p[0], np.int64) for p in parts])
    cls = np.concatenate([np.asarray(p[1], np.int64) for p in parts])
    sg = np.concatenate([np.asarray(p[2], np.int64) for p in parts])
    ph = np.concatenate([np.full(len(p[0]), p[3], np.int8) for p in parts])
    order = np.lexsort((np.arange(len(cd)), ph, cd))
    return cd[order], cls[order], sg[order]


def _interleave(a, b):
    out = np.empty(2 * len(a), dtype=np.int64)
    out[0::2] = a
    out[1::2] = b
    return out


def _pm(m):
    one = np.ones(m, np.int64)
    return _interleave(-one, one)


# ---------------------------------------------------------------------------
# kernel spec builders


def _spec_d(cit, to, n, maxind=None):
    if maxind is None:
        maxind = int(np.bincount(to, minlength=n).max(initial=0))
    nflat = maxind + 2
    prior, cum_all = _prior_counts(cit, to)
    m = len(cit)
    arr_c = np.arange(n, dtype=np.int64)
    cd, cls, sg = _merge_exec([
        (np.repeat(cit, 2), _interleave(cum_all, cum_all + 1), _pm(m), 0),
        (arr_c, np.zeros(n, np.int64), np.ones(n, np.int64), 1),
    ])
    return _Spec(n, nflat, cit, prior, cd, cls, sg,
                 public=lambda a: a[..., :maxind + 1])


def _spec_e(cit, to, n, cats):
    cats = np.asarray(cats, np.int64)
    nocats = int(cats.max(initial=0)) + 1
    arr_c = np.arange(n, dtype=np.int64)
    cd, cls, sg = _merge_exec([
        (arr_c, cats, np.ones(n, np.int64), 1),
    ])
    return _Spec(n, nocats, cit, cats[to], cd, cls, sg,
                 public=lambda a: a)


def _age_crossings(n, binwidth, kmax):
    """All (v, k, c): vertex v crosses age bin k-1 -> k during the
    body of citing node c = v + binwidth*k - 1 (1 <= c <= n-1,
    1 <= k <= kmax) — the reference's aging loop with
    shnode = c - binwidth*k + 1 (src/revolver_cit.c:666-678)."""
    vs, ks, cs = [], [], []
    for k in range(1, kmax + 1):
        v0 = max(0, 2 - binwidth * k)
        vmax = n - binwidth * k
        if vmax < v0:
            break
        v = np.arange(v0, vmax + 1, dtype=np.int64)
        vs.append(v)
        ks.append(np.full(len(v), k, np.int64))
        cs.append(v + binwidth * k - 1)
    if not vs:
        z = np.zeros(0, np.int64)
        return z, z, z
    return np.concatenate(vs), np.concatenate(ks), np.concatenate(cs)


def _spec_ad(cit, to, n, agebins, maxind=None):
    if maxind is None:
        maxind = int(np.bincount(to, minlength=n).max(initial=0))
    binwidth = n // agebins + 1
    ncols = agebins + 1          # the reference's padded ntkl columns
    nrows = maxind + 2
    nflat = nrows * ncols

    def flat(x, y):
        return x * ncols + y

    prior, cum_all = _prior_counts(cit, to)
    age_est = (cit - to) // binwidth
    m = len(cit)
    arr_c = np.arange(n, dtype=np.int64)
    arr_cls = np.full(n, flat(0, 0), np.int64)
    if binwidth == 1:
        arr_cls[0] = flat(0, 1)   # src/revolver_cit.c:610-614
    keys = _per_target_keys(cit, to, n)
    av, ak, ac = _age_crossings(n, binwidth, agebins)
    adeg = _count_cites_upto(keys, n, av, ac)
    cd, cls, sg = _merge_exec([
        (np.repeat(cit, 2),
         _interleave(flat(cum_all, age_est), flat(cum_all + 1, age_est)),
         _pm(m), 0),
        (arr_c, arr_cls, np.ones(n, np.int64), 1),
        (np.repeat(ac, 2),
         _interleave(flat(adeg, ak - 1), flat(adeg, ak)),
         _pm(len(ac)), 3),
    ])

    def public(a):
        return a.reshape(*a.shape[:-1], nrows, ncols)[
            ..., :maxind + 1, :agebins]

    return _Spec(n, nflat, cit, flat(prior, age_est), cd, cls, sg,
                 public=public)


def _spec_de(cit, to, n, cats, maxind=None):
    cats = np.asarray(cats, np.int64)
    nocats = int(cats.max(initial=0)) + 1
    if maxind is None:
        maxind = int(np.bincount(to, minlength=n).max(initial=0))
    ncols = maxind + 2

    def flat(cat, x):
        return cat * ncols + x

    prior, cum_all = _prior_counts(cit, to)
    tc = cats[to]
    m = len(cit)
    arr_c = np.arange(n, dtype=np.int64)
    cd, cls, sg = _merge_exec([
        (np.repeat(cit, 2),
         _interleave(flat(tc, cum_all), flat(tc, cum_all + 1)),
         _pm(m), 0),
        (arr_c, flat(cats, np.zeros(n, np.int64)),
         np.ones(n, np.int64), 1),
    ])

    def public(a):
        return a.reshape(*a.shape[:-1], nocats, ncols)[..., :maxind + 1]

    return _Spec(n, nocats * ncols, cit, flat(tc, prior), cd, cls, sg,
                 public=public)


def _spec_l(cit, to, n, agebins):
    binwidth = n // agebins + 1
    never = agebins
    nflat = agebins + 2          # lag bins + never class + padding
    m = len(cit)
    # two lastcit flavors: estimate-time (strictly earlier node — the
    # estimate loop reads lastcit before the batch) vs update-time
    # (previous event incl. same-batch copies — the update loop sets
    # lastcit between copies)
    prev_node, prev_any, nxt_node = _lag_info(cit, to, n)

    def lagbin(c_now, last):
        return np.where(last < 0, never,
                        (c_now + 1 - (last + 1)) // binwidth)

    est_cls = np.minimum(lagbin(cit, prev_node), nflat - 1)
    upd_old = np.minimum(lagbin(cit, prev_any), nflat - 1)
    arr_c = np.arange(n, dtype=np.int64)
    # lag crossings: after a citation from c0, the target crosses lag
    # bin k-1 -> k at c = c0 + binwidth*k - 1 until re-cited by a
    # LATER node (same-batch copies share lastcit, so each edge copy
    # fires its own crossings — the reference rescans c0's neighbor
    # list, multi-edges included, src/revolver_cit.c:2280-2299)
    lg = []
    for k in range(1, agebins + 1):
        c = cit + binwidth * k - 1
        live = (c <= n - 1) & (c < nxt_node)
        nn = int(live.sum())
        if nn == 0:
            continue
        lg.append((np.repeat(c[live], 2),
                   _interleave(np.full(nn, k - 1, np.int64),
                               np.full(nn, k, np.int64)),
                   _pm(nn), 3))
    parts = [
        (np.repeat(cit, 2),
         _interleave(upd_old, np.zeros(m, np.int64)), _pm(m), 0),
        (arr_c, np.full(n, never, np.int64), np.ones(n, np.int64), 1),
    ] + lg
    cd, cls, sg = _merge_exec(parts)
    return _Spec(n, nflat, cit, est_cls, cd, cls, sg,
                 public=lambda a: a[..., :agebins + 1])


def _spec_r(cit, to, n, window, maxind=None):
    m = len(cit)
    vv, ccs, pps, sgs, val_before, val_after = _windowed_stream(
        cit, to, n, window)
    if maxind is None:
        maxind = int(val_after.max(initial=0))
    nflat = maxind + 2
    old_cls = np.minimum(val_before, nflat - 1)
    new_cls = np.minimum(val_after, nflat - 1)
    # estimate classes: windowed in-degree of `to` strictly before the
    # batch of c — citations with c-window <= c' < c
    keys = _per_target_keys(cit, to, n)
    est_cls = (_count_cites_upto(keys, n, to, cit - 1)
               - _count_cites_upto(keys, n, to,
                                   np.maximum(cit - window, 0) - 1))
    est_cls = np.minimum(est_cls, nflat - 1)
    arr_c = np.arange(n, dtype=np.int64)
    all_cd = np.concatenate((np.repeat(ccs, 2), arr_c))
    all_cls = np.concatenate((_interleave(old_cls, new_cls),
                              np.zeros(n, np.int64)))
    all_sg = np.concatenate((_pm(len(vv)), np.ones(n, np.int64)))
    all_ph = np.concatenate((np.repeat(pps, 2), np.ones(n, np.int8)))
    oo = np.lexsort((np.arange(len(all_cd)), all_ph, all_cd))
    return _Spec(n, nflat, cit, est_cls,
                 all_cd[oo], all_cls[oo], all_sg[oo],
                 public=lambda a: a[..., :maxind + 1])


def _lag_info(cit, to, n):
    """Per event: previous citation of the same target from a
    strictly earlier node (estimate-time lastcit), previous event
    including same-batch copies (update-time lastcit), and the next
    citation from a strictly later node (lag-crossing suppressor)."""
    m = len(cit)
    order = np.argsort(to, kind="stable")
    ts, cs = to[order], cit[order]
    same_prev = np.r_[False, ts[1:] == ts[:-1]]
    prev_any_s = np.full(m, -1, np.int64)
    prev_any_s[same_prev] = cs[np.flatnonzero(same_prev) - 1]
    bounds = np.r_[True, (ts[1:] != ts[:-1]) | (cs[1:] != cs[:-1])]
    runs = np.flatnonzero(bounds)
    run_id = np.cumsum(bounds) - 1
    run_prev = np.full(len(runs), -1, np.int64)
    pv = runs - 1
    ok = (pv >= 0) & (ts[runs] == ts[np.maximum(pv, 0)])
    run_prev[ok] = cs[pv[ok]]
    prev_node_s = run_prev[run_id]
    run_next = np.full(len(runs), _INF, np.int64)
    ends = np.r_[runs[1:], m] - 1
    nv = ends + 1
    okn = (nv < m) & (ts[np.minimum(nv, m - 1)] == ts[ends])
    run_next[okn] = cs[nv[okn]]
    nxt_node_s = run_next[run_id]
    prev_any = np.empty(m, np.int64)
    prev_node = np.empty(m, np.int64)
    nxt_node = np.empty(m, np.int64)
    prev_any[order] = prev_any_s
    prev_node[order] = prev_node_s
    nxt_node[order] = nxt_node_s
    return prev_node, prev_any, nxt_node


def _spec_dl(cit, to, n, agebins, maxind=None):
    """(in-degree, citation-lag) kernel (igraph_revolver_mes_dl,
    src/revolver_cit.c:2569): citing moves (x, lag) -> (x+1, 0); a
    lag crossing moves (deg, k-1) -> (deg, k) with the vertex's
    CURRENT degree; arrival at (0, never)."""
    if maxind is None:
        maxind = int(np.bincount(to, minlength=n).max(initial=0))
    binwidth = n // agebins + 1
    never = agebins
    ncols = agebins + 2
    nrows = maxind + 2

    def flat(x, y):
        return x * ncols + y

    prior, cum_all = _prior_counts(cit, to)
    prev_node, prev_any, nxt_node = _lag_info(cit, to, n)

    def lagbin(c_now, last):
        return np.minimum(
            np.where(last < 0, never, (c_now + 1 - (last + 1)) // binwidth),
            ncols - 1)

    est_cls = flat(prior, lagbin(cit, prev_node))
    upd_old = flat(cum_all, lagbin(cit, prev_any))
    m = len(cit)
    arr_c = np.arange(n, dtype=np.int64)
    keys = _per_target_keys(cit, to, n)
    lg = []
    for k in range(1, agebins + 1):
        c = cit + binwidth * k - 1
        live = (c <= n - 1) & (c < nxt_node)
        nn = int(live.sum())
        if nn == 0:
            continue
        deg = _count_cites_upto(keys, n, to[live], c[live])
        lg.append((np.repeat(c[live], 2),
                   _interleave(flat(deg, k - 1), flat(deg, k)),
                   _pm(nn), 3))
    cd, cls, sg = _merge_exec([
        (np.repeat(cit, 2),
         _interleave(upd_old, flat(cum_all + 1, 0)), _pm(m), 0),
        (arr_c, np.full(n, flat(0, never), np.int64),
         np.ones(n, np.int64), 1),
    ] + lg)

    def public(a):
        return a.reshape(*a.shape[:-1], nrows, ncols)[
            ..., :maxind + 1, :agebins + 1]

    return _Spec(n, nrows * ncols, cit, est_cls, cd, cls, sg,
                 public=public)


def _spec_el(cit, to, n, cats, agebins):
    """(category, citation-lag) kernel (igraph_revolver_mes_el,
    src/revolver_cit.c:2986): citing moves (cat, lag) -> (cat, 0);
    lag crossings move (cat, k-1) -> (cat, k); arrival at
    (cats[v], never)."""
    cats = np.asarray(cats, np.int64)
    nocats = int(cats.max(initial=0)) + 1
    binwidth = n // agebins + 1
    never = agebins
    ncols = agebins + 2

    def flat(cat, y):
        return cat * ncols + y

    prev_node, prev_any, nxt_node = _lag_info(cit, to, n)

    def lagbin(c_now, last):
        return np.minimum(
            np.where(last < 0, never, (c_now + 1 - (last + 1)) // binwidth),
            ncols - 1)

    tc = cats[to]
    est_cls = flat(tc, lagbin(cit, prev_node))
    upd_old = flat(tc, lagbin(cit, prev_any))
    m = len(cit)
    arr_c = np.arange(n, dtype=np.int64)
    lg = []
    for k in range(1, agebins + 1):
        c = cit + binwidth * k - 1
        live = (c <= n - 1) & (c < nxt_node)
        nn = int(live.sum())
        if nn == 0:
            continue
        cc = tc[live]
        lg.append((np.repeat(c[live], 2),
                   _interleave(flat(cc, k - 1), flat(cc, k)),
                   _pm(nn), 3))
    cd, cls, sg = _merge_exec([
        (np.repeat(cit, 2),
         _interleave(upd_old, flat(tc, 0)), _pm(m), 0),
        (arr_c, flat(cats, np.full(n, never, np.int64)),
         np.ones(n, np.int64), 1),
    ] + lg)

    def public(a):
        return a.reshape(*a.shape[:-1], nocats, ncols)[..., :agebins + 1]

    return _Spec(n, nocats * ncols, cit, est_cls, cd, cls, sg,
                 public=public)


def _windowed_stream(cit, to, n, window):
    """Per-target merged (+1 citation / -1 expiry) transition stream:
    value-before, value-after, citing-node tag, and phase (0 cite,
    2 expiry)."""
    m = len(cit)
    expire = cit + window
    has_exp = expire <= n - 1
    tv = np.concatenate((to, to[has_exp]))
    tc = np.concatenate((cit, expire[has_exp]))
    tp = np.concatenate((np.zeros(m, np.int8),
                         np.full(int(has_exp.sum()), 2, np.int8)))
    tsg = np.concatenate((np.ones(m, np.int64),
                          -np.ones(int(has_exp.sum()), np.int64)))
    seq = np.concatenate((np.arange(m), np.flatnonzero(has_exp)))
    order = np.lexsort((seq, tp, tc, tv))
    vv, sgs = tv[order], tsg[order]
    starts = np.flatnonzero(np.r_[True, vv[1:] != vv[:-1]])
    run = np.cumsum(sgs)
    base = np.repeat(np.where(starts > 0, run[np.maximum(starts - 1, 0)],
                              0),
                     np.diff(np.r_[starts, len(vv)]))
    val_after = run - base
    return (vv, tc[order], tp[order], sgs, val_after - sgs, val_after)


def _spec_ar(cit, to, n, agebins, window, maxind=None):
    """(age-bin, windowed in-degree) kernel (igraph_revolver_mes_ar,
    src/revolver_cit.c:3843): citations/expiries move along the
    window axis at the vertex's CURRENT age; aging moves along the
    age axis with the CURRENT windowed degree; arrival at (0, 0) with
    the binwidth==1 vertex-0 quirk on the age axis."""
    if maxind is None:
        maxind = int(np.bincount(to, minlength=n).max(initial=0))
    binwidth = n // agebins + 1
    nrows = agebins + 1
    ncols = maxind + 2

    def flat(age, w):
        return age * ncols + w

    vv, cc, pp, sgs, w_before, w_after = _windowed_stream(cit, to, n,
                                                          window)
    age_tr = np.minimum((cc - vv) // binwidth, nrows - 1)
    wb = np.minimum(w_before, ncols - 1)
    wa = np.minimum(w_after, ncols - 1)
    # estimate classes: age analytic, window count strictly pre-batch
    keys = _per_target_keys(cit, to, n)
    est_w = (_count_cites_upto(keys, n, to, cit - 1)
             - _count_cites_upto(keys, n, to,
                                 np.maximum(cit - window, 0) - 1))
    est_cls = flat(np.minimum((cit - to) // binwidth, nrows - 1),
                   np.minimum(est_w, ncols - 1))
    arr_c = np.arange(n, dtype=np.int64)
    arr_cls = np.full(n, flat(0, 0), np.int64)
    if binwidth == 1:
        arr_cls[0] = flat(1, 0)   # src/revolver_cit.c:3901
    # aging: windowed degree AFTER this body's window updates =
    # citations with c-window < cit' <= c
    av, ak, ac = _age_crossings(n, binwidth, agebins)
    aw = (_count_cites_upto(keys, n, av, ac)
          - _count_cites_upto(keys, n, av,
                              np.maximum(ac - window, 0)))
    aw = np.minimum(aw, ncols - 1)
    # transition deltas carry their phase through _merge_exec
    tr_cd = np.repeat(cc, 2)
    tr_cls = _interleave(flat(age_tr, wb), flat(age_tr, wa))
    tr_sg = _pm(len(vv))
    tr_ph = np.repeat(pp, 2)
    ag_cd = np.repeat(ac, 2)
    ag_cls = _interleave(flat(ak - 1, aw), flat(np.minimum(ak, nrows - 1),
                                                aw))
    ag_sg = _pm(len(ac))
    all_cd = np.concatenate((tr_cd, arr_c, ag_cd))
    all_cls = np.concatenate((tr_cls, arr_cls, ag_cls))
    all_sg = np.concatenate((tr_sg, np.ones(n, np.int64), ag_sg))
    all_ph = np.concatenate((tr_ph, np.ones(n, np.int8),
                             np.full(len(ag_cd), 3, np.int8)))
    oo = np.lexsort((np.arange(len(all_cd)), all_ph, all_cd))

    def public(a):
        return a.reshape(*a.shape[:-1], nrows, ncols)[
            ..., :agebins, :maxind + 1]

    return _Spec(n, nrows * ncols, cit, est_cls,
                 all_cd[oo], all_cls[oo], all_sg[oo], public=public)


# ---------------------------------------------------------------------------
# measurement passes


def _mes(spec, st, ecum, want_sd=False):
    """kernel/sd/normfact/cites/logmax for one measure pass
    (src/revolver_cit.c:115-253 shape, any kernel)."""
    ntk = spec.ntk_at_estimates()
    xk = st[spec.est_c - 1] / ntk
    logmax = float(np.log(1.0 / ntk).sum())
    notnull = np.bincount(spec.est_cls, minlength=spec.nflat).astype(float)
    ssum = np.bincount(spec.est_cls, weights=xk, minlength=spec.nflat)
    mean = np.divide(ssum, notnull, out=np.zeros(spec.nflat),
                     where=notnull > 0)
    nf = spec.normfact(ecum)[0]
    zero = nf == 0
    kernel = np.divide(ssum, nf, out=np.zeros(spec.nflat), where=~zero)
    nf = np.where(zero, 1.0, nf)
    sd = None
    if want_sd:
        dev = xk - mean[spec.est_cls]
        m2 = np.bincount(spec.est_cls, weights=dev * dev,
                         minlength=spec.nflat)
        with np.errstate(invalid="ignore", divide="ignore"):
            sd = np.sqrt((m2 + mean * mean * notnull
                          * (1 - notnull / nf)) / (nf - 1))
    return kernel, sd, nf, notnull, logmax


def _expected(spec, kernel_flat, st, cit, n):
    """igraph_revolver_exp_*: kernel[x] times the integral of ntk[x]
    d(cumulative outdeg/st).  Shares the measurement delta stream —
    validated against literal replays of exp_d and exp_ad; one
    divergence corner: when binwidth == 1 (n < agebins) the age
    kernels' mes stream pre-seeds vertex 0 at age bin 1 (the
    reference's mes quirk) while the reference's exp starts it at
    bin 0 — irrelevant at any realistic n.  The reference only
    implements exp for the d and ad kernels (exp_e/l/r/de/dl/el/ar/
    ade are TODO stubs returning nothing); this engine evaluates the
    same well-defined integral for EVERY kernel — a documented
    extension."""
    outdeg = np.bincount(cit, minlength=n)
    cumst = np.zeros(n + 1)
    cumst[1:] = np.cumsum(outdeg / st)
    return spec.integral(cumst[:n], cumst[n]) * kernel_flat


def _error(spec, kernel_flat, st):
    with np.errstate(divide="ignore"):
        logprob = float(np.log(
            kernel_flat[spec.est_cls] / st[spec.est_c - 1]).sum())
    lognull = float(np.log(1.0 / spec.est_c.astype(float)).sum())
    return logprob, lognull


def _driver(spec, cit, n, niter):
    """igraph_revolver_X's iterate-measure-normalize-update loop
    (src/revolver_cit.c:38-113)."""
    ecum = np.cumsum(np.bincount(cit, minlength=n))[None, :].astype(float)
    st = np.ones(n)
    out = {}
    for i in range(niter):
        last = i + 1 == niter
        kernel, sd, nf, cites, logmax = _mes(spec, st, ecum, want_sd=last)
        ks = kernel.sum()
        if ks != 0:   # != not >: NaN sums must propagate like the
            kernel = kernel / ks  # reference's unguarded division
        st = spec.st(kernel)
        if last:
            expected = _expected(spec, kernel, st, cit, n)
            logprob, lognull = _error(spec, kernel, st)
            out = {
                "kernel": spec.public(kernel),
                "sd": spec.public(sd),
                "norm": spec.public(nf),
                "cites": spec.public(cites),
                "expected": spec.public(expected),
                "logprob": logprob,
                "lognull": lognull,
                "logmax": logmax,
                "st": st,
            }
    return out


def _mes_rows(spec, st, ecum_rows, rows, want_sd=False):
    """Measure pass for citing-category-partitioned kernels (di/il/ir
    /adi/air): ntk is SHARED across citing categories; notnull /
    kernel / sd / normfact are per (citing-cat, class), with each
    category's own event counter driving the exposure bookkeeping
    (src/revolver_cit.c:4292: mes_di)."""
    ncc = ecum_rows.shape[0]
    size = ncc * spec.nflat
    ntk = spec.ntk_at_estimates()
    xk = st[spec.est_c - 1] / ntk
    logmax = float(np.log(1.0 / ntk).sum())
    idx = rows * spec.nflat + spec.est_cls
    notnull = np.bincount(idx, minlength=size).astype(float)
    ssum = np.bincount(idx, weights=xk, minlength=size)
    mean = np.divide(ssum, notnull, out=np.zeros(size), where=notnull > 0)
    nf = spec.normfact(ecum_rows).reshape(size)
    zero = nf == 0
    kernel = np.divide(ssum, nf, out=np.zeros(size), where=~zero)
    nf = np.where(zero, 1.0, nf)
    sd = None
    if want_sd:
        dev = xk - mean[idx]
        m2 = np.bincount(idx, weights=dev * dev, minlength=size)
        with np.errstate(invalid="ignore", divide="ignore"):
            sd = np.sqrt((m2 + mean * mean * notnull
                          * (1 - notnull / nf)) / (nf - 1))
        sd = sd.reshape(ncc, spec.nflat)
    return (kernel.reshape(ncc, spec.nflat), sd,
            nf.reshape(ncc, spec.nflat),
            notnull.reshape(ncc, spec.nflat), logmax)


def _st_rows(spec, kernel_rows, cats, full):
    """st for partitioned kernels: per-category running sums, the
    citing node's category row selected per step (st_di,
    src/revolver_cit.c:4446).  ``full=False`` mirrors the drivers
    whose loop stops at n-2 (di/ir/adi/air) leaving st[n-1]=0; il's
    full-range loop reads cats[n] OUT OF BOUNDS in the reference —
    pinned here to the cats[n-1] row (st[n-1] is unused by
    mes/error)."""
    ncc = kernel_rows.shape[0]
    n = spec.n
    allst = np.zeros((ncc, n))
    for j in range(ncc):
        per_c = np.zeros(n)
        np.add.at(per_c, spec.d_cd, spec.d_sg * kernel_rows[j, spec.d_cls])
        allst[j] = np.cumsum(per_c)
    st = np.zeros(n)
    st[0] = allst[cats[0], 0]
    if n > 1:
        hi = n if full else n - 1
        b = np.arange(1, hi)
        sel = cats[np.minimum(b + 1, n - 1)]
        st[b] = allst[sel, b]
    return st


def _driver_rows(spec, cit, n, cats, niter, full_st=False):
    """revolver_di/il/ir/adi/air iteration: like _driver but with
    per-citing-category statistics; the reference's exp_* for these
    kernels are TODO stubs (src/revolver_cit.c:4504), so expected is
    None."""
    cats = np.asarray(cats, np.int64)
    nocats = int(cats.max(initial=0)) + 1
    rows_full = np.zeros((nocats, n))
    np.add.at(rows_full, (cats[cit], cit), 1.0)
    ecum_rows = np.cumsum(rows_full, axis=1)
    rows = cats[spec.est_c]
    st = np.ones(n)
    out = {}
    for i in range(niter):
        last = i + 1 == niter
        kernel, sd, nf, cites, logmax = _mes_rows(
            spec, st, ecum_rows, rows, want_sd=last)
        ks = kernel.sum()
        if ks != 0:   # != not >: NaN sums must propagate like the
            kernel = kernel / ks  # reference's unguarded division
        st = _st_rows(spec, kernel, cats, full_st)
        if last:
            with np.errstate(divide="ignore"):
                logprob = float(np.log(
                    kernel[rows, spec.est_cls]
                    / st[spec.est_c - 1]).sum())
            lognull = float(np.log(1.0 / spec.est_c.astype(float)).sum())
            out = {
                "kernel": spec.public(kernel),
                "sd": spec.public(sd),
                "norm": spec.public(nf),
                "cites": spec.public(cites),
                "expected": None,
                "logprob": logprob,
                "lognull": lognull,
                "logmax": logmax,
                "st": st,
            }
    return out


# ---------------------------------------------------------------------------
# public API


def revolver_d(edges, n=None, niter: int = 5):
    """igraph_revolver_d (src/revolver_cit.c:38): in-degree attachment
    kernel.  Returns dict(kernel, sd, norm, cites, expected, logprob,
    lognull, logmax, st)."""
    cit, to, n = _events(edges, n)
    return _driver(_spec_d(cit, to, n), cit, n, niter)


def revolver_e(edges, cats, n=None, niter: int = 5):
    """igraph_revolver_e (src/revolver_cit.c:1407): static vertex
    categories."""
    cit, to, n = _events(edges, n)
    return _driver(_spec_e(cit, to, n, cats), cit, n, niter)


def revolver_ad(edges, agebins: int, n=None, niter: int = 5):
    """igraph_revolver_ad (src/revolver_cit.c:478): (in-degree,
    age-bin) matrix kernel."""
    cit, to, n = _events(edges, n)
    return _driver(_spec_ad(cit, to, n, agebins), cit, n, niter)


def revolver_de(edges, cats, n=None, niter: int = 5):
    """igraph_revolver_de (src/revolver_cit.c:1726): (category,
    in-degree) matrix kernel."""
    cit, to, n = _events(edges, n)
    return _driver(_spec_de(cit, to, n, cats), cit, n, niter)


def revolver_l(edges, agebins: int, n=None, niter: int = 5):
    """igraph_revolver_l (src/revolver_cit.c:2096): citation-lag
    kernel; index ``agebins`` is the never-cited class."""
    cit, to, n = _events(edges, n)
    return _driver(_spec_l(cit, to, n, agebins), cit, n, niter)


def revolver_r(edges, window: int, n=None, niter: int = 5, maxind=None):
    """igraph_revolver_r (src/revolver_cit.c:3336): recent-citations
    (trailing-window in-degree) kernel."""
    cit, to, n = _events(edges, n)
    return _driver(_spec_r(cit, to, n, window, maxind), cit, n, niter)


def revolver_dl(edges, agebins: int, n=None, niter: int = 5):
    """igraph_revolver_dl (src/revolver_cit.c:2444): (in-degree,
    citation-lag) matrix kernel; lag column ``agebins`` is the
    never-cited class."""
    cit, to, n = _events(edges, n)
    return _driver(_spec_dl(cit, to, n, agebins), cit, n, niter)


def revolver_el(edges, cats, agebins: int, n=None, niter: int = 5):
    """igraph_revolver_el (src/revolver_cit.c:2861): (category,
    citation-lag) matrix kernel."""
    cit, to, n = _events(edges, n)
    return _driver(_spec_el(cit, to, n, cats, agebins), cit, n, niter)


def revolver_ar(edges, agebins: int, window: int, n=None,
                niter: int = 5, maxind=None):
    """igraph_revolver_ar (src/revolver_cit.c:3700): (age-bin,
    windowed in-degree) matrix kernel."""
    cit, to, n = _events(edges, n)
    if maxind is None:
        maxind = int(np.bincount(to, minlength=n).max(initial=0))
    return _driver(_spec_ar(cit, to, n, agebins, window, maxind),
                   cit, n, niter)


def _spec_ade(cit, to, n, cats, agebins, maxind=None):
    """(category, in-degree, age-bin) 3-D kernel
    (igraph_revolver_mes_ade, src/revolver_cit.c:1045): the cited
    vertex's category is part of the class — no partitioning."""
    cats = np.asarray(cats, np.int64)
    nocats = int(cats.max(initial=0)) + 1
    if maxind is None:
        maxind = int(np.bincount(to, minlength=n).max(initial=0))
    binwidth = n // agebins + 1
    ncols = agebins + 1
    ndeg = maxind + 2

    def flat(cat, x, y):
        return (cat * ndeg + x) * ncols + y

    prior, cum_all = _prior_counts(cit, to)
    age_est = (cit - to) // binwidth
    tc = cats[to]
    m = len(cit)
    arr_c = np.arange(n, dtype=np.int64)
    arr_cls = flat(cats, np.zeros(n, np.int64),
                   np.zeros(n, np.int64))
    if binwidth == 1:
        arr_cls[0] = flat(cats[0], 0, 1)
    keys = _per_target_keys(cit, to, n)
    av, ak, ac = _age_crossings(n, binwidth, agebins)
    adeg = _count_cites_upto(keys, n, av, ac)
    acat = cats[av]
    cd, cls, sg = _merge_exec([
        (np.repeat(cit, 2),
         _interleave(flat(tc, cum_all, age_est),
                     flat(tc, cum_all + 1, age_est)), _pm(m), 0),
        (arr_c, arr_cls, np.ones(n, np.int64), 1),
        (np.repeat(ac, 2),
         _interleave(flat(acat, adeg, ak - 1), flat(acat, adeg, ak)),
         _pm(len(ac)), 3),
    ])

    def public(a):
        return a.reshape(*a.shape[:-1], nocats, ndeg, ncols)[
            ..., :maxind + 1, :agebins]

    return _Spec(n, nocats * ndeg * ncols, cit,
                 flat(tc, prior, age_est), cd, cls, sg, public=public)


def revolver_ade(edges, cats, agebins: int, n=None, niter: int = 5):
    """igraph_revolver_ade (src/revolver_cit.c:448 family): (category,
    in-degree, age) 3-D kernel."""
    cit, to, n = _events(edges, n)
    cats = np.asarray(cats, np.int64)
    return _driver(_spec_ade(cit, to, n, cats, agebins), cit, n, niter)


def revolver_di(edges, cats, n=None, niter: int = 5):
    """igraph_revolver_di (src/revolver_cit.c:4184): in-degree kernel
    PARTITIONED by the CITING vertex's category — shared ntk, per-
    category exposure counters and statistics.  ``expected`` is None
    (the reference's exp_di is a TODO stub, src/revolver_cit.c:4504)."""
    cit, to, n = _events(edges, n)
    cats = np.asarray(cats, np.int64)
    return _driver_rows(_spec_d(cit, to, n), cit, n, cats, niter)


def revolver_il(edges, cats, agebins: int, n=None, niter: int = 5):
    """igraph_revolver_il (src/revolver_cit.c:4966): citation-lag
    kernel partitioned by citing category."""
    cit, to, n = _events(edges, n)
    cats = np.asarray(cats, np.int64)
    return _driver_rows(_spec_l(cit, to, n, agebins), cit, n, cats,
                        niter, full_st=True)


def revolver_ir(edges, cats, window: int, n=None, niter: int = 5,
                maxind=None):
    """igraph_revolver_ir (src/revolver_cit.c:5436): windowed
    in-degree kernel partitioned by citing category."""
    cit, to, n = _events(edges, n)
    cats = np.asarray(cats, np.int64)
    return _driver_rows(_spec_r(cit, to, n, window, maxind), cit, n,
                        cats, niter)


def revolver_adi(edges, cats, agebins: int, n=None, niter: int = 5):
    """igraph_revolver_adi (src/revolver_cit.c:4640): (in-degree,
    age) kernel partitioned by citing category."""
    cit, to, n = _events(edges, n)
    cats = np.asarray(cats, np.int64)
    return _driver_rows(_spec_ad(cit, to, n, agebins), cit, n, cats,
                        niter)


def revolver_air(edges, cats, agebins: int, window: int, n=None,
                 niter: int = 5, maxind=None):
    """igraph_revolver_air (src/revolver_cit.c:6050): (age, windowed
    in-degree) kernel partitioned by citing category."""
    cit, to, n = _events(edges, n)
    cats = np.asarray(cats, np.int64)
    if maxind is None:
        maxind = int(np.bincount(to, minlength=n).max(initial=0))
    return _driver_rows(_spec_ar(cit, to, n, agebins, window, maxind),
                        cit, n, cats, niter)


def error2(edges, kernel, kind: str, n=None, cats=None, agebins=None,
           window=None):
    """igraph_revolver_error2_* (src/revolver_cit.c:449+): given an
    externally-supplied kernel, rebuild st from it and return
    (logprob, lognull) — the likelihood probe used to compare fitted
    kernels across model families."""
    cit, to, n = _events(edges, n)
    kernel = np.asarray(kernel, float)
    if cats is not None:
        cats = np.asarray(cats, np.int64)
    ccat = kind in ("di", "il", "ir", "adi", "air")
    spec, kflat = _error2_spec(cit, to, n, kernel, kind, cats, agebins,
                               window)
    if not ccat:
        st = spec.st(kflat)
        return _error(spec, kflat, st)
    nocats = int(cats.max(initial=0)) + 1
    rows2 = kflat.reshape(nocats, spec.nflat)
    st = _st_rows(spec, rows2, cats, kind == "il")
    rows = cats[spec.est_c]
    with np.errstate(divide="ignore"):
        logprob = float(np.log(
            rows2[rows, spec.est_cls] / st[spec.est_c - 1]).sum())
    lognull = float(np.log(1.0 / spec.est_c.astype(float)).sum())
    return logprob, lognull


def evolver_d(n: int, kernel, outseq=None, outdist=None, m: int = 1,
              seed: int = 42) -> pa.Table:
    """igraph_evolver_d (src/evolver_cit.c:94): GROW a citation graph
    from a given in-degree attachment kernel — the generative inverse
    of :func:`revolver_d`.  Vertex i arrives with ``outseq[i]`` (or a
    draw from ``outdist``, or the constant ``m``) citations sampled
    proportional to kernel[deg] over present vertices via a Fenwick
    partial-sum tree (the reference's psumtree).

    Pinned divergences: seeded numpy RNG replaces the reference
    stream, and kernel weights stay FLOATS — the reference truncates
    them to long at each psumtree update (src/evolver_cit.c:154-156),
    which silently zeroes fractional kernels.
    """
    from .games import _Fenwick

    kernel = np.asarray(kernel, float)
    if len(kernel) == 0:
        raise ValueError("Zero length kernel")
    if kernel[0] == 0:
        raise ValueError(
            "Zero attractivity for zero degree vertices not allowed")
    rng = np.random.default_rng(seed)
    if outseq is not None:
        outseq = np.asarray(outseq, np.int64)
        if len(outseq) != n:
            raise ValueError("Invalid out-degree sequence length")
    elif outdist is not None:
        outdist = np.asarray(outdist, float)
        p = outdist / outdist.sum()
        outseq = np.r_[0, rng.choice(len(outdist), size=max(n - 1, 0),
                                     p=p)]
    else:
        outseq = np.r_[0, np.full(max(n - 1, 0), m, np.int64)]
    tree = _Fenwick(n)
    tree.update(0, kernel[0])
    degree = np.zeros(n, np.int64)
    src, dst = [], []
    for i in range(1, n):
        total = tree.total()
        k = int(outseq[i])   # not clamped to i — multi-citations of the
        picked = []          # same older vertex stand in, like the C
        for _ in range(k):
            to = tree.search(rng.uniform(0.0, total))
            degree[to] += 1
            src.append(i)
            dst.append(to)
            picked.append(to)
        for to in picked:
            d = int(degree[to])
            a = kernel[d] if d < len(kernel) else kernel[-1]
            tree.update(to, a)
        tree.update(i, kernel[0])
    return pa.table({"src": np.asarray(src, np.int64),
                     "dst": np.asarray(dst, np.int64)})


def revolver_d_d(edges, vtime, etime, n=None, niter: int = 5):
    """igraph_revolver_d_d (src/revolver_grow.c:40): degree-degree
    PAIR kernel of a growing undirected network with explicit vertex
    and edge times.  At each timestep the probability that a new edge
    lands on a (deg-x, deg-y) vertex pair is A(x, y); the measurement
    divides st[t] by NTKK(x, y) — the number of POSSIBLE new (x, y)
    connections, ntk[x]*ntk[y] (triangular on the diagonal) minus the
    connections already present between the two degree classes.

    Sequential history replay (the reference's own O(E * maxdeg)
    single-threaded scope) with numpy row operations for the
    per-degree-class probes; the event extraction is the only
    distributed-scale step.  The reference's ``exp_d_d`` is a TODO
    stub, so ``expected`` is None.  One faithfully mirrored quirk: the
    yidx+1 exposure probe tests ``before==0 && after==0`` where the
    xidx+1 probe tests ``after>0`` (src/revolver_grow.c:399-411) — a
    likely typo in the reference, kept for output parity.

    Returns dict(kernel, sd, norm, cites, expected=None, logprob,
    lognull, st).
    """
    if isinstance(edges, tuple):
        src = np.asarray(edges[0], np.int64)
        dst = np.asarray(edges[1], np.int64)
    else:
        if not isinstance(edges, pa.Table):
            edges = pa.concat_tables(
                list(edges.iter_batches(batch_format="pyarrow")))
        src = edges["src"].to_numpy().astype(np.int64)
        dst = edges["dst"].to_numpy().astype(np.int64)
    vtime = np.asarray(vtime, np.int64)
    etime = np.asarray(etime, np.int64)
    if n is None:
        n = len(vtime)
    if len(vtime) != n or len(etime) != len(src):
        raise ValueError("vtime/etime length mismatch")
    noev = int(max(vtime.max(initial=-1), etime.max(initial=-1))) + 1
    # undirected max degree (loops double-counted, igraph_maxdegree ALL)
    deg_all = (np.bincount(src, minlength=n) + np.bincount(dst,
                                                           minlength=n))
    maxdeg = int(deg_all.max(initial=0))
    vorder = np.argsort(vtime, kind="stable")
    eorder = np.argsort(etime, kind="stable")
    vptr_at = np.searchsorted(vtime[vorder], np.arange(noev + 1))
    eptr_at = np.searchsorted(etime[eorder], np.arange(noev + 1))
    # incidence lists (edge ids per vertex) for the rescan step
    inc = [[] for _ in range(n)]
    for ei in range(len(src)):
        inc[src[ei]].append(ei)
        inc[dst[ei]].append(ei)
    inc = [np.asarray(x, np.int64) for x in inc]

    D = maxdeg + 1
    st = np.ones(noev)
    out = {}
    for it in range(niter):
        last = it + 1 == niter
        kernel, sd, nf, cites = _mes_d_d(
            src, dst, n, noev, D, st, vorder, eorder, vptr_at, eptr_at,
            inc, want_sd=last)
        ks = kernel.sum()
        if ks != 0:   # != not >: NaN sums must propagate like the
            kernel = kernel / ks  # reference's unguarded division
        st = _st_d_d(src, dst, n, noev, D, kernel, vptr_at, eptr_at,
                     vorder, eorder, inc)
        if last:
            logprob, lognull = _error_d_d(
                src, dst, n, noev, kernel, st, vptr_at, eptr_at, eorder)
            out = {"kernel": kernel, "sd": sd, "norm": nf,
                   "cites": cites, "expected": None,
                   "logprob": logprob, "lognull": lognull, "st": st}
    return out


def _ntkk_row(ntk, ntkk, x):
    """NTKK(x, :) — possible new connections between degree classes
    (src/revolver_grow.c:158)."""
    row = ntk[x] * ntk - ntkk[x]
    row[x] = ntk[x] * (ntk[x] - 1) // 2 - ntkk[x, x]
    return row


def _mes_d_d(src, dst, n, noev, D, st, vorder, eorder, vptr_at, eptr_at,
             inc, want_sd=False):
    degree = np.zeros(n, np.int64)
    added = np.zeros(len(src), bool)
    ntk = np.zeros(D, np.int64)
    ntkk = np.zeros((D, D), np.int64)
    ch = np.zeros((D, D))
    normfact = np.zeros((D, D))
    notnull = np.zeros((D, D))
    kernel = np.zeros((D, D))
    sd = np.zeros((D, D))

    def close_if(mask, rowsel, eptr_new):
        pass

    for t in range(noev):
        nadd = vptr_at[t + 1] - vptr_at[t]
        ntk[0] += nadd
        eptr_new = int(eptr_at[t + 1])
        eptr0 = int(eptr_at[t])
        if ntk[0] == nadd and nadd != 0:
            # src/revolver_grow.c:85-96 — freshly (re)opened 0-row
            if nadd >= 2:
                ch[0, 0] = eptr0
            row = _ntkk_row(ntk, ntkk, 0)
            hit = np.flatnonzero(row[1:] == nadd * ntk[1:]) + 1
            ch[0, hit] = eptr0
            ch[hit, 0] = eptr0
        # estimate pass (degrees frozen over the timestep)
        for p in range(eptr0, eptr_new):
            ei = int(eorder[p])
            x, y = int(degree[src[ei]]), int(degree[dst[ei]])
            notnull[x, y] += 1
            notnull[y, x] = notnull[x, y]
            poss = (ntk[x] * (ntk[x] - 1) // 2 - ntkk[x, x]) if x == y \
                else ntk[x] * ntk[y] - ntkk[x, y]
            xk = st[t] / poss
            oldakk = kernel[x, y]
            kernel[x, y] += (xk - oldakk) / notnull[x, y]
            kernel[y, x] = kernel[x, y]
            if want_sd:
                sd[x, y] += (xk - oldakk) * (xk - kernel[x, y])
                sd[y, x] = sd[x, y]
        # update pass
        for p in range(eptr0, eptr_new):
            ei = int(eorder[p])
            f, tt = int(src[ei]), int(dst[ei])
            x, y = int(degree[f]), int(degree[tt])
            for v, xi in ((f, x), (tt, y)):
                for e2 in inc[v]:
                    if not added[e2]:
                        continue
                    other = dst[e2] if src[e2] == v else src[e2]
                    # (a loop edge keeps other == v, like IGRAPH_OTHER)
                    if src[e2] == v and dst[e2] == v:
                        other = v
                    dg = int(degree[other])
                    ntkk[xi, dg] -= 1
                    ntkk[dg, xi] = ntkk[xi, dg]
                    if _ntkk_row(ntk, ntkk, xi)[dg] == 1:
                        ch[dg, xi] = eptr_new
                        ch[xi, dg] = eptr_new
                    ntkk[xi + 1, dg] += 1
                    ntkk[dg, xi + 1] = ntkk[xi + 1, dg]
                    if _ntkk_row(ntk, ntkk, xi + 1)[dg] == 0:
                        normfact[xi + 1, dg] += eptr_new - ch[xi + 1, dg]
                        normfact[dg, xi + 1] = normfact[xi + 1, dg]
            added[ei] = True
            ntkk[x + 1, y + 1] += 1
            ntkk[y + 1, x + 1] = ntkk[x + 1, y + 1]
            if _ntkk_row(ntk, ntkk, x + 1)[y + 1] == 0:
                normfact[x + 1, y + 1] = eptr_new - ch[x + 1, y + 1]
                normfact[y + 1, x + 1] = normfact[x + 1, y + 1]
            # exposure probes: does removing/adding one vertex of a
            # class empty/open any pair class?  (vectorized rows)
            for xi in (x, y):
                before = _ntkk_row(ntk, ntkk, xi)
                ntk[xi] -= 1
                after = _ntkk_row(ntk, ntkk, xi)
                ntk[xi] += 1
                hit = np.flatnonzero((before > 0) & (after == 0))
                if len(hit):
                    normfact[xi, hit] += eptr_new - ch[xi, hit]
                    normfact[hit, xi] = normfact[xi, hit]
                ntk[xi] -= 1
            before = _ntkk_row(ntk, ntkk, x + 1)
            ntk[x + 1] += 1
            after = _ntkk_row(ntk, ntkk, x + 1)
            ntk[x + 1] -= 1
            hit = np.flatnonzero((before == 0) & (after > 0))
            if len(hit):
                ch[x + 1, hit] = eptr_new
                ch[hit, x + 1] = eptr_new
            ntk[x + 1] += 1
            before = _ntkk_row(ntk, ntkk, y + 1)
            ntk[y + 1] += 1
            after = _ntkk_row(ntk, ntkk, y + 1)
            ntk[y + 1] -= 1
            # the reference tests after==0 here, not after>0 — a
            # probable typo kept for parity (src/revolver_grow.c:405)
            hit = np.flatnonzero((before == 0) & (after == 0))
            if len(hit):
                ch[y + 1, hit] = eptr_new
                ch[hit, y + 1] = eptr_new
            ntk[y + 1] += 1
            degree[f] += 1
            degree[tt] += 1
    eptr = float(eptr_at[noev])
    for i in range(D):
        for j in range(i + 1):
            poss = (ntk[i] * (ntk[i] - 1) // 2 - ntkk[i, i]) if i == j \
                else ntk[i] * ntk[j] - ntkk[i, j]
            if poss != 0:
                normfact[i, j] += eptr - ch[i, j]
                normfact[j, i] = normfact[i, j]
            if normfact[i, j] == 0:
                kernel[i, j] = kernel[j, i] = 0
                normfact[i, j] = normfact[j, i] = 1
            oldakk = kernel[i, j]
            kernel[i, j] *= notnull[i, j] / normfact[i, j]
            kernel[j, i] = kernel[i, j]
            if want_sd:
                sd[i, j] += oldakk * oldakk * notnull[i, j] * (
                    1 - notnull[i, j] / normfact[i, j])
                with np.errstate(invalid="ignore", divide="ignore"):
                    sd[i, j] = np.sqrt(sd[i, j] / (normfact[i, j] - 1))
                sd[j, i] = sd[i, j]
    return kernel, (sd if want_sd else None), normfact, notnull


def _st_d_d(src, dst, n, noev, D, kernel, vptr_at, eptr_at, vorder,
            eorder, inc):
    """src/revolver_grow.c:467 — st over events from the kernel."""
    degree = np.zeros(n, np.int64)
    added = np.zeros(len(src), bool)
    ntk = np.zeros(D, np.int64)
    st = np.zeros(noev)
    k0 = kernel[:, 0]
    for t in range(noev - 1):
        for _ in range(int(vptr_at[t + 1] - vptr_at[t])):
            st[t] += float(ntk @ k0)
            ntk[0] += 1
        st[t + 1] = st[t]
        for p in range(int(eptr_at[t]), int(eptr_at[t + 1])):
            ei = int(eorder[p])
            f, tt = int(src[ei]), int(dst[ei])
            x, y = int(degree[f]), int(degree[tt])
            inc_v = -kernel[x, y]
            inc_v += float(ntk @ (kernel[:, x + 1] - kernel[:, x]
                                  + kernel[:, y + 1] - kernel[:, y]))
            inc_v -= kernel[x + 1, x + 1] + kernel[y + 1, y + 1]
            inc_v += kernel[x, x] + kernel[y, y]
            ntk[x] -= 1
            ntk[y] -= 1
            ntk[x + 1] += 1
            ntk[y + 1] += 1
            for v, xi in ((f, x), (tt, y)):
                for e2 in inc[v]:
                    if not added[e2]:
                        continue
                    other = dst[e2] if src[e2] == v else src[e2]
                    dg = int(degree[other])
                    inc_v += kernel[xi, dg] - kernel[xi + 1, dg]
            added[ei] = True
            degree[f] += 1
            degree[tt] += 1
            st[t + 1] += inc_v
    return st


def _error_d_d(src, dst, n, noev, kernel, st, vptr_at, eptr_at, eorder):
    """src/revolver_grow.c:603."""
    degree = np.zeros(n, np.int64)
    logprob = lognull = 0.0
    vertices = 0
    for t in range(noev):
        vertices += int(vptr_at[t + 1] - vptr_at[t])
        e0, e1 = int(eptr_at[t]), int(eptr_at[t + 1])
        for p in range(e0, e1):
            ei = int(eorder[p])
            x = int(degree[src[ei]])
            y = int(degree[dst[ei]])
            with np.errstate(divide="ignore"):
                logprob += float(np.log(kernel[x, y] / st[t]))
            lognull += float(np.log(
                1.0 / (vertices * (vertices - 1) // 2 - e0)))
        for p in range(e0, e1):
            ei = int(eorder[p])
            degree[src[ei]] += 1
            degree[dst[ei]] += 1
    return logprob, lognull


def revolver_p_p(edges, vtime, etime, authors, eventsizes, n=None,
                 niter: int = 5):
    """igraph_revolver_p_p (src/revolver_grow.c:687): paper-count
    pair kernel of a growing collaboration network.  Vertices are
    authors; each timestep publishes papers (the ``authors`` slice of
    length ``eventsizes[t]`` lists the authors gaining one paper) and
    adds collaboration edges; the kernel A(p_x, p_y) measures how
    paper counts drive new collaborations, with the same NTKK
    possible-connections denominator as :func:`revolver_d_d`.
    ``expected`` is None (exp_p_p is a TODO stub in the reference).
    """
    if isinstance(edges, tuple):
        src = np.asarray(edges[0], np.int64)
        dst = np.asarray(edges[1], np.int64)
    else:
        if not isinstance(edges, pa.Table):
            edges = pa.concat_tables(
                list(edges.iter_batches(batch_format="pyarrow")))
        src = edges["src"].to_numpy().astype(np.int64)
        dst = edges["dst"].to_numpy().astype(np.int64)
    vtime = np.asarray(vtime, np.int64)
    etime = np.asarray(etime, np.int64)
    authors = np.asarray(authors, np.int64)
    eventsizes = np.asarray(eventsizes, np.int64)
    if n is None:
        n = len(vtime)
    if eventsizes.sum() != len(authors):
        raise ValueError("eventsizes must partition authors")
    noev = len(eventsizes)
    P = int(np.bincount(authors, minlength=n).max(initial=0))  # maxpapers
    D = P + 1
    vorder = np.argsort(vtime, kind="stable")
    eorder = np.argsort(etime, kind="stable")
    vptr_at = np.searchsorted(vtime[vorder], np.arange(noev + 1))
    eptr_at = np.searchsorted(etime[eorder], np.arange(noev + 1))
    aptr_at = np.r_[0, np.cumsum(eventsizes)]
    inc = [[] for _ in range(n)]
    for ei in range(len(src)):
        inc[src[ei]].append(ei)
        inc[dst[ei]].append(ei)
    inc = [np.asarray(x, np.int64) for x in inc]
    st = np.ones(noev)
    out = {}
    for it in range(niter):
        last = it + 1 == niter
        kernel, sd, nf, cites = _mes_p_p(
            src, dst, n, noev, D, st, eorder, vptr_at, eptr_at,
            authors, aptr_at, inc, want_sd=last)
        ks = kernel.sum()
        if ks != 0:
            kernel = kernel / ks
        st = _st_p_p(src, dst, n, noev, D, kernel, vptr_at, eptr_at,
                     eorder, authors, aptr_at, inc)
        if last:
            logprob, lognull = _error_p_p(
                src, dst, n, noev, kernel, st, vptr_at, eptr_at, eorder,
                authors, aptr_at)
            out = {"kernel": kernel, "sd": sd, "norm": nf,
                   "cites": cites, "expected": None,
                   "logprob": logprob, "lognull": lognull, "st": st}
    return out


def _mes_p_p(src, dst, n, noev, D, st, eorder, vptr_at, eptr_at,
             authors, aptr_at, inc, want_sd=False):
    papers = np.zeros(n, np.int64)
    added = np.zeros(len(src), bool)
    ntk = np.zeros(D, np.int64)
    ntkk = np.zeros((D, D), np.int64)
    ch = np.zeros((D, D))
    normfact = np.zeros((D, D))
    notnull = np.zeros((D, D))
    kernel = np.zeros((D, D))
    sd = np.zeros((D, D))
    for t in range(noev):
        nadd = int(vptr_at[t + 1] - vptr_at[t])
        ntk[0] += nadd
        eptr0 = int(eptr_at[t])
        eptr_new = int(eptr_at[t + 1])
        if ntk[0] == nadd and nadd != 0:
            if nadd >= 2:
                ch[0, 0] = eptr0
            row = _ntkk_row(ntk, ntkk, 0)
            hit = np.flatnonzero(row[1:] == nadd * ntk[1:]) + 1
            ch[0, hit] = eptr0
            ch[hit, 0] = eptr0
        for p in range(eptr0, eptr_new):
            ei = int(eorder[p])
            x, y = int(papers[src[ei]]), int(papers[dst[ei]])
            notnull[x, y] += 1
            notnull[y, x] = notnull[x, y]
            poss = (ntk[x] * (ntk[x] - 1) // 2 - ntkk[x, x]) if x == y \
                else ntk[x] * ntk[y] - ntkk[x, y]
            xk = st[t] / poss
            oldakk = kernel[x, y]
            kernel[x, y] += (xk - oldakk) / notnull[x, y]
            kernel[y, x] = kernel[x, y]
            if want_sd:
                sd[x, y] += (xk - oldakk) * (xk - kernel[x, y])
                sd[y, x] = sd[x, y]
        # new papers retype their authors
        for ai in range(int(aptr_at[t]), int(aptr_at[t + 1])):
            aut = int(authors[ai])
            pap = int(papers[aut])
            for e2 in inc[aut]:
                if not added[e2]:
                    continue
                other = dst[e2] if src[e2] == aut else src[e2]
                op = int(papers[other])
                ntkk[pap, op] -= 1
                ntkk[op, pap] = ntkk[pap, op]
                if _ntkk_row(ntk, ntkk, pap)[op] == 1:
                    ch[pap, op] = eptr_new
                    ch[op, pap] = eptr_new
                ntkk[pap + 1, op] += 1
                ntkk[op, pap + 1] = ntkk[pap + 1, op]
                if _ntkk_row(ntk, ntkk, pap + 1)[op] == 0:
                    normfact[pap + 1, op] += eptr_new - ch[pap + 1, op]
                    normfact[op, pap + 1] = normfact[pap + 1, op]
            before = _ntkk_row(ntk, ntkk, pap)
            ntk[pap] -= 1
            after = _ntkk_row(ntk, ntkk, pap)
            ntk[pap] += 1
            hit = np.flatnonzero((before > 0) & (after == 0))
            if len(hit):
                normfact[pap, hit] += eptr_new - ch[pap, hit]
                normfact[hit, pap] = normfact[pap, hit]
            ntk[pap] -= 1
            before = _ntkk_row(ntk, ntkk, pap + 1)
            ntk[pap + 1] += 1
            after = _ntkk_row(ntk, ntkk, pap + 1)
            ntk[pap + 1] -= 1
            hit = np.flatnonzero((before == 0) & (after > 0))
            if len(hit):
                ch[pap + 1, hit] = eptr_new
                ch[hit, pap + 1] = eptr_new
            ntk[pap + 1] += 1
            papers[aut] += 1
        # each new edge removes one connection possibility
        for p in range(eptr0, eptr_new):
            ei = int(eorder[p])
            x = int(papers[src[ei]])
            y = int(papers[dst[ei]])
            ntkk[x, y] += 1
            ntkk[y, x] = ntkk[x, y]
            if _ntkk_row(ntk, ntkk, x)[y] == 0:
                normfact[x, y] += eptr_new - ch[x, y]
                normfact[y, x] = normfact[x, y]
            added[ei] = True
    eptr = float(eptr_at[noev])
    for i in range(D):
        for j in range(i + 1):
            poss = (ntk[i] * (ntk[i] - 1) // 2 - ntkk[i, i]) if i == j \
                else ntk[i] * ntk[j] - ntkk[i, j]
            if poss != 0:
                normfact[i, j] += eptr - ch[i, j]
                normfact[j, i] = normfact[i, j]
            if normfact[i, j] == 0:
                kernel[i, j] = kernel[j, i] = 0
                normfact[i, j] = normfact[j, i] = 1
            oldakk = kernel[i, j]
            kernel[i, j] *= notnull[i, j] / normfact[i, j]
            kernel[j, i] = kernel[i, j]
            if want_sd:
                sd[i, j] += oldakk * oldakk * notnull[i, j] * (
                    1 - notnull[i, j] / normfact[i, j])
                with np.errstate(invalid="ignore", divide="ignore"):
                    sd[i, j] = np.sqrt(sd[i, j] / (normfact[i, j] - 1))
                sd[j, i] = sd[i, j]
    return kernel, (sd if want_sd else None), normfact, notnull


def _st_p_p(src, dst, n, noev, D, kernel, vptr_at, eptr_at, eorder,
            authors, aptr_at, inc):
    """src/revolver_grow.c:1077."""
    papers = np.zeros(n, np.int64)
    added = np.zeros(len(src), bool)
    ntk = np.zeros(D, np.int64)
    st = np.zeros(noev)
    k0 = kernel[:, 0]
    for t in range(noev - 1):
        nadd = int(vptr_at[t + 1] - vptr_at[t])
        if nadd != 0:
            st[t] += float(ntk @ k0) * nadd
            st[t] += nadd * (nadd - 1) // 2 * kernel[0, 0]
            ntk[0] += nadd
        st[t + 1] = st[t]
        for ai in range(int(aptr_at[t]), int(aptr_at[t + 1])):
            aut = int(authors[ai])
            pap = int(papers[aut])
            st[t + 1] += float(ntk @ (kernel[:, pap + 1]
                                      - kernel[:, pap]))
            st[t + 1] += kernel[pap, pap] - kernel[pap + 1, pap + 1]
            ntk[pap] -= 1
            ntk[pap + 1] += 1
            for e2 in inc[aut]:
                if added[e2]:
                    other = dst[e2] if src[e2] == aut else src[e2]
                    op = int(papers[other])
                    st[t + 1] += kernel[pap, op] - kernel[pap + 1, op]
            papers[aut] += 1
        for p in range(int(eptr_at[t]), int(eptr_at[t + 1])):
            ei = int(eorder[p])
            x = int(papers[src[ei]])
            y = int(papers[dst[ei]])
            st[t + 1] -= kernel[x, y]
            added[ei] = True
    return st


def _error_p_p(src, dst, n, noev, kernel, st, vptr_at, eptr_at, eorder,
               authors, aptr_at):
    """src/revolver_grow.c:1208."""
    papers = np.zeros(n, np.int64)
    logprob = lognull = 0.0
    vertices = 0
    for t in range(noev):
        vertices += int(vptr_at[t + 1] - vptr_at[t])
        e0, e1 = int(eptr_at[t]), int(eptr_at[t + 1])
        for p in range(e0, e1):
            ei = int(eorder[p])
            x = int(papers[src[ei]])
            y = int(papers[dst[ei]])
            with np.errstate(divide="ignore"):
                logprob += float(np.log(kernel[x, y] / st[t]))
            lognull += float(np.log(
                1.0 / (vertices * (vertices - 1) // 2 - e0)))
        for ai in range(int(aptr_at[t]), int(aptr_at[t + 1])):
            papers[int(authors[ai])] += 1
    return logprob, lognull


def _public_mask(spec):
    """Flat indices belonging to the kernel's public (non-padding)
    region."""
    idx = np.arange(spec.nflat)
    pub = spec.public(idx[None, :]).reshape(-1)
    mask = np.zeros(spec.nflat, bool)
    mask[pub] = True
    return mask


def _ml_fixed_point(spec, cit, to, n, niter, delta, filt):
    """The EM fixed point shared by igraph_revolver_ml_d / ml_ad /
    ml_de / ml_l (src/revolver_ml_cit.c:1786,2370,2543,2891):

        kernel'[x] = cites[x] / sum_t outdeg(t) * ptk_t[x] / S_t

    where ptk_t is the class census just before body t and
    S_t = sum_x kernel[x] * ptk_t[x].  The denominator is the
    integral of the class-count step function against the body
    weights — computed per class from the delta timeline, no Python
    loop over nodes.  Stops when the Linf kernel change drops below
    ``delta`` (returning the PRE-update kernel, like the reference's
    break-before-switch)."""
    pub = _public_mask(spec)
    outdeg = np.bincount(cit, minlength=n).astype(float)
    body_ok = np.ones(n, bool)
    if filt is not None:
        body_ok = np.asarray(filt) != 0
    ev_ok = body_ok[spec.est_c]
    cites = np.bincount(spec.est_cls[ev_ok],
                        minlength=spec.nflat).astype(float)
    kernel = np.where(pub, 1.0, 0.0)
    logprob = logmax = 0.0
    for _ in range(niter):
        st = spec.st(kernel)
        s_before = np.r_[0.0, st[:-1]]
        with np.errstate(divide="ignore", invalid="ignore"):
            w = np.where((s_before != 0) & body_ok,
                         outdeg / s_before, 0.0)
        mu = np.cumsum(w)
        denom = spec.integral(mu, mu[-1])
        sb_ev = s_before[spec.est_c]
        use = ev_ok & (sb_ev != 0)
        with np.errstate(divide="ignore"):
            logprob = float(np.log(
                kernel[spec.est_cls[use]] / sb_ev[use]).sum())
            logmax = float(np.log(
                1.0 / spec.est_c[use].astype(float)).sum())
        upd = denom != 0
        newk = np.where(upd, np.divide(cites, denom,
                                       out=np.zeros(spec.nflat),
                                       where=upd), 0.0)
        newk[~pub] = 0.0
        maxdelta = float(np.abs(newk[upd & pub]
                                - kernel[upd & pub]).max(initial=0.0))
        if maxdelta < delta:
            break
        kernel = newk
    return kernel, cites, logprob, logmax


def revolver_ml_d(edges, n=None, niter: int = 1000,
                  delta: float = 1e-10, filt=None):
    """igraph_revolver_ml_d (src/revolver_ml_cit.c:1786): maximum-
    likelihood in-degree kernel via the EM fixed point.  The
    reference pins kernel[maxdegree] to NaN on return (that class has
    no exposure after its last member maxes out) — mirrored."""
    cit, to, n = _events(edges, n)
    spec = _spec_d(cit, to, n)
    kernel, cites, logprob, logmax = _ml_fixed_point(
        spec, cit, to, n, niter, delta, filt)
    k = spec.public(kernel[None, :])[0].copy()
    k[-1] = np.nan
    return {"kernel": k, "cites": spec.public(cites[None, :])[0],
            "logprob": logprob, "logmax": logmax}


def revolver_ml_ad(edges, agebins: int, n=None, niter: int = 1000,
                   delta: float = 1e-10, filt=None):
    """igraph_revolver_ml_ad (src/revolver_ml_cit.c:2370)."""
    cit, to, n = _events(edges, n)
    spec = _spec_ad(cit, to, n, agebins)
    kernel, cites, logprob, logmax = _ml_fixed_point(
        spec, cit, to, n, niter, delta, filt)
    return {"kernel": spec.public(kernel[None, :])[0],
            "cites": spec.public(cites[None, :])[0],
            "logprob": logprob, "logmax": logmax}


def revolver_ml_de(edges, cats, n=None, niter: int = 1000,
                   delta: float = 1e-10, filt=None):
    """igraph_revolver_ml_de (src/revolver_ml_cit.c:2543)."""
    cit, to, n = _events(edges, n)
    spec = _spec_de(cit, to, n, np.asarray(cats, np.int64))
    kernel, cites, logprob, logmax = _ml_fixed_point(
        spec, cit, to, n, niter, delta, filt)
    return {"kernel": spec.public(kernel[None, :])[0],
            "cites": spec.public(cites[None, :])[0],
            "logprob": logprob, "logmax": logmax}


def revolver_ml_l(edges, agebins: int, n=None, niter: int = 1000,
                  delta: float = 1e-10, filt=None):
    """igraph_revolver_ml_l (src/revolver_ml_cit.c:2891)."""
    cit, to, n = _events(edges, n)
    spec = _spec_l(cit, to, n, agebins)
    kernel, cites, logprob, logmax = _ml_fixed_point(
        spec, cit, to, n, niter, delta, filt)
    return {"kernel": spec.public(kernel[None, :])[0],
            "cites": spec.public(cites[None, :])[0],
            "logprob": logprob, "logmax": logmax}


def revolver_ml_ade(edges, cats, agebins: int, n=None,
                    niter: int = 1000, delta: float = 1e-10, filt=None):
    """igraph_revolver_ml_ade (src/revolver_ml_cit.c:2706): 3-D
    (category, degree, age) ML kernel on the same EM fixed point."""
    cit, to, n = _events(edges, n)
    spec = _spec_ade(cit, to, n, np.asarray(cats, np.int64), agebins)
    kernel, cites, logprob, logmax = _ml_fixed_point(
        spec, cit, to, n, niter, delta, filt)
    return {"kernel": spec.public(kernel[None, :])[0],
            "cites": spec.public(cites[None, :])[0],
            "logprob": logprob, "logmax": logmax}


def _events_with_origin(edges, n=None):
    """Like :func:`_events` but also returns, for each sorted event,
    the ORIGINAL edge-row index (for per-edge outputs)."""
    if isinstance(edges, tuple):
        cit = np.asarray(edges[0], np.int64)
        to = np.asarray(edges[1], np.int64)
    else:
        if not isinstance(edges, pa.Table):
            edges = pa.concat_tables(
                list(edges.iter_batches(batch_format="pyarrow")))
        cit = edges["src"].to_numpy().astype(np.int64)
        to = edges["dst"].to_numpy().astype(np.int64)
    if n is None:
        n = int(max(cit.max(initial=-1), to.max(initial=-1))) + 1
    order = np.lexsort((np.arange(len(cit)), to, cit))
    cit, to = cit[order], to[order]
    if len(cit) and np.any(to >= cit):
        raise ValueError("not a citation graph")
    return cit, to, n, order


def _probs(spec, kernel_flat, cit, to, orig, n, pntk):
    """Shared igraph_revolver_probs_* body
    (src/revolver_ml_cit.c:3043): per-edge log-probabilities under a
    supplied kernel, plus per-cited and per-citing sums."""
    s_before = np.r_[0.0, spec.st(kernel_flat)[:-1]]
    with np.errstate(divide="ignore", invalid="ignore"):
        base = np.log(kernel_flat[spec.est_cls]
                      / s_before[spec.est_c])
        if pntk:
            base = base + np.log(spec.ntk_at_estimates())
    logprobs = np.empty(len(orig))
    logprobs[orig] = base
    logcited = np.zeros(n)
    np.add.at(logcited, to, base)
    logciting = np.zeros(n)
    np.add.at(logciting, cit, base)
    return {"logprobs": logprobs, "logcited": logcited,
            "logciting": logciting}


def revolver_probs_d(edges, kernel, n=None, ntk: bool = False):
    """igraph_revolver_probs_d (src/revolver_ml_cit.c:3043): per-edge
    citation log-probabilities log(kernel[x]/S) (times the class
    count with ``ntk=True``), plus per-cited-vertex and
    per-citing-vertex sums."""
    cit, to, n, orig = _events_with_origin(edges, n)
    kernel = np.asarray(kernel, float)
    spec = _spec_d(cit, to, n, maxind=len(kernel) - 1)
    kf = np.zeros(spec.nflat)
    kf[:len(kernel)] = kernel
    return _probs(spec, kf, cit, to, orig, n, ntk)


def revolver_probs_ad(edges, kernel, agebins: int | None = None,
                      n=None, ntk: bool = False):
    """igraph_revolver_probs_ad (src/revolver_ml_cit.c:3140)."""
    cit, to, n, orig = _events_with_origin(edges, n)
    kernel = np.asarray(kernel, float)
    if agebins is None:
        agebins = kernel.shape[1]
    spec = _spec_ad(cit, to, n, agebins, maxind=kernel.shape[0] - 1)
    kf = np.zeros((kernel.shape[0] + 1, agebins + 1))
    kf[:kernel.shape[0], :kernel.shape[1]] = kernel
    return _probs(spec, kf.reshape(-1), cit, to, orig, n, ntk)


def revolver_probs_de(edges, kernel, cats, n=None, ntk: bool = False):
    """igraph_revolver_probs_de (src/revolver_ml_cit.c:3252)."""
    cit, to, n, orig = _events_with_origin(edges, n)
    kernel = np.asarray(kernel, float)
    cats = np.asarray(cats, np.int64)
    spec = _spec_de(cit, to, n, cats, maxind=kernel.shape[1] - 1)
    kf = np.zeros((kernel.shape[0], kernel.shape[1] + 1))
    kf[:, :kernel.shape[1]] = kernel
    return _probs(spec, kf.reshape(-1), cit, to, orig, n, ntk)


def revolver_probs_ade(edges, kernel, cats, agebins: int | None = None,
                       n=None, ntk: bool = False):
    """igraph_revolver_probs_ade (src/revolver_ml_cit.c:3327)."""
    cit, to, n, orig = _events_with_origin(edges, n)
    kernel = np.asarray(kernel, float)
    cats = np.asarray(cats, np.int64)
    if agebins is None:
        agebins = kernel.shape[2]
    spec = _spec_ade(cit, to, n, cats, agebins,
                     maxind=kernel.shape[1] - 1)
    kf = np.zeros((kernel.shape[0], kernel.shape[1] + 1, agebins + 1))
    kf[:, :kernel.shape[1], :kernel.shape[2]] = kernel
    return _probs(spec, kf.reshape(-1), cit, to, orig, n, ntk)


def revolver_ml_f(edges, n=None, niter: int = 20, seed: int = 42):
    """igraph_revolver_ml_f (src/revolver_ml_cit.c:1957): two-class
    friend-of-friend attachment — after each citation the cited
    vertex's already-present neighbors become "friends"; the kernel
    [non-friend, friend] measures how much friendship boosts the
    probability of the SUBSEQUENT citations of the same new vertex
    (the first citation is uniform).  The reference randomly permutes
    each vertex's citation order per iteration; a seeded numpy
    generator replaces that stream (pinned divergence — same model,
    deterministic).  Sequential driver kernel like the reference's
    own scope.  Returns dict(kernel, cites, logprob, logmax)."""
    cit, to, n = _events(edges, n)
    rng = np.random.default_rng(seed)
    out_adj = [[] for _ in range(n)]
    in_adj = [[] for _ in range(n)]
    for c, v in zip(cit.tolist(), to.tolist()):
        out_adj[c].append(v)
        in_adj[v].append(c)
    for a in in_adj:
        a.sort()
    kernel = np.ones(2)
    cites = np.zeros(2)
    logprob = logmax = 0.0
    for it in range(niter):
        tokernel = np.zeros(2)
        marked = np.zeros(n, np.int64)
        logprob = logmax = 0.0
        for t in range(n):
            neis = out_adj[t]
            nneis = len(neis)
            if nneis == 0:
                continue
            perm = rng.permutation(nneis)
            ptk = np.array([float(t), 0.0])
            for e in range(nneis):
                v = neis[perm[e]]
                x = 1 if marked[v] == t + 1 else 0
                if e != 0:
                    S = ptk[0] * kernel[0] + ptk[1] * kernel[1]
                    tokernel[0] += ptk[0] / S
                    tokernel[1] += ptk[1] / S
                    if it == 0:
                        cites[x] += 1
                    logprob += float(np.log(kernel[x] / S))
                    logmax += float(np.log(1.0 / t))
                else:
                    logprob += float(np.log(1.0 / t))
                    logmax += float(np.log(1.0 / t))
                ptk[x] -= 1
                marked[v] = t + 1
                for nei in in_adj[v]:
                    if nei >= t:
                        break
                    if marked[nei] != t + 1:
                        marked[nei] = t + 1
                        ptk[0] -= 1
                        ptk[1] += 1
                for nei in out_adj[v]:
                    if marked[nei] != t + 1:
                        marked[nei] = t + 1
                        ptk[0] -= 1
                        ptk[1] += 1
        newk = kernel.copy()
        if tokernel[0] != 0:
            newk[0] = cites[0] / tokernel[0]
        if tokernel[1] != 0:
            newk[1] = cites[1] / tokernel[1]
        kernel = newk
    return {"kernel": kernel, "cites": cites, "logprob": logprob,
            "logmax": logmax}


def revolver_ml_df(edges, n=None, niter: int = 20, seed: int = 42):
    """igraph_revolver_ml_df (src/revolver_ml_cit.c:2124): the
    three-row (first-citation, subsequent-non-friend,
    subsequent-friend) x in-degree kernel — the degree-resolved
    friend-of-friend model.  Mirrors the reference's bookkeeping
    op-for-op: the class census persists across citing vertices and
    is un-marked through the same stack-coded restore; S1/S2/S3
    running sums; per-node random citation order from a seeded
    generator (pinned divergence).  Returns dict(kernel(3,maxdeg+1),
    cites, logprob, logmax)."""
    cit, to, n = _events(edges, n)
    rng = np.random.default_rng(seed)
    out_adj = [[] for _ in range(n)]
    in_adj = [[] for _ in range(n)]
    for c, v in zip(cit.tolist(), to.tolist()):
        out_adj[c].append(v)
        in_adj[v].append(c)
    for a in in_adj:
        a.sort()
    maxdeg = int(np.bincount(to, minlength=n).max(initial=0))
    D = maxdeg + 1
    kernel = np.ones((3, D))
    cites = np.zeros((3, D))
    logprob = logmax = 0.0
    for it in range(niter):
        tokernel = np.zeros((3, D))
        ptk = np.zeros((2, D + 1))
        marked = np.zeros(n, np.int64)
        degree = np.zeros(n, np.int64)
        S1 = S2 = S3 = 0.0
        actmax = 0
        stack: list[int] = []
        logprob = logmax = 0.0
        for t in range(n):
            neis = out_adj[t]
            nneis = len(neis)
            perm = rng.permutation(nneis) if nneis else []
            # restore ptk from the stack (undo the previous node's
            # marking; re-enter cited vertices at their new degree)
            while stack:
                deg = stack.pop()
                if deg > 0:
                    ptk[0, deg - 1] += 1
                    ptk[1, deg - 1] = 0
                else:
                    ptk[0, -deg - 1] -= 1
                    ptk[1, -deg - 1] = 0
            S2 = S3
            for e in range(nneis):
                v = neis[perm[e]]
                x = 1 if marked[v] == t + 1 else 0
                y = int(degree[v])
                if e == 0:
                    tokernel[0, :actmax + 1] += ptk[0, :actmax + 1] / S1
                    if it == 0:
                        cites[0, y] += 1
                    if kernel[0, y] != 0:
                        logprob += float(np.log(kernel[0, y] / S1))
                    logmax += float(np.log(1.0 / t))
                else:
                    tokernel[1, :actmax + 1] += ptk[0, :actmax + 1] / S2
                    tokernel[2, :actmax + 1] += ptk[1, :actmax + 1] / S2
                    if it == 0:
                        cites[x + 1, y] += 1
                    if kernel[x + 1, y] != 0:
                        logprob += float(np.log(kernel[x + 1, y] / S2))
                    logmax += float(np.log(1.0 / t))
                marked[v] = t + 1
                degree[v] += 1
                if degree[v] > actmax:
                    actmax += 1
                ptk[x, y] -= 1
                S1 += kernel[0, y + 1] if y + 1 < D else 0.0
                S1 -= kernel[0, y]
                S3 += kernel[1, y + 1] if y + 1 < D else 0.0
                S3 -= kernel[1, y]
                S2 -= kernel[x + 1, y]
                if x == 0:
                    stack.append(y + 2)
                else:
                    stack.append(-y - 1)
                    stack.append(y + 2)
                for nei in in_adj[v]:
                    if nei >= t:
                        break
                    if marked[nei] != t + 1:
                        nd = int(degree[nei])
                        marked[nei] = t + 1
                        ptk[0, nd] -= 1
                        ptk[1, nd] += 1
                        S2 -= kernel[1, nd] - kernel[2, nd]
                        stack.append(nd + 1)
                for nei in out_adj[v]:
                    if marked[nei] != t + 1:
                        nd = int(degree[nei])
                        marked[nei] = t + 1
                        ptk[0, nd] -= 1
                        ptk[1, nd] += 1
                        S2 -= kernel[1, nd] - kernel[2, nd]
                        stack.append(nd + 1)
            S1 += kernel[0, 0]
            S3 += kernel[1, 0]
            ptk[0, 0] += 1
        newk = np.zeros((3, D))
        nz = tokernel != 0
        newk[nz] = cites[nz] / tokernel[nz]
        kernel = newk
    return {"kernel": kernel, "cites": cites, "logprob": logprob,
            "logmax": logmax}


# ---------------------------------------------------------------------------
# continuous-parameter maximum likelihood (igraph_revolver_ml_D /
# ml_AD / ml_DE families, src/revolver_ml_cit.c:64-1780): minimize
#   f(par) = (1/E) * sum_events [ log S_t - log A(x_e; par) ]
# over the kernel-form parameters, with the analytic gradient
#   (1/E) * sum_events [ dS_t/S_t - dA(x_e)/A(x_e) ].
# S_t and dS_t come from the same delta-timeline st recurrence as the
# measurement passes.  The reference optimizes with its vendored
# igraph_bfgs (R's vmmin); here a textbook BFGS with Armijo
# backtracking — a pinned divergence: same objective, same analytic
# gradient, same optimum, different iterate path.


def _ml_cont_eval(spec, filt, A_flat, dA_flats):
    """(f, grad) of the normalized negative log-likelihood
    (igraph_i_revolver_ml_D_eval, src/revolver_ml_cit.c:64)."""
    n = spec.n
    body_ok = np.ones(n, bool) if filt is None else \
        (np.asarray(filt) != 0)
    use = body_ok[spec.est_c]
    ne = int(use.sum())
    cls = spec.est_cls[use]
    cb = spec.est_c[use]
    s_before = np.r_[0.0, spec.st(A_flat)[:-1]]
    with np.errstate(divide="ignore", invalid="ignore"):
        f = float((np.log(s_before[cb]) - np.log(A_flat[cls])).sum()) / ne
    grad = np.empty(len(dA_flats))
    for i, dA in enumerate(dA_flats):
        ds_before = np.r_[0.0, spec.st(dA)[:-1]]
        grad[i] = float((ds_before[cb] / s_before[cb]
                         - dA[cls] / A_flat[cls]).sum()) / ne
    return f, grad


def _bfgs(fg, x0, maxit=250, abstol=1e-10, reltol=1e-8):
    """Deterministic BFGS with Armijo backtracking; returns
    (x, fmin, fncount, grcount)."""
    x = np.asarray(x0, float).copy()
    dim = len(x)
    H = np.eye(dim)
    f, g = fg(x)
    fn = gr = 1
    for _ in range(maxit):
        p = -H @ g
        if not np.isfinite(p).all():
            H = np.eye(dim)
            p = -g
        gp = float(g @ p)
        if gp > 0:
            p, gp = -g, -float(g @ g)
        step = 1.0
        fnew, gnew = None, None
        for _ls in range(40):
            xn = x + step * p
            fn_val, gn_val = fg(xn)
            fn += 1
            gr += 1
            if np.isfinite(fn_val) and fn_val <= f + 1e-4 * step * gp:
                fnew, gnew = fn_val, gn_val
                break
            step *= 0.5
        if fnew is None:
            break
        s = step * p
        y = gnew - g
        sy = float(s @ y)
        if sy > 1e-12:
            rho = 1.0 / sy
            V = np.eye(dim) - rho * np.outer(s, y)
            H = V @ H @ V.T + rho * np.outer(s, s)
        done = abs(f - fnew) < abstol + reltol * (abs(f) + reltol)
        x, f, g = x + s, fnew, gnew
        if done:
            break
    return x, f, fn, gr


def _ml_cont_driver(spec, classgrid_A, x0, maxit, abstol, reltol, filt):
    """Run BFGS over a kernel form; ``classgrid_A(par)`` returns
    (A_flat, [dA_flat per param])."""

    def fg(par):
        A_flat, dA_flats = classgrid_A(par)
        return _ml_cont_eval(spec, filt, A_flat, dA_flats)

    x, fmin, fn, gr = _bfgs(fg, x0, maxit=maxit, abstol=abstol,
                            reltol=reltol)
    return {"par": x, "Fmin": fmin, "fncount": fn, "grcount": gr}


def revolver_ml_D(edges, A, dA, x0, n=None, maxit: int = 250,
                  abstol: float = 1e-10, reltol: float = 1e-8,
                  filt=None):
    """igraph_revolver_ml_D (src/revolver_ml_cit.c:203): optimize a
    user-supplied degree-kernel form.  ``A(degs, par)`` maps a degree
    vector to kernel values; ``dA(degs, par)`` returns a list of
    per-parameter derivative vectors."""
    cit, to, n = _events(edges, n)
    spec = _spec_d(cit, to, n)
    degs = np.arange(spec.nflat, dtype=float)

    def grid(par):
        Af = np.asarray(A(degs, par), float)
        dAf = [np.asarray(v, float) for v in dA(degs, par)]
        return Af, dAf

    return _ml_cont_driver(spec, grid, x0, maxit, abstol, reltol, filt)


def revolver_ml_D_alpha(edges, alpha: float = 1.0, n=None, **kw):
    """igraph_revolver_ml_D_alpha: A(d) = d^alpha + 1
    (src/revolver_ml_cit.c:266-300)."""

    def A(d, par):
        return np.where(d != 0, np.power(np.maximum(d, 1e-300),
                                         par[0]), 0.0) + 1.0

    def dA(d, par):
        with np.errstate(divide="ignore"):
            return [np.where(d != 0,
                             np.log(np.maximum(d, 1e-300))
                             * np.power(np.maximum(d, 1e-300), par[0]),
                             0.0)]

    return revolver_ml_D(edges, A, dA, np.array([alpha]), n=n, **kw)


def revolver_ml_D_alpha_a(edges, alpha: float = 1.0, a: float = 1.0,
                          n=None, **kw):
    """igraph_revolver_ml_D_alpha_a: A(d) = d^alpha + a
    (src/revolver_ml_cit.c:330-420)."""

    def A(d, par):
        return np.where(d != 0, np.power(np.maximum(d, 1e-300),
                                         par[0]), 0.0) + par[1]

    def dA(d, par):
        with np.errstate(divide="ignore"):
            da = np.where(d != 0,
                          np.log(np.maximum(d, 1e-300))
                          * np.power(np.maximum(d, 1e-300), par[0]),
                          0.0)
        return [da, np.ones_like(d)]

    return revolver_ml_D(edges, A, dA, np.array([alpha, a]), n=n, **kw)


def revolver_ml_AD_alpha_a_beta(edges, agebins: int, alpha: float = 1.0,
                                a: float = 1.0, beta: float = 1.0,
                                n=None, maxit: int = 250,
                                abstol: float = 1e-10,
                                reltol: float = 1e-8, filt=None):
    """igraph_revolver_ml_AD_alpha_a_beta (src/revolver_ml_cit.c:1011):
    A(d, age) = (d^alpha + a) * (age+1)^-beta over the (degree,
    age-bin) class grid."""
    cit, to, n = _events(edges, n)
    spec = _spec_ad(cit, to, n, agebins)
    ncols = agebins + 1
    flat = np.arange(spec.nflat)
    dcls = (flat // ncols).astype(float)
    acls = (flat % ncols).astype(float) + 1.0

    def grid(par):
        alpha_, a_, beta_ = par
        # no deg==0 special case in the reference's A (pow(0, alpha)
        # semantics kept; the df does zero the alpha-derivative there)
        with np.errstate(divide="ignore"):
            dpow = np.power(dcls, alpha_)
        base = dpow + a_
        agef = np.power(acls, -beta_)
        Af = base * agef
        with np.errstate(divide="ignore"):
            dlog = np.where(dcls != 0,
                            np.log(np.maximum(dcls, 1e-300)) * dpow, 0.0)
        return Af, [dlog * agef, agef,
                    -np.log(acls) * base * agef]

    return _ml_cont_driver(spec, grid, np.array([alpha, a, beta]),
                           maxit, abstol, reltol, filt)


def revolver_ml_DE_alpha_a(edges, cats, alpha: float = 1.0,
                           a: float = 1.0, coeffs=None, n=None,
                           maxit: int = 250, abstol: float = 1e-10,
                           reltol: float = 1e-8, filt=None):
    """igraph_revolver_ml_DE_alpha_a (src/revolver_ml_cit.c:637):
    A(cat, d) = c_cat * (d^alpha + a) with c_0 pinned to 1; params
    are [alpha, a, c_1 .. c_{K-1}]."""
    cit, to, n = _events(edges, n)
    cats = np.asarray(cats, np.int64)
    nocats = int(cats.max(initial=0)) + 1
    spec = _spec_de(cit, to, n, cats)
    ncols = spec.nflat // nocats
    flat = np.arange(spec.nflat)
    ccls = flat // ncols
    dcls = (flat % ncols).astype(float)
    if coeffs is None:
        coeffs = np.ones(max(nocats - 1, 0))

    def grid(par):
        alpha_, a_ = par[0], par[1]
        cvec = np.r_[1.0, par[2:]]
        dpow = np.where(dcls != 0,
                        np.power(np.maximum(dcls, 1e-300), alpha_), 0.0)
        base = dpow + a_
        Af = cvec[ccls] * base
        with np.errstate(divide="ignore"):
            dlog = np.where(dcls != 0,
                            np.log(np.maximum(dcls, 1e-300)) * dpow, 0.0)
        grads = [cvec[ccls] * dlog, cvec[ccls] * np.ones_like(dcls)]
        for j in range(1, nocats):
            grads.append(np.where(ccls == j, base, 0.0))
        return Af, grads

    x0 = np.r_[alpha, a, np.asarray(coeffs, float)]
    return _ml_cont_driver(spec, grid, x0, maxit, abstol, reltol, filt)


def revolver_ml_AD_dpareto(edges, agebins: int, alpha: float = 1.0,
                           a: float = 1.0, paralpha: float = 1.0,
                           parbeta: float = 1.0, parscale: float = 2.0,
                           n=None, maxit: int = 250,
                           abstol: float = 1e-10,
                           reltol: float = 1e-8, filt=None):
    """igraph_revolver_ml_AD_dpareto (src/revolver_ml_cit.c:1119):
    A(d, age) = (d^alpha + a) * dpareto(age+1) where the aging factor
    is the discrete-Pareto-style piecewise power
    (age/s)^(parbeta-1) below the scale s and (age/s)^(-paralpha-1)
    above it.  PINNED DIVERGENCE: the reference's hand-coded gradient
    carries a sign error on the paralpha component
    (src/revolver_ml_cit.c:1110 region: d/dparalpha of
    (age/s)^(-paralpha-1) is -log(age/s) * value, the C adds +log) —
    the CORRECT analytic gradient is used here, so the optimizer path
    differs while the objective and its true optimum are the
    reference's."""
    cit, to, n = _events(edges, n)
    spec = _spec_ad(cit, to, n, agebins)
    ncols = agebins + 1
    flat = np.arange(spec.nflat)
    dcls = (flat // ncols).astype(float)
    acls = (flat % ncols).astype(float) + 1.0

    def grid(par):
        alpha_, a_, pa_, pb_, ps_ = par
        with np.errstate(divide="ignore"):
            dpow = np.power(dcls, alpha_)
        base = dpow + a_
        below = acls < ps_
        expo = np.where(below, pb_ - 1.0, -pa_ - 1.0)
        ratio = acls / ps_
        agef = np.power(ratio, expo)
        Af = base * agef
        with np.errstate(divide="ignore"):
            dlog = np.where(dcls != 0,
                            np.log(np.maximum(dcls, 1e-300)) * dpow, 0.0)
        lr = np.log(ratio)
        grads = [
            dlog * agef,                              # d/dalpha
            agef,                                     # d/da
            np.where(below, 0.0, -base * lr * agef),  # d/dparalpha
            np.where(below, base * lr * agef, 0.0),   # d/dparbeta
            -base * expo * agef / ps_,                # d/dparscale
        ]
        return Af, grads

    return _ml_cont_driver(
        spec, grid, np.array([alpha, a, paralpha, parbeta, parscale]),
        maxit, abstol, reltol, filt)


def revolver_ml_ADE_dpareto(edges, cats, agebins: int,
                            alpha: float = 1.0, a: float = 1.0,
                            paralpha: float = 1.0, parbeta: float = 1.0,
                            parscale: float = 2.0, coeffs=None, n=None,
                            maxit: int = 250, abstol: float = 1e-10,
                            reltol: float = 1e-8, filt=None):
    """igraph_revolver_ml_ADE_dpareto (src/revolver_ml_cit.c:1590):
    the category-coefficient variant of :func:`revolver_ml_AD_dpareto`
    — A(cat, d, age) = c_cat * (d^alpha + a) * dpareto(age+1), c_0
    pinned to 1.  Same corrected-gradient pinned divergence."""
    cit, to, n = _events(edges, n)
    cats = np.asarray(cats, np.int64)
    nocats = int(cats.max(initial=0)) + 1
    spec = _spec_ade(cit, to, n, cats, agebins)
    ncols = agebins + 1
    ndeg = spec.nflat // (nocats * ncols)
    flat = np.arange(spec.nflat)
    ccls = flat // (ndeg * ncols)
    dcls = ((flat // ncols) % ndeg).astype(float)
    acls = (flat % ncols).astype(float) + 1.0
    if coeffs is None:
        coeffs = np.ones(max(nocats - 1, 0))

    def grid(par):
        alpha_, a_, pa_, pb_, ps_ = par[:5]
        cvec = np.r_[1.0, par[5:]]
        with np.errstate(divide="ignore"):
            dpow = np.power(dcls, alpha_)
        base = dpow + a_
        below = acls < ps_
        expo = np.where(below, pb_ - 1.0, -pa_ - 1.0)
        ratio = acls / ps_
        agef = np.power(ratio, expo)
        cc = cvec[ccls]
        Af = cc * base * agef
        with np.errstate(divide="ignore"):
            dlog = np.where(dcls != 0,
                            np.log(np.maximum(dcls, 1e-300)) * dpow, 0.0)
        lr = np.log(ratio)
        grads = [
            cc * dlog * agef,
            cc * agef,
            np.where(below, 0.0, -cc * base * lr * agef),
            np.where(below, cc * base * lr * agef, 0.0),
            -cc * base * expo * agef / ps_,
        ]
        for j in range(1, nocats):
            grads.append(np.where(ccls == j, base * agef, 0.0))
        return Af, grads

    x0 = np.r_[alpha, a, paralpha, parbeta, parscale,
               np.asarray(coeffs, float)]
    return _ml_cont_driver(spec, grid, x0, maxit, abstol, reltol, filt)


def revolver_ml_ADE_alpha_a_beta(edges, cats, agebins: int,
                                 alpha: float = 1.0, a: float = 1.0,
                                 beta: float = 1.0, coeffs=None,
                                 n=None, maxit: int = 250,
                                 abstol: float = 1e-10,
                                 reltol: float = 1e-8, filt=None):
    """igraph_revolver_ml_ADE_alpha_a_beta
    (src/revolver_ml_cit.c:1463): A(cat, d, age) =
    c_cat * (d^alpha + a) * (age+1)^-beta with c_0 pinned to 1;
    params [alpha, a, beta, c_1 .. c_{K-1}]."""
    cit, to, n = _events(edges, n)
    cats = np.asarray(cats, np.int64)
    nocats = int(cats.max(initial=0)) + 1
    spec = _spec_ade(cit, to, n, cats, agebins)
    ncols = agebins + 1
    ndeg = spec.nflat // (nocats * ncols)
    flat = np.arange(spec.nflat)
    ccls = flat // (ndeg * ncols)
    dcls = ((flat // ncols) % ndeg).astype(float)
    acls = (flat % ncols).astype(float) + 1.0
    if coeffs is None:
        coeffs = np.ones(max(nocats - 1, 0))

    def grid(par):
        alpha_, a_, beta_ = par[0], par[1], par[2]
        cvec = np.r_[1.0, par[3:]]
        with np.errstate(divide="ignore"):
            dpow = np.power(dcls, alpha_)
        base = dpow + a_
        agef = np.power(acls, -beta_)
        cc = cvec[ccls]
        Af = cc * base * agef
        with np.errstate(divide="ignore"):
            dlog = np.where(dcls != 0,
                            np.log(np.maximum(dcls, 1e-300)) * dpow, 0.0)
        grads = [cc * dlog * agef, cc * agef,
                 -cc * base * np.log(acls) * agef]
        for j in range(1, nocats):
            grads.append(np.where(ccls == j, base * agef, 0.0))
        return Af, grads

    x0 = np.r_[alpha, a, beta, np.asarray(coeffs, float)]
    return _ml_cont_driver(spec, grid, x0, maxit, abstol, reltol, filt)


def _error2_spec(cit, to, n, kernel, kind, cats, agebins, window):
    """Build the spec for error2 and pad the public-shaped kernel back
    into the internal flat layout."""
    if kind == "d":
        spec = _spec_d(cit, to, n, maxind=len(kernel) - 1)
        kf = np.zeros(spec.nflat)
        kf[:len(kernel)] = kernel
    elif kind == "e":
        spec = _spec_e(cit, to, n, cats)
        kf = np.asarray(kernel, float)
    elif kind == "l":
        spec = _spec_l(cit, to, n, agebins)
        kf = np.zeros(spec.nflat)
        kf[:len(kernel)] = kernel
    elif kind == "r":
        spec = _spec_r(cit, to, n, window, maxind=len(kernel) - 1)
        kf = np.zeros(spec.nflat)
        kf[:len(kernel)] = kernel
    elif kind == "ad":
        spec = _spec_ad(cit, to, n, agebins, maxind=kernel.shape[0] - 1)
        kf = np.zeros((kernel.shape[0] + 1, agebins + 1))
        kf[:kernel.shape[0], :kernel.shape[1]] = kernel
        kf = kf.reshape(-1)
    elif kind == "de":
        spec = _spec_de(cit, to, n, cats, maxind=kernel.shape[1] - 1)
        kf = np.zeros((kernel.shape[0], kernel.shape[1] + 1))
        kf[:, :kernel.shape[1]] = kernel
        kf = kf.reshape(-1)
    elif kind == "di":
        spec = _spec_d(cit, to, n)
        kf = np.zeros((kernel.shape[0], spec.nflat))
        kf[:, :kernel.shape[1]] = kernel
        kf = kf.reshape(-1)
    else:
        raise ValueError(f"error2: unsupported kernel kind {kind!r}")
    return spec, kf
