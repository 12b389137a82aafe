"""xdata latent-position samplers + RDPG / correlated games
(ref src/dotproduct.c, src/games.c:3867-4116)."""

from __future__ import annotations

import numpy as np
import pytest

from xdata_igraph_ray.graph.generators import (
    correlated_game,
    correlated_pair_game,
    dot_product_game,
    sample_dirichlet,
    sample_sphere_surface,
    sample_sphere_volume,
)


def test_sphere_samplers():
    s = sample_sphere_surface(3, 500, radius=2.0, seed=1)
    assert s.shape == (500, 3)
    assert np.allclose(np.linalg.norm(s, axis=1), 2.0)
    sp = sample_sphere_surface(4, 200, positive=True, seed=2)
    assert (sp >= 0).all()
    assert np.allclose(np.linalg.norm(sp, axis=1), 1.0)
    v = sample_sphere_volume(3, 2000, radius=1.0, seed=3)
    r = np.linalg.norm(v, axis=1)
    assert (r <= 1.0 + 1e-12).all()
    # uniform in ball: r^3 ~ U(0,1)
    assert abs((r ** 3).mean() - 0.5) < 0.03
    with pytest.raises(ValueError, match="two dimensional"):
        sample_sphere_surface(1, 10)
    with pytest.raises(ValueError, match="radius"):
        sample_sphere_surface(3, 10, radius=0.0)


def test_dirichlet_sampler():
    d = sample_dirichlet(1000, [2.0, 3.0, 5.0], seed=4)
    assert d.shape == (1000, 3)
    assert np.allclose(d.sum(axis=1), 1.0)
    assert (d > 0).all()
    # mean of component i is alpha_i / sum(alpha)
    assert np.allclose(d.mean(axis=0), [0.2, 0.3, 0.5], atol=0.02)
    with pytest.raises(ValueError, match="too short"):
        sample_dirichlet(10, [1.0])
    with pytest.raises(ValueError, match="positive"):
        sample_dirichlet(10, [1.0, -1.0])


def test_dot_product_game_rates():
    # two latent groups: within-group prob .via dot products
    a = np.array([0.8, 0.1])
    b = np.array([0.1, 0.8])
    vecs = np.vstack([np.tile(a, (150, 1)), np.tile(b, (150, 1))])
    t = dot_product_game(vecs, directed=False, seed=5)
    src = t["src"].to_numpy()
    dst = t["dst"].to_numpy()
    n_half = 150
    within_a = ((src < n_half) & (dst < n_half)).sum()
    across = ((src < n_half) != (dst < n_half)).sum()
    pairs_within = n_half * (n_half - 1) / 2
    pairs_across = n_half * n_half
    # <a,a> = 0.65, <a,b> = 0.16
    assert abs(within_a / pairs_within - 0.65) < 0.05
    assert abs(across / pairs_across - 0.16) < 0.04
    # no self loops, canonical undirected orientation
    assert (src < dst).all()
    # prob > 1 always adds an edge; prob < 0 never does
    big = np.vstack([np.tile([2.0, 0.0], (10, 1)),
                     np.tile([-0.5, 0.5], (10, 1))])
    t2 = dot_product_game(big, directed=False, seed=6)
    s2, d2 = t2["src"].to_numpy(), t2["dst"].to_numpy()
    first = (s2 < 10) & (d2 < 10)          # <v,v> = 4 > 1: complete
    assert first.sum() == 45
    across = (s2 < 10) != (d2 < 10)        # <a,b> = -1 < 0: empty
    assert across.sum() == 0


def _density_and_corr(t1, t2, n):
    def pairset(t):
        s, d = t["src"].to_numpy(), t["dst"].to_numpy()
        return set(zip(np.minimum(s, d).tolist(),
                       np.maximum(s, d).tolist()))

    e1, e2 = pairset(t1), pairset(t2)
    total = n * (n - 1) / 2
    p1, p2 = len(e1) / total, len(e2) / total
    both = len(e1 & e2) / total
    cov = both - p1 * p2
    return p1, p2, cov / np.sqrt(p1 * (1 - p1) * p2 * (1 - p2))


def test_correlated_game_statistics():
    n, p, corr = 400, 0.08, 0.6
    g1, g2 = correlated_pair_game(n, corr, p, directed=False, seed=7)
    d1, d2, r = _density_and_corr(g1, g2, n)
    assert abs(d1 - p) < 0.01
    assert abs(d2 - p) < 0.01
    assert abs(r - corr) < 0.06
    # corr=1 reproduces the graph exactly
    same = correlated_game(g1, n, 1.0, p, directed=False, seed=8)
    assert _density_and_corr(g1, same, n)[2] == pytest.approx(1.0)
    # permutation relabels
    perm = np.roll(np.arange(n), 1)
    permd = correlated_game(g1, n, 1.0, p, directed=False, seed=9,
                            permutation=perm)
    s, d = g1["src"].to_numpy(), g1["dst"].to_numpy()
    sp, dp = permd["src"].to_numpy(), permd["dst"].to_numpy()
    assert set(zip(perm[s].tolist(), perm[d].tolist())) == \
        set(zip(sp.tolist(), dp.tolist()))
    with pytest.raises(ValueError, match="correlation"):
        correlated_game(g1, n, 1.5, p)
    with pytest.raises(ValueError, match="probability"):
        correlated_game(g1, n, 0.5, 1.0)


def test_rdpg_spectral_roundtrip():
    """The xdata workflow: latent positions -> RDPG -> rank-2 spectral
    factorization recovers a Gram matrix close to the planted one
    (dense-numpy ASE; the distributed ASE has its own tests)."""
    n = 300
    base = sample_dirichlet(n, [6.0, 2.0], seed=11) * 0.9
    t = dot_product_game(base, directed=False, seed=12)
    A = np.zeros((n, n))
    s = t["src"].to_numpy()
    d = t["dst"].to_numpy()
    A[s, d] = 1.0
    A[d, s] = 1.0
    w, V = np.linalg.eigh(A)
    top = np.argsort(-np.abs(w))[:2]
    X = V[:, top] * np.sqrt(np.abs(w[top]))
    G_hat = X @ X.T
    G = base @ base.T
    np.fill_diagonal(G_hat, 0)
    np.fill_diagonal(G, 0)
    assert np.abs(G_hat - G).mean() < 0.08, np.abs(G_hat - G).mean()
