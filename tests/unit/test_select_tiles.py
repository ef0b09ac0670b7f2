"""Two-stage hierarchical tile selection vs the flat top_k reference.

Both pruned paths switch to an exact two-stage top-k at G >= 4096 (the
flat [Q, G] top_k was the 10M-tier wall: 35.7 ms of a 60 ms dispatch at
[896, 78144] Bk=146). Exactness contract vs `_select_tiles_flat`:
- the SELECTED-TILE VALUE multiset and the exact u_next always match;
- on tie-free inputs the selected index sets match exactly;
- min_unsel_feas (boolean path) is exact FOR THE RETURNED SELECTION
  (recomputed in numpy): a cross-supertile zero tie may legitimately
  differ from flat, which only costs an escalation, never exactness.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from diagon_tpu.search.row_engine import (  # noqa: E402
    _select_tiles,
    _select_tiles_flat,
)


def _np_unext_minunsel(tu, tsel, G):
    """Exact u_next / min_unsel_feas for a given selection, in numpy."""
    Q = tu.shape[0]
    u = np.empty(Q, np.float32)
    m = np.empty(Q, np.int32)
    for q in range(Q):
        mask = np.ones(G, bool)
        mask[tsel[q]] = False
        vals = tu[q][mask]
        u[q] = vals.max() if vals.size else -np.inf
        feas = np.nonzero(mask & (tu[q] >= 0))[0]
        m[q] = feas[0] if feas.size else G
    return u, m


@pytest.mark.parametrize("det", [False, True])
@pytest.mark.parametrize("seed,ties", [(0, False), (1, True)])
def test_two_stage_matches_flat(det, seed, ties):
    rng = np.random.Generator(np.random.PCG64(seed))
    Q, G, Bk = 16, 8192, 37  # G >= 4096 engages the two-stage path
    tu = rng.normal(size=(Q, G)).astype(np.float32)
    if ties:
        tu = np.round(tu * 4) / 4  # heavy value ties
    tu_j = jax.numpy.asarray(tu)
    t2, u2, m2 = jax.tree.map(
        np.asarray, _select_tiles(tu_j, Bk, G, deterministic=det)
    )
    tf, uf, mf = jax.tree.map(np.asarray, _select_tiles_flat(tu_j, Bk, G))
    assert np.all(u2 == uf)
    v2 = np.sort(np.take_along_axis(tu, t2, axis=1))
    vf = np.sort(np.take_along_axis(tu, tf, axis=1))
    assert np.all(v2 == vf)
    if not ties:
        assert np.all(t2 == tf)  # tie-free: identical selection
    # tsel ascending + in range (phase-2 contract)
    assert np.all(np.diff(t2, axis=1) >= (0 if ties else 1))
    assert t2.min() >= 0 and t2.max() < G
    # u_next / min_unsel exact for the returned selection
    u_np, m_np = _np_unext_minunsel(tu, t2, G)
    assert np.all(u2 == u_np)
    if det:
        assert np.all(m2 == m_np)
    else:
        assert np.all(m2 == G)  # pure-OR path: min_unsel unused


def test_two_stage_boolean_zero_ties():
    """FILTER-style bounds ({0, -1} only): selection must take the
    LOWEST-docid feasible tiles and min_unsel must expose the first
    unselected feasible tile — the zero-tie certificate's inputs."""
    rng = np.random.Generator(np.random.PCG64(5))
    Q, G, Bk = 8, 4096, 19
    tu = np.where(
        rng.random((Q, G)) < 0.01, np.float32(0.0), np.float32(-1.0)
    ).astype(np.float32)
    tu_j = jax.numpy.asarray(tu)
    t2, u2, m2 = jax.tree.map(
        np.asarray, _select_tiles(tu_j, Bk, G, deterministic=True)
    )
    u_np, m_np = _np_unext_minunsel(tu, t2, G)
    assert np.all(u2 == u_np)
    assert np.all(m2 == m_np)
    for q in range(Q):
        feas = np.nonzero(tu[q] >= 0)[0]
        want = feas[:Bk] if len(feas) >= Bk else feas
        got = t2[q][np.isin(t2[q], feas)]
        # all-zero case: two-stage picks exactly the first-Bk zeros
        assert np.array_equal(np.unique(got[: len(want)]), np.unique(want))


def test_two_stage_non_divisible_g():
    rng = np.random.Generator(np.random.PCG64(7))
    Q, G, Bk = 8, 4504, 29  # G % 16 != 0 -> -inf padding branch
    tu = rng.normal(size=(Q, G)).astype(np.float32)
    tu_j = jax.numpy.asarray(tu)
    for det in (False, True):
        t2, u2, m2 = jax.tree.map(
            np.asarray, _select_tiles(tu_j, Bk, G, deterministic=det)
        )
        tf, uf, _ = jax.tree.map(
            np.asarray, _select_tiles_flat(tu_j, Bk, G)
        )
        assert np.all(u2 == uf)
        assert t2.max() < G  # padded -inf tiles never selected
        assert np.all(t2 == tf)  # continuous values: no ties
        if det:
            _, m_np = _np_unext_minunsel(tu, t2, G)
            assert np.all(m2 == m_np)
