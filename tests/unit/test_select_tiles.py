"""Two-stage hierarchical tile selection vs the flat top_k reference.

The pure-OR pruned path switches to an exact two-stage top-k at
G >= 4096 (the flat [Q, G] top_k was the 10M-tier wall: 35.7 ms of a
60 ms dispatch at [896, 78144] Bk=146). Exactness contract: the
SELECTED-TILE VALUE multISET and the exact u_next must match the flat
path — a cross-supertile tie may pick a different equal-valued tile,
which the pure-OR certificate (theta > u_next) is indifferent to.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from diagon_tpu.search.row_engine import _select_tiles  # noqa: E402


@pytest.mark.parametrize("seed,ties", [(0, False), (1, True)])
def test_two_stage_matches_flat(seed, ties):
    rng = np.random.Generator(np.random.PCG64(seed))
    Q, G, Bk = 16, 8192, 37  # G >= 4096 engages the two-stage path
    tu = rng.normal(size=(Q, G)).astype(np.float32)
    if ties:
        tu = np.round(tu * 4) / 4  # heavy value ties
    tu_j = jax.numpy.asarray(tu)
    t2, u2, m2 = jax.tree.map(
        np.asarray, _select_tiles(tu_j, Bk, G, deterministic=False)
    )
    tf, uf, mf = jax.tree.map(
        np.asarray, _select_tiles(tu_j, Bk, G, deterministic=True)
    )
    assert np.all(u2 == uf)
    v2 = np.sort(np.take_along_axis(tu, t2, axis=1))
    vf = np.sort(np.take_along_axis(tu, tf, axis=1))
    assert np.all(v2 == vf)
    # tsel stays ascending + in range (phase-2 contract)
    assert np.all(np.diff(t2, axis=1) >= (0 if ties else 1))
    assert t2.min() >= 0 and t2.max() < G
    assert np.all(m2 == G)  # pure-OR path: min_unsel unused, G-filled


def test_two_stage_non_divisible_g():
    rng = np.random.Generator(np.random.PCG64(7))
    Q, G, Bk = 8, 4504, 29  # G % 16 != 0 -> -inf padding branch
    tu = rng.normal(size=(Q, G)).astype(np.float32)
    tu_j = jax.numpy.asarray(tu)
    t2, u2, _ = jax.tree.map(
        np.asarray, _select_tiles(tu_j, Bk, G, deterministic=False)
    )
    tf, uf, _ = jax.tree.map(
        np.asarray, _select_tiles(tu_j, Bk, G, deterministic=True)
    )
    assert np.all(u2 == uf)
    assert t2.max() < G  # padded -inf tiles never selected
    v2 = np.sort(np.take_along_axis(tu, t2, axis=1))
    vf = np.sort(np.take_along_axis(tu, tf, axis=1))
    assert np.all(v2 == vf)
