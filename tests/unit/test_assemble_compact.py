"""_assemble_compact vs a naive numpy assembly, including the bucket
boundaries where dynamic_update_slice would CLAMP (silently shifting a
block) if the build size didn't reserve room for both padded blocks —
e.g. 31 used rows pad to a 32-wide gather that would not fit 1 + 32
rows in a 32-row bank."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from diagon_tpu.search.row_engine import _assemble_compact  # noqa: E402


def _naive(heavy, used, light, n_light, u8):
    D = heavy.shape[1]
    rows = np.zeros((u8, D), np.float32)
    r = 1
    for u in used:
        rows[r] = heavy[u]
        r += 1
    for j in range(n_light):
        rows[r] = light[1 + j]
        r += 1
    return rows


@pytest.mark.parametrize(
    "n_used,n_light",
    [(0, 0), (1, 0), (0, 1), (5, 3), (31, 0), (31, 2), (32, 1), (63, 7)],
)
def test_assemble_matches_naive(n_used, n_light):
    rng = np.random.Generator(np.random.PCG64(n_used * 17 + n_light))
    D = 256
    H = 70
    heavy = rng.normal(size=(H, D)).astype(np.float32)
    used = np.sort(
        rng.choice(H, n_used, replace=False).astype(np.int32)
    )
    nl_bank = max(1, n_light) + 1
    light = rng.normal(size=(nl_bank, D)).astype(np.float32)

    n_rows = 1 + n_used + n_light
    u8 = -(-max(n_rows, 1) // 32) * 32
    ub = -(-max(n_used, 1) // 32) * 32
    lb = -(-max(n_light, 1) // 8) * 8
    u8_build = -(-(1 + ub + lb) // 32) * 32

    used_pad = np.zeros(ub, np.int32)
    used_pad[:n_used] = used
    used_mask = np.zeros(ub, np.float32)
    used_mask[:n_used] = 1.0
    light_mask = np.zeros(lb, np.float32)
    light_mask[:n_light] = 1.0

    got = np.asarray(
        _assemble_compact(
            jnp.asarray(heavy), jnp.asarray(used_pad),
            jnp.asarray(used_mask), jnp.asarray(light),
            jnp.asarray(light_mask), jnp.int32(n_used),
            u8=u8_build, lb=lb,
        )
    )[:u8]
    want = _naive(heavy, used, light, n_light, u8)
    assert got.shape == (u8, D)
    assert np.array_equal(got, want)
