"""Device columnar scan/filter/aggregate kernels.

The TPU form of the reference's 3-level granule evaluation
(``benchmarks/columnar/ColumnarStore.h``: SKIP / BULK / decompress+scan):
columns live in HBM as ``[G, granule_rows]`` tiles; a range predicate first
evaluates against the dense per-granule minmax arrays (the SKIP level —
one vectorized compare over ``[G]``), then surviving granules evaluate
row-level predicates and aggregate on the VPU. Everything is one fused
XLA program per (predicate shape, aggregate set).

Precision: device evaluation is float32 (x64 is disabled on TPU), so
numeric predicates and sums are exact for integer magnitudes < 2**24;
larger domains should use the host scan path (``ColumnarTable`` columns
are exact int64/float64 numpy). A hi/lo int64 Pallas kernel is the
planned upgrade for full 64-bit range predicates on device.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diagon_tpu.columnar.table import ColumnarTable



@partial(jax.jit, static_argnames=("with_group", "num_groups"))
def _range_agg_kernel(
    filt,  # f32/i64-as-f64 [G, R] filter column tiled by granule
    aggv,  # f64 [G, R] aggregate column
    valid,  # bool [G, R] row validity (tail padding)
    gmin,  # [G] per-granule min of filt
    gmax,  # [G] per-granule max of filt
    bounds,  # f64 [2]: lower, upper (+-inf for open)
    groups=None,  # i32 [G, R] group ids (optional)
    *,
    with_group: bool = False,
    num_groups: int = 0,
):
    lower, upper = bounds[0], bounds[1]
    gmask = (gmax >= lower) & (gmin <= upper)  # SKIP level
    rmask = valid & (filt >= lower) & (filt <= upper) & gmask[:, None]

    cnt = jnp.sum(rmask).astype(jnp.float32)
    s = jnp.sum(jnp.where(rmask, aggv, 0.0))
    mn = jnp.min(jnp.where(rmask, aggv, jnp.inf))
    mx = jnp.max(jnp.where(rmask, aggv, -jnp.inf))
    granules_scanned = jnp.sum(gmask.astype(jnp.int32)).astype(jnp.float32)

    if with_group:
        gidx = jnp.where(rmask, groups, num_groups).reshape(-1)
        gcnt = (
            jnp.zeros(num_groups + 1, jnp.float32)
            .at[gidx]
            .add(1.0, mode="drop")[:num_groups]
        )
        gsum = (
            jnp.zeros(num_groups + 1, jnp.float32)
            .at[gidx]
            .add(jnp.where(rmask, aggv, 0.0).reshape(-1).astype(jnp.float32),
                 mode="drop")[:num_groups]
        )
        return jnp.stack([cnt, s, mn, mx, granules_scanned]), gcnt, gsum
    # single fused output -> one device->host readback
    return jnp.stack([cnt, s, mn, mx, granules_scanned])


class DeviceTable:
    """A ColumnarTable resident on device, tiled [G, granule_rows]."""

    def __init__(self, table: ColumnarTable, device=None):
        self.table = table
        self.granule_rows = table.granule_rows
        self.num_rows = table.num_rows
        G = table.num_granules
        self.num_granules = G
        R = self.granule_rows

        self.columns: Dict[str, jnp.ndarray] = {}
        self.minmax: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]] = {}
        valid = np.zeros((G, R), dtype=bool)
        flat_valid = valid.reshape(-1)
        flat_valid[: self.num_rows] = True
        self.valid = jax.device_put(jnp.asarray(valid), device)

        for name, col in table.columns.items():
            if not hasattr(col, "values"):
                continue  # strings are host-side (bloom prune + host scan)
            vals = np.zeros(G * R, dtype=np.float32)
            vals[: self.num_rows] = col.values.astype(np.float32)
            self.columns[name] = jax.device_put(
                jnp.asarray(vals.reshape(G, R)), device
            )
            mm = table.minmax.get(name)
            if mm is not None:
                self.minmax[name] = (
                    jax.device_put(jnp.asarray(mm.mins.astype(np.float32)), device),
                    jax.device_put(jnp.asarray(mm.maxs.astype(np.float32)), device),
                )

    def _bounds(self, lower, upper):
        lo = -np.inf if lower is None else float(lower)
        hi = np.inf if upper is None else float(upper)
        return jnp.asarray([lo, hi], dtype=jnp.float32)

    def range_agg(
        self,
        filter_col: str,
        lower=None,
        upper=None,
        agg_col: Optional[str] = None,
    ) -> Dict[str, float]:
        """count/sum/min/max/avg of ``agg_col`` over rows where
        ``filter_col`` in [lower, upper]."""
        filt = self.columns[filter_col]
        aggv = self.columns[agg_col] if agg_col else filt
        mm = self.minmax.get(filter_col)
        if mm is None:
            gmin = jnp.min(jnp.where(self.valid, filt, jnp.inf), axis=1)
            gmax = jnp.max(jnp.where(self.valid, filt, -jnp.inf), axis=1)
        else:
            gmin, gmax = mm
        fused = np.asarray(
            _range_agg_kernel(
                filt, aggv, self.valid, gmin, gmax, self._bounds(lower, upper)
            )
        )  # one device->host readback
        cnt = int(fused[0])
        return {
            "count": cnt,
            "sum": float(fused[1]),
            "min": float(fused[2]) if cnt else None,
            "max": float(fused[3]) if cnt else None,
            "avg": float(fused[1]) / cnt if cnt else None,
            "granules_scanned": int(fused[4]),
            "granules_total": self.num_granules,
        }

    def range_group_agg(
        self,
        filter_col: str,
        group_col: str,
        num_groups: int,
        lower=None,
        upper=None,
        agg_col: Optional[str] = None,
    ):
        """Per-group count/sum for a small-cardinality int group column."""
        filt = self.columns[filter_col]
        aggv = self.columns[agg_col] if agg_col else filt
        groups = self.columns[group_col].astype(jnp.int32)
        mm = self.minmax.get(filter_col)
        if mm is None:
            gmin = jnp.min(jnp.where(self.valid, filt, jnp.inf), axis=1)
            gmax = jnp.max(jnp.where(self.valid, filt, -jnp.inf), axis=1)
        else:
            gmin, gmax = mm
        fused, gcnt, gsum = _range_agg_kernel(
            filt,
            aggv,
            self.valid,
            gmin,
            gmax,
            self._bounds(lower, upper),
            groups,
            with_group=True,
            num_groups=num_groups,
        )
        fused = np.asarray(fused)
        return {
            "count": int(fused[0]),
            "group_counts": np.asarray(gcnt),
            "group_sums": np.asarray(gsum),
            "granules_scanned": int(fused[4]),
        }
