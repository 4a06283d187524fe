"""Top-part extraction: keep the top 20% (by z) of each 20 m grid cell,
project to z = 0.

Reproduces ``extractTopAndFlatten``
(/root/reference/BatchTopPartRegistration.cpp:90-147): 10×10 grid over
±100 m with C-round cell indexing (so x ≥ 90 m rounds to cell 10 and is
dropped, :113-116); ground (label==0) skipped; cells with < 20 points
skipped; per cell keep round(0.2*n) points sorted by z descending; output
iterates cells in (gx, gy) row-major order, z-descending within a cell.

TPU design: the per-cell sort becomes one global lexsort by (cell, -z); a
point's rank inside its cell is its sorted position minus the cell's start
offset, and selection is ``rank < k(cell)`` — fixed shapes, no ragged
buckets.  The compacted output preserves the reference's exact point order.
"""

from __future__ import annotations

import jax.numpy as jnp

from pctpu.cloud import Cloud
from pctpu.config import TopFlattenConfig
from pctpu.ops.rounding import c_round


def extract_top_and_flatten(
    cloud: Cloud, cfg: TopFlattenConfig = TopFlattenConfig()
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (xyz (N,3) with z=0, valid mask (N,), count) — compacted to the
    front in reference order, zero-padded."""
    ncell = cfg.num_grid_x * cfg.num_grid_y
    gx = c_round((cloud.x + cfg.max_radius_x) / cfg.grid_res_x).astype(jnp.int32)
    gy = c_round((cloud.y + cfg.max_radius_y) / cfg.grid_res_y).astype(jnp.int32)
    ok = (
        (cloud.label != 0)
        & (gx >= 0) & (gx < cfg.num_grid_x)
        & (gy >= 0) & (gy < cfg.num_grid_y)
        & cloud.valid_mask()
    )
    cell = jnp.where(ok, gx * cfg.num_grid_y + gy, ncell)

    counts = jnp.zeros((ncell + 1,), jnp.int32).at[cell].add(1)
    k = c_round(cfg.top_fraction * counts.astype(jnp.float32)).astype(jnp.int32)
    k = jnp.where(counts[:ncell] >= cfg.min_grid_points, k[:ncell], 0)
    k = jnp.concatenate([k, jnp.zeros((1,), jnp.int32)])  # dropped bucket keeps 0

    # global sort: cell ascending, z descending (stable → original order ties)
    order = jnp.lexsort((-cloud.z, cell))
    cell_sorted = cell[order]
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]]
    )
    p = cloud.capacity
    rank = jnp.arange(p, dtype=jnp.int32) - starts[cell_sorted]
    keep = rank < k[cell_sorted]

    # compact kept points to the front, preserving sorted (reference) order
    compact = jnp.argsort(~keep, stable=True)
    src = order[compact]
    keep_c = keep[compact]
    xyz = jnp.where(keep_c[:, None], cloud.xyz[src], 0.0)
    xyz = xyz.at[:, 2].set(0.0)  # flatten (:140-143)
    return xyz, keep_c, jnp.sum(keep.astype(jnp.int32))
