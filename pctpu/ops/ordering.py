"""Cylindrical ordering: scatter points into the dense (N_SCAN, Horizon_SCAN)
range-image grid.

Reproduces ``getOrderedCloud`` (/root/reference/BatchMultiBevGen.cpp:94-117):
points with out-of-bounds row/col are dropped; cells never hit stay all-zero
(default-constructed); when several points map to one cell the **last** one in
input order wins.

TPU design: the sequential "last wins" rule becomes one ``segment_max`` over
point indices followed by a gather — a fixed-shape, fully parallel scatter
that XLA lowers without any serialization on the point loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pctpu.cloud import Cloud
from pctpu.config import SensorParams


def get_ordered_cloud(cloud: Cloud, params: SensorParams) -> Cloud:
    """Order a padded cloud into the dense sensor grid.

    Returns a Cloud of capacity ``params.grid_size`` whose slot ``r*H + c``
    holds the last input point with (row, col) == (r, c), or zeros.
    """
    g = params.grid_size
    p = cloud.capacity
    in_bounds = (
        (cloud.row >= 0)
        & (cloud.row < params.n_scan)
        & (cloud.col >= 0)
        & (cloud.col < params.horizon_scan)
        & cloud.valid_mask()
    )
    cell = cloud.row * params.horizon_scan + cloud.col
    cell = jnp.where(in_bounds, cell, g)  # dropped points land in a spare slot

    point_idx = jnp.arange(p, dtype=jnp.int32)
    winner = jax.ops.segment_max(point_idx, cell, num_segments=g + 1)[:g]
    occupied = winner >= 0
    src = jnp.where(occupied, winner, 0)

    def _gather(field, dtype):
        taken = jnp.take(field, src, axis=0)
        zero = jnp.zeros((), dtype)
        if taken.ndim == 2:
            return jnp.where(occupied[:, None], taken, zero)
        return jnp.where(occupied, taken, zero)

    return Cloud(
        xyz=_gather(cloud.xyz, jnp.float32),
        intensity=_gather(cloud.intensity, jnp.float32),
        row=_gather(cloud.row, jnp.int32),
        col=_gather(cloud.col, jnp.int32),
        t=_gather(cloud.t, jnp.uint32),
        label=_gather(cloud.label, jnp.int32),
        count=jnp.asarray(g, jnp.int32),
    )
