"""BEV rasterization: multi-layer occupancy, uint8 height, float max-height.

TPU design: per-point loops with in-place image writes become single
scatter-max ops over flattened cell indices — commutative, order-independent,
and batchable with vmap.  Grid indexing uses C ``round()`` semantics
(half away from zero) to stay pixel-exact with the reference.

Reference semantics:
  * multi-layer (/root/reference/BatchMultiBevGen.cpp:261-321): 24 layers of
    224×224 uint8; x = round((px+112)/res + 0.5); layer = round(z/HEIGHT_RES
    + 2.0); ground (label==0) and out-of-range skipped; occupied = 255.
  * single-layer (ibid:331-373): per-cell max of clamp(int((z+2)*4), 0, 255),
    ground skipped.
  * float BEV (/root/reference/BatchCloudManip.cpp:201-239,
    CloudManip.cpp:79-109): 201×201 float max of z+2 (init 0); ground
    skipped only in the batch variant.
"""

from __future__ import annotations

import jax.numpy as jnp

from pctpu.cloud import Cloud
from pctpu.config import FloatBevConfig, MultiBevConfig, SingleBevConfig
from pctpu.ops.rounding import bev_cell, c_round


def _cell_xy(px, py, max_range, interval):
    return bev_cell(px, max_range, interval), bev_cell(py, max_range, interval)


def multi_bev(
    cloud: Cloud, height_res: float, cfg: MultiBevConfig = MultiBevConfig()
) -> jnp.ndarray:
    """(num_layers, mat, mat) uint8 occupancy BEV.

    ``height_res`` is the sensor's HEIGHT_RES (metres per layer,
    /root/reference/src/Utility.cpp:101-116)."""
    s = cfg.mat_size
    nl = cfg.num_layers
    cx, cy = _cell_xy(cloud.x, cloud.y, cfg.max_range, cfg.interval)
    layer = c_round(cloud.z / height_res + cfg.lidar_to_ground_height).astype(jnp.int32)
    ok = (
        (cx >= 0) & (cx < s) & (cy >= 0) & (cy < s)
        & (layer >= 0) & (layer < nl)
        & (cloud.label != 0)
        & cloud.valid_mask()
    )
    flat = jnp.where(ok, layer * s * s + cx * s + cy, nl * s * s)
    img = jnp.zeros((nl * s * s + 1,), jnp.uint8).at[flat].max(jnp.uint8(255))
    return img[:-1].reshape(nl, s, s)


def single_bev(cloud: Cloud, cfg: SingleBevConfig = SingleBevConfig()) -> jnp.ndarray:
    """(mat, mat) uint8 max-height BEV."""
    s = cfg.mat_size
    cx, cy = _cell_xy(cloud.x, cloud.y, cfg.max_range, cfg.interval)
    # C++ computes int((z + LIDAR_TO_GROUND_HEIGHT) * 4.0): the offset is a
    # *float* 2.0f, so z+2 rounds to f32 first; the ×4.0 double multiply is
    # exact for the default power-of-two scale, so the all-f32 chain below is
    # bit-exact (/root/reference/BatchMultiBevGen.cpp:345-346).
    height = jnp.trunc(
        (cloud.z + jnp.float32(cfg.lidar_to_ground_height))
        * jnp.float32(cfg.height_scale)
    ).astype(jnp.int32)
    height = jnp.clip(height, 0, 255).astype(jnp.uint8)
    ok = (
        (cx >= 0) & (cx < s) & (cy >= 0) & (cy < s)
        & (cloud.label != 0)
        & cloud.valid_mask()
    )
    flat = jnp.where(ok, cx * s + cy, s * s)
    img = (
        jnp.zeros((s * s + 1,), jnp.uint8)
        .at[flat]
        .max(jnp.where(ok, height, jnp.uint8(0)))
    )
    return img[:-1].reshape(s, s)


def float_bev(cloud: Cloud, cfg: FloatBevConfig = FloatBevConfig()) -> jnp.ndarray:
    """(mat, mat) float32 max(z + 2) BEV (zero-initialised)."""
    s = cfg.mat_size
    cx, cy = _cell_xy(cloud.x, cloud.y, cfg.max_range, cfg.interval)
    ok = (cx >= 0) & (cx < s) & (cy >= 0) & (cy < s) & cloud.valid_mask()
    if cfg.filter_ground:
        ok &= cloud.label != 0
    val = cloud.z + cfg.lidar_to_ground_height
    flat = jnp.where(ok, cx * s + cy, s * s)
    img = (
        jnp.zeros((s * s + 1,), jnp.float32)
        .at[flat]
        .max(jnp.where(ok, val, 0.0))
    )
    return img[:-1].reshape(s, s)
