"""Fused per-cloud preprocessing: ordering + ground marking + BEV rasters.

This is the hot loop of the flagship pipeline
(/root/reference/BatchMultiBevGen.cpp:727-757).  On TPU the whole per-cloud
body is one jitted function over fixed-size padded arrays; the batch
dimension is vmapped and (in pipelines) sharded over the device mesh — pure
data parallelism, no cross-chip collectives in the hot path (SURVEY.md §5.8).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pctpu.cloud import Cloud
from pctpu.config import (
    GroundConfig,
    MultiBevConfig,
    SensorParams,
    SingleBevConfig,
)
from pctpu.ops.bev import multi_bev, single_bev
from pctpu.ops.ground import mark_ground
from pctpu.ops.ordering import get_ordered_cloud


@functools.partial(
    jax.jit, static_argnames=("params", "ground_cfg", "multi_cfg", "single_cfg")
)
def preprocess_cloud(
    cloud: Cloud,
    params: SensorParams,
    ground_cfg: GroundConfig = GroundConfig(),
    multi_cfg: MultiBevConfig = MultiBevConfig(),
    single_cfg: SingleBevConfig = SingleBevConfig(),
) -> tuple[Cloud, jnp.ndarray, jnp.ndarray]:
    """One cloud → (labeled ordered cloud, multi-BEV u8, single-BEV u8)."""
    ordered = get_ordered_cloud(cloud, params)
    labeled, _ = mark_ground(ordered, params, ground_cfg)
    return (
        labeled,
        multi_bev(labeled, params.height_res, multi_cfg),
        single_bev(labeled, single_cfg),
    )


@functools.partial(
    jax.jit, static_argnames=("params", "ground_cfg", "multi_cfg", "single_cfg")
)
def preprocess_batch(
    clouds: Cloud,
    params: SensorParams,
    ground_cfg: GroundConfig = GroundConfig(),
    multi_cfg: MultiBevConfig = MultiBevConfig(),
    single_cfg: SingleBevConfig = SingleBevConfig(),
) -> tuple[Cloud, jnp.ndarray, jnp.ndarray]:
    """Batched variant: every Cloud field carries a leading batch axis."""
    fn = functools.partial(
        preprocess_cloud,
        params=params,
        ground_cfg=ground_cfg,
        multi_cfg=multi_cfg,
        single_cfg=single_cfg,
    )
    return jax.vmap(fn)(clouds)
