"""Deterministic voxel-grid centroid downsampling (PCL VoxelGrid semantics).

Reproduces ``pcl::VoxelGrid`` with leaf 0.2
(/root/reference/BatchTopPartRegistration.cpp:342-346): voxel index
ijk = floor(coord / leaf) offset by the cloud min; one output point per
occupied voxel = the centroid of its points; outputs ordered by ascending
flat voxel index (PCL sorts its index vector).

TPU design: dynamic voxel counts become a fixed-size sort + segment mean:
sort points by voxel key, detect segment heads, scatter-mean, and compact —
all static shapes, fully parallel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def voxel_downsample(
    xyz: jnp.ndarray, mask: jnp.ndarray, leaf: float
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(xyz (N,3), valid (N,), leaf) → (centroids (N,3), valid (N,), count).

    Centroids are compacted to the front in ascending-voxel order.
    """
    n = xyz.shape[0]
    inv = 1.0 / leaf
    big = jnp.float32(1e30)
    guarded = jnp.where(mask[:, None], xyz, big)
    mins = jnp.min(guarded, axis=0)
    ijk = jnp.floor(xyz * inv).astype(jnp.int32)
    min_b = jnp.floor(mins * inv).astype(jnp.int32)
    maxs = jnp.max(jnp.where(mask[:, None], xyz, -big), axis=0)
    max_b = jnp.floor(maxs * inv).astype(jnp.int32)
    div = max_b - min_b + 1
    # int32-overflow guard: pcl::VoxelGrid bails out when dx*dy*dz exceeds
    # INT32_MAX; here extents clamp instead (stray far returns land in
    # boundary voxels rather than aliasing unrelated cells).  The clamp is
    # shape-aware: x/y cap at 4096 cells each, and z gets whatever of the
    # 2³⁰-key budget remains — so e.g. a 100×100×60 m cloud at leaf 0.2
    # (500×500×300 cells) is EXACT, and the divergence only bites where
    # PCL itself is near its own int32 bail-out (documented).
    dxy_cap = jnp.int32(4096)
    dx = jnp.minimum(div[0], dxy_cap)
    dy = jnp.minimum(div[1], dxy_cap)
    dz = jnp.minimum(div[2], jnp.maximum(jnp.int32(1 << 30) // (dx * dy), 1))
    div = jnp.stack([dx, dy, dz])
    rel = jnp.clip(ijk - min_b, 0, div - 1)
    key = rel[:, 0] + rel[:, 1] * div[0] + rel[:, 2] * div[0] * div[1]
    sentinel = div[0] * div[1] * div[2]
    key = jnp.where(mask, key, sentinel)

    # payload-carrying stable sort (x/y/z ride the sort; gathers through an
    # argsort permutation cost ~8 ns/index on v5e, extra sort operands don't)
    key_s, x_s, y_s, z_s, m_s = jax.lax.sort(
        [key, xyz[:, 0], xyz[:, 1], xyz[:, 2], mask.astype(jnp.int32)],
        num_keys=1,
        is_stable=True,
    )
    xyz_s = jnp.stack([x_s, y_s, z_s], axis=1)
    mask_s = m_s.astype(bool)

    head = jnp.concatenate(
        [jnp.ones((1,), bool), key_s[1:] != key_s[:-1]]
    ) & mask_s
    seg = jnp.cumsum(head.astype(jnp.int32)) - 1  # segment id per sorted point
    seg = jnp.where(mask_s, seg, n - 1)  # park padding in the last slot

    # ONE fused (n, 4) scatter for (x, y, z, count): scatter cost on v5e is
    # per update *index*, so packing the count column in is nearly free while
    # a second scatter over the same indices costs another full pass
    updates = jnp.concatenate(
        [
            jnp.where(mask_s[:, None], xyz_s, 0.0),
            mask_s.astype(jnp.float32)[:, None],
        ],
        axis=1,
    )
    acc = jnp.zeros((n, 4), jnp.float32).at[seg].add(updates)
    ssum = acc[:, :3]
    scount = acc[:, 3]
    nvox = jnp.sum(head.astype(jnp.int32))
    valid = jnp.arange(n) < nvox
    centroids = jnp.where(
        valid[:, None], ssum / jnp.maximum(scount, 1.0)[:, None], 0.0
    )
    return centroids, valid, nvox
