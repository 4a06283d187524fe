"""Batched 2-D normal estimation: radius neighborhoods + closed-form 2×2 PCA.

Reproduces Normal2dEstimation + PCA2D
(/root/reference/src/Normal2dEstimation.cpp:106-190,228-263,
/root/reference/src/PCA2D.cpp:8-42) for z=0 clouds:

  * neighbors = radius search (includes the point itself);
  * < 2 neighbors → NaN normal (the reference's computePointNormal2d NaN
    branch, Normal2dEstimation.cpp:230-233);
  * exactly 2 → perpendicular of the segment (self − other), :235-247;
  * ≥ 3 → minor eigenvector of the unnormalized 2×2 scatter of the demeaned
    neighborhood (PCA2D.cpp:28-37), curvature = λ_min/(λ_0+λ_1);
  * flip toward the viewpoint (origin), :305-318.

TPU design: the per-point kd-tree radius query + Eigen solve becomes tiled
mask matmuls: per query tile, a (tile, P) radius mask contracts against the
(P, 6) moment matrix [x, y, x², xy, y², 1] on the MXU, and the 2×2
eigenproblem is solved in closed form — no loops, no trees.

Note on curvature: the reference's pcl::Normal overload computes "curvature"
from eigen*vector* matrix entries (Normal2dEstimation.cpp:261) — an apparent
bug; the value is never consumed downstream (ICP point-to-plane uses only
normals), so we store the eigenvalue ratio λ₁/(λ₀+λ₁) instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("tile",))
def normals_2d(
    xyz: jnp.ndarray,
    mask: jnp.ndarray,
    radius: float = 2.0,
    viewpoint: tuple[float, float] = (0.0, 0.0),
    tile: int = 512,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (normals (N,3) float32 with z=0, curvature (N,), valid (N,)).

    valid is False for padding and for <2-neighbor points (NaN in the
    reference); their normal is (0,0,0) here so downstream masking is clean.
    """
    n = xyz.shape[0]
    p2 = xyz[:, :2]
    r2 = jnp.float32(radius * radius)
    vx, vy = viewpoint

    # per-point moments for neighborhood sums: [x, y, x², x·y, y², 1]
    x = p2[:, 0]
    y = p2[:, 1]
    moments = jnp.stack(
        [x, y, x * x, x * y, y * y, jnp.ones_like(x)], axis=1
    )
    moments = jnp.where(mask[:, None], moments, 0.0)
    t_sq = jnp.sum(p2 * p2, axis=1)
    t_sq_masked = jnp.where(mask, t_sq, jnp.inf)

    rem = (-n) % tile
    p2_pad = jnp.pad(p2, ((0, rem), (0, 0)))
    mask_pad = jnp.pad(mask, (0, rem))

    prec = jax.lax.Precision.HIGHEST  # full f32 accumulation (see ops/knn.py)

    def one_tile(args):
        qt, qm = args  # (tile, 2), (tile,)
        d = (
            jnp.sum(qt * qt, axis=1, keepdims=True)
            - 2.0 * jnp.matmul(qt, p2.T, precision=prec)
            + t_sq_masked[None, :]
        )
        nbr = (d <= r2) & qm[:, None]  # (tile, P)
        nbr_f = nbr.astype(jnp.float32)
        sums = jnp.matmul(nbr_f, moments, precision=prec)  # (tile, 6) on the MXU
        cnt = sums[:, 5]
        mx = sums[:, 0] / cnt
        my = sums[:, 1] / cnt
        # unnormalized scatter of demeaned points: S = Σpᵢpᵢᵀ − c·μμᵀ
        sxx = sums[:, 2] - cnt * mx * mx
        sxy = sums[:, 3] - cnt * mx * my
        syy = sums[:, 4] - cnt * my * my

        # closed-form symmetric 2×2 eigenpairs
        tr = sxx + syy
        det_h = jnp.sqrt(jnp.maximum((sxx - syy) ** 2 + 4.0 * sxy * sxy, 0.0))
        lam_min = 0.5 * (tr - det_h)
        lam_max = 0.5 * (tr + det_h)
        # minor eigenvector: (S - λ_max I) v = 0 → v ⟂ major; pick the
        # numerically better of the two row formulations
        v1 = jnp.stack([sxy, lam_min - sxx], axis=1)
        v2 = jnp.stack([lam_min - syy, sxy], axis=1)
        use1 = jnp.abs(v1).sum(axis=1) >= jnp.abs(v2).sum(axis=1)
        v = jnp.where(use1[:, None], v1, v2)
        norm = jnp.linalg.norm(v, axis=1, keepdims=True)
        # degenerate isotropic neighborhoods: fall back to +x normal
        v = jnp.where(norm > 0, v / jnp.maximum(norm, 1e-30), jnp.array([1.0, 0.0]))
        curv = lam_min / jnp.maximum(lam_max + lam_min, 1e-30)

        # 2-neighbor special case: perpendicular of (self − other)
        masked_d = jnp.where(nbr, d, jnp.inf)
        # the other point = nearest neighbor excluding self (distance > 0 or
        # different index); kd-tree order is by distance so indices[1] is the
        # second-closest, i.e. argmin after masking self out
        self_idx = jnp.argmin(masked_d, axis=1)
        d_no_self = masked_d.at[jnp.arange(masked_d.shape[0]), self_idx].set(jnp.inf)
        other_idx = jnp.argmin(d_no_self, axis=1)
        seg = qt - p2[other_idx]
        seg_n = jnp.linalg.norm(seg, axis=1, keepdims=True)
        seg = seg / jnp.maximum(seg_n, 1e-30)
        pair_normal = jnp.stack([-seg[:, 1], seg[:, 0]], axis=1)

        count_i = jnp.sum(nbr, axis=1)
        normal = jnp.where((count_i == 2)[:, None], pair_normal, v)
        curv = jnp.where(count_i == 2, 0.0, curv)
        ok = qm & (count_i >= 2)

        # flip toward viewpoint (origin by default)
        vp = jnp.stack([vx - qt[:, 0], vy - qt[:, 1]], axis=1)
        cos_t = jnp.sum(vp * normal, axis=1)
        normal = jnp.where((cos_t < 0)[:, None], -normal, normal)
        normal = jnp.where(ok[:, None], normal, 0.0)
        return normal, curv, ok

    tiles = (p2_pad.reshape(-1, tile, 2), mask_pad.reshape(-1, tile))
    normal, curv, ok = jax.lax.map(one_tile, tiles)
    normal = normal.reshape(-1, 2)[:n]
    normals3 = jnp.concatenate([normal, jnp.zeros((n, 1), jnp.float32)], axis=1)
    return normals3, curv.reshape(-1)[:n], ok.reshape(-1)[:n]
