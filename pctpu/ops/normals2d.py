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

from pctpu.ops.eig2 import eig2_sym_values, eig2_sym_vector


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
        lam_max, lam_min = eig2_sym_values(sxx, sxy, syy)
        v = eig2_sym_vector(sxx, sxy, syy, lam_min)  # minor eigvec = normal
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
        # coincident 2-point neighborhoods: the reference divides by norm=0
        # and emits a NaN normal (Normal2dEstimation.cpp:236-241); pctpu's
        # documented NaN-normal policy is exclusion, so mark them invalid.
        # Coincidence tests exact COORDINATE equality (not seg_n == 0): it
        # is then invariant to which of several distance-tied neighbors the
        # argmin picked, so plain and GSPMD-sharded compilations agree.
        coincident = jnp.all(p2[other_idx] == qt, axis=1)
        ok = qm & (count_i >= 2) & ~((count_i == 2) & coincident)

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


@functools.partial(jax.jit, static_argnames=("k", "tile"))
def normals_2d_knn(
    xyz: jnp.ndarray,
    mask: jnp.ndarray,
    k: int,
    viewpoint: tuple[float, float] = (0.0, 0.0),
    tile: int = 512,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """setKSearch mode: the neighborhood is the k nearest points (self
    included, like pcl::search::KdTree::nearestKSearch —
    /root/reference/src/Normal2dEstimation.cpp:29-38, :106-190).

    Returns (normals (N,3) z=0, curvature (N,), valid (N,)); valid is False
    for padding and for neighborhoods of < 2 points (k < 2 or fewer valid
    points than 2 in the cloud — NaN in the reference).  Like
    nearestKSearch, k clamps to the cloud size when it exceeds it.
    """
    n = xyz.shape[0]
    k = min(k, n)
    p2 = xyz[:, :2]
    vx, vy = viewpoint
    x = p2[:, 0]
    y = p2[:, 1]
    moments = jnp.stack([x, y, x * x, x * y, y * y, jnp.ones_like(x)], axis=1)
    moments = jnp.where(mask[:, None], moments, 0.0)
    t_sq = jnp.sum(p2 * p2, axis=1)
    t_sq_masked = jnp.where(mask, t_sq, jnp.inf)

    rem = (-n) % tile
    p2_pad = jnp.pad(p2, ((0, rem), (0, 0)))
    mask_pad = jnp.pad(mask, (0, rem))
    prec = jax.lax.Precision.HIGHEST

    def one_tile(args):
        qt, qm = args
        d = (
            jnp.sum(qt * qt, axis=1, keepdims=True)
            - 2.0 * jnp.matmul(qt, p2.T, precision=prec)
            + t_sq_masked[None, :]
        )
        neg_d, idx = jax.lax.top_k(-d, k)  # ascending distance order
        picked = jnp.isfinite(neg_d) & qm[:, None]  # drop masked fill-ins
        count_i = jnp.sum(picked, axis=1)

        sums = jnp.sum(
            jnp.where(picked[:, :, None], moments[idx], 0.0), axis=1
        )  # (tile, 6)
        cnt = jnp.maximum(sums[:, 5], 1.0)
        mx = sums[:, 0] / cnt
        my = sums[:, 1] / cnt
        sxx = sums[:, 2] - cnt * mx * mx
        sxy = sums[:, 3] - cnt * mx * my
        syy = sums[:, 4] - cnt * my * my

        lam_max, lam_min = eig2_sym_values(sxx, sxy, syy)
        v = eig2_sym_vector(sxx, sxy, syy, lam_min)
        curv = lam_min / jnp.maximum(lam_max + lam_min, 1e-30)

        # 2-neighbor special case: nearestKSearch order is ascending, so
        # idx[:, 0] is self and idx[:, 1] the other point
        seg = qt - p2[idx[:, 1]]
        seg_n = jnp.linalg.norm(seg, axis=1, keepdims=True)
        seg = seg / jnp.maximum(seg_n, 1e-30)
        pair_normal = jnp.stack([-seg[:, 1], seg[:, 0]], axis=1)

        normal = jnp.where((count_i == 2)[:, None], pair_normal, v)
        curv = jnp.where(count_i == 2, 0.0, curv)
        # coincident duplicate pair → NaN in the reference → excluded here
        # (same policy and same exact-coordinate test as the radius path)
        coincident = jnp.all(p2[idx[:, 1]] == qt, axis=1)
        ok = qm & (count_i >= 2) & ~((count_i == 2) & coincident)

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


class Normal2dEstimation:
    """API-parity facade over the vectorized kernels, mirroring the installed
    pcl_norm_2d library interface (/root/reference/include/Normal2dEstimation.h:
    48-130): set_input_cloud / set_indices / set_radius_search / set_k_search
    / set_view_point / compute.

    Like the reference, exactly one of radius or k must be set
    (Normal2dEstimation.cpp:117-124), and with indices both the query set AND
    the search tree restrict to the subset (the kd-tree is built on
    ``(m_in_cloud, m_indices)``, :126).  compute() returns
    (normals (N,3), curvature (N,), valid (N,)) where entry i corresponds to
    indices[i] (the reference writes normal_cloud->points[idx] for idx over
    the indices vector); entries past len(indices) are zero.
    """

    def __init__(self) -> None:
        self._xyz = None
        self._indices = None
        self._radius = 0.0
        self._k = 0
        self._viewpoint = (0.0, 0.0)

    def set_input_cloud(self, xyz) -> None:
        self._xyz = jnp.asarray(xyz, jnp.float32)

    def set_indices(self, indices) -> None:
        self._indices = None if indices is None else jnp.asarray(indices, jnp.int32)

    def set_radius_search(self, radius: float) -> None:
        self._radius = float(radius)

    def set_k_search(self, k: int) -> None:
        self._k = int(k)

    def set_view_point(self, vx: float, vy: float) -> None:
        self._viewpoint = (float(vx), float(vy))

    def compute(self):
        if self._xyz is None:
            raise RuntimeError("You have to set a cloud before ask any result !")
        if self._k == 0 and self._radius == 0.0:
            raise RuntimeError(
                "You must call once either setRadiusSearch or setKSearch !"
            )
        if self._k != 0 and self._radius != 0.0:
            raise RuntimeError(
                "You must call once either setRadiusSearch or setKSearch (not both) !"
            )
        xyz = self._xyz
        n = xyz.shape[0]
        if self._indices is not None:
            sub = xyz[self._indices]
            m = jnp.ones((sub.shape[0],), bool)
        else:
            sub = xyz
            m = jnp.ones((n,), bool)
        if self._k:
            nrm, curv, ok = normals_2d_knn(sub, m, self._k, self._viewpoint)
        else:
            nrm, curv, ok = normals_2d(sub, m, self._radius, self._viewpoint)
        if self._indices is not None:
            out_n = jnp.zeros((n, 3), jnp.float32).at[: sub.shape[0]].set(nrm)
            out_c = jnp.zeros((n,), jnp.float32).at[: sub.shape[0]].set(curv)
            out_ok = jnp.zeros((n,), bool).at[: sub.shape[0]].set(ok)
            return out_n, out_c, out_ok
        return nrm, curv, ok
