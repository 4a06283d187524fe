"""3-D PCA over a filtered cloud (pointcloud_pca_test).

Reproduces /root/reference/main.cpp:60-87: filter (z >= 0, planar range <= 30,
label > 0), flatten z=0, centroid + normalized covariance +
SelfAdjointEigenSolver (eigenvalues ascending, like Eigen/jnp.linalg.eigh).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pctpu.cloud import Cloud


@jax.jit
def pca_test_filter(cloud: Cloud) -> tuple[jnp.ndarray, jnp.ndarray]:
    """The demo's filter (/root/reference/main.cpp:60-74): skip points with
    z < 0 or sqrt(x²+y²) > 30 or label <= 0; flattened to z = 0.

    Expressed as the NEGATED reject condition (not ``z >= 0 & rng <= 30``):
    for NaN coordinates both reference comparisons are false, so the C++
    keeps the point — the equivalent-looking keep-form would drop it."""
    rng = jnp.sqrt(cloud.x**2 + cloud.y**2)
    keep = (
        ~((cloud.z < 0.0) | (rng > 30.0))
        & (cloud.label > 0)
        & cloud.valid_mask()
    )
    xyz = jnp.where(keep[:, None], cloud.xyz, 0.0).at[:, 2].set(0.0)
    return xyz, keep


@jax.jit
def pca3d(xyz: jnp.ndarray, mask: jnp.ndarray):
    """Returns (centroid (3,), eigenvalues ascending (3,), eigenvectors (3,3)
    column-major like Eigen)."""
    w = mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mu = jnp.sum(xyz * w[:, None], axis=0) / n
    d = (xyz - mu) * w[:, None]
    # computeCovarianceMatrixNormalized divides by N; full f32 accumulation
    cov = jnp.matmul(d.T, d, precision=jax.lax.Precision.HIGHEST) / n
    vals, vecs = jnp.linalg.eigh(cov)
    return mu, vals, vecs


@jax.jit
def pca_test(cloud: Cloud):
    xyz, keep = pca_test_filter(cloud)
    mu, vals, vecs = pca3d(xyz, keep)
    return mu, vals, vecs, jnp.sum(keep.astype(jnp.int32))
