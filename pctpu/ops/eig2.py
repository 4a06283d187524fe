"""Closed-form symmetric 2×2 eigensolver shared by the 2-D PCA/normal ops.

One implementation of the trace/discriminant eigenvalues and the
row-nullspace eigenvector trick (pick the numerically larger of the two
(S − λI) row formulations, normalize, fall back to +x for degenerate
isotropic scatters) — used by ``ops/normals2d.py`` (minor eigenvector =
2-D normal) and ``ops/pca2d.py`` (descending eigenbasis), matching Eigen's
SelfAdjointEigenSolver up to the inherent sign ambiguity
(/root/reference/src/PCA2D.cpp:28-40).
"""

from __future__ import annotations

import jax.numpy as jnp


def eig2_sym_values(sxx, sxy, syy):
    """(λ_max, λ_min) of [[sxx, sxy], [sxy, syy]]; elementwise over any
    broadcastable shapes."""
    tr = sxx + syy
    det_h = jnp.sqrt(jnp.maximum((sxx - syy) ** 2 + 4.0 * sxy * sxy, 0.0))
    return 0.5 * (tr + det_h), 0.5 * (tr - det_h)


def eig2_sym_vector(sxx, sxy, syy, lam):
    """Unit eigenvector for eigenvalue ``lam``, stacked on the last axis.

    v ⟂ the rows of (S − λI): v₁ = (sxy, λ − sxx), v₂ = (λ − syy, sxy);
    the larger by |·|₁ wins numerically; a zero vector (isotropic
    neighborhood) falls back to +x.
    """
    v1 = jnp.stack([sxy, lam - sxx], axis=-1)
    v2 = jnp.stack([lam - syy, sxy], axis=-1)
    use1 = jnp.abs(v1).sum(axis=-1) >= jnp.abs(v2).sum(axis=-1)
    v = jnp.where(use1[..., None], v1, v2)
    norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    # guard threshold matches the clamp: 0 < norm < 1e-30 would divide by
    # the clamped 1e-30 and return a far-from-unit vector instead of the
    # +x fallback
    return jnp.where(norm >= 1e-30, v / jnp.maximum(norm, 1e-30), jnp.array([1.0, 0.0]))
