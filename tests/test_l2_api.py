"""L2 public-library API parity: setKSearch-mode 2-D normals and
PCA2D project/setIndices (VERDICT r1 missing item 2), oracle-tested."""

import numpy as np
import pytest

from pctpu.ops.normals2d import Normal2dEstimation, normals_2d, normals_2d_knn
from pctpu.ops.pca2d import PCA2D

from . import ref_impl


def cloud(seed, n=120):
    rng = np.random.default_rng(seed)
    # anisotropic cluster + line to give distinct eigenpairs
    a = rng.normal(0, [3.0, 0.5], (n // 2, 2))
    t = rng.uniform(-4, 4, n - n // 2)
    b = np.stack([t, 0.5 * t + rng.normal(0, 0.1, len(t))], 1)
    p2 = np.concatenate([a, b]).astype(np.float32)
    return np.concatenate([p2, np.zeros((n, 1), np.float32)], axis=1)


@pytest.mark.parametrize("seed,k", [(0, 5), (1, 9), (2, 2), (3, 30)])
def test_knn_normals_match_oracle(seed, k):
    xyz = cloud(seed)
    mask = np.ones(len(xyz), bool)
    nrm, curv, ok = normals_2d_knn(xyz, mask, k)
    ref_n, ref_ok = ref_impl.normals2d_knn_ref(xyz, k)
    np.testing.assert_array_equal(np.asarray(ok), ref_ok)
    ours = np.asarray(nrm)[:, :2]
    # normals match up to the eigen-solver's inherent sign for exact-ties;
    # the viewpoint flip fixes the sign except when the normal is exactly
    # perpendicular to the viewpoint ray
    for i in np.flatnonzero(ref_ok):
        d = min(np.linalg.norm(ours[i] - ref_n[i]), np.linalg.norm(ours[i] + ref_n[i]))
        assert d < 5e-3, (i, ours[i], ref_n[i])


def test_knn_k1_invalid():
    xyz = cloud(4)
    mask = np.ones(len(xyz), bool)
    _, _, ok = normals_2d_knn(xyz, mask, 1)
    assert not np.asarray(ok).any()


def test_facade_radius_equals_function():
    xyz = cloud(5)
    est = Normal2dEstimation()
    est.set_input_cloud(xyz)
    est.set_radius_search(2.0)
    n1, c1, ok1 = est.compute()
    n2, c2, ok2 = normals_2d(xyz, np.ones(len(xyz), bool), radius=2.0)
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))


def test_facade_exclusive_modes():
    est = Normal2dEstimation()
    est.set_input_cloud(cloud(6))
    with pytest.raises(RuntimeError):
        est.compute()  # neither set
    est.set_radius_search(2.0)
    est.set_k_search(5)
    with pytest.raises(RuntimeError):
        est.compute()  # both set


def test_facade_indices_restrict_tree_and_queries():
    """With setIndices, both queries and the kd-tree restrict to the subset
    (Normal2dEstimation.cpp:126)."""
    xyz = cloud(7)
    idx = np.arange(0, len(xyz), 2)
    est = Normal2dEstimation()
    est.set_input_cloud(xyz)
    est.set_indices(idx)
    est.set_k_search(5)
    n_sub, _, ok_sub = est.compute()
    # equals computing on the compacted subset cloud
    n_direct, _, ok_direct = normals_2d_knn(xyz[idx], np.ones(len(idx), bool), 5)
    np.testing.assert_array_equal(np.asarray(n_sub)[: len(idx)], np.asarray(n_direct))
    assert not np.asarray(n_sub)[len(idx):].any()  # tail stays zero


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("use_indices", [False, True])
def test_pca2d_fit_matches_oracle(seed, use_indices):
    xyz = cloud(seed + 20)
    rng = np.random.default_rng(seed)
    indices = np.sort(rng.choice(len(xyz), 60, replace=False)) if use_indices else None
    ref_mean, ref_w, ref_v = ref_impl.pca2d_ref(xyz, indices)

    pca = PCA2D()
    pca.set_input_cloud(xyz)
    pca.set_indices(indices)
    np.testing.assert_allclose(np.asarray(pca.get_mean()), ref_mean, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pca.get_eigen_values()), ref_w,
                               rtol=1e-4, atol=1e-3)
    v = np.asarray(pca.get_eigen_vectors())
    for col in range(2):
        d = min(np.linalg.norm(v[:, col] - ref_v[:, col]),
                np.linalg.norm(v[:, col] + ref_v[:, col]))
        assert d < 1e-3


def test_pca2d_project_roundtrip():
    xyz = cloud(30)
    pca = PCA2D()
    pca.set_input_cloud(xyz)
    proj = np.asarray(pca.project(xyz))
    assert proj.shape == (len(xyz), 3)
    assert np.all(proj[:, 2] == 0.0)
    # projection = eigvecs^T (p - mean): reconstruct and compare
    v = np.asarray(pca.get_eigen_vectors())
    mean = np.asarray(pca.get_mean())
    rec = proj[:, :2] @ v.T + mean
    np.testing.assert_allclose(rec, xyz[:, :2], atol=1e-4)
    # projected cloud is centred and decorrelated
    assert abs(proj[:, 0].mean()) < 1e-4 and abs(proj[:, 1].mean()) < 1e-4
    cov = np.cov(proj[:, 0], proj[:, 1])
    assert abs(cov[0, 1]) < 1e-2 * cov[0, 0]


def test_pca2d_requires_cloud():
    with pytest.raises(RuntimeError):
        PCA2D().get_mean()


def test_knn_k_exceeds_cloud_size():
    """nearestKSearch clamps k to n (PCL behavior); must not crash."""
    xyz = cloud(8, n=6)
    mask = np.ones(len(xyz), bool)
    nrm, _, ok = normals_2d_knn(xyz, mask, 50)
    ref_n, ref_ok = ref_impl.normals2d_knn_ref(xyz, 50)
    np.testing.assert_array_equal(np.asarray(ok), ref_ok)
    ours = np.asarray(nrm)[:, :2]
    for i in np.flatnonzero(ref_ok):
        d = min(np.linalg.norm(ours[i] - ref_n[i]), np.linalg.norm(ours[i] + ref_n[i]))
        assert d < 5e-3


def test_coincident_pair_excluded_like_nan():
    """Two coincident points (2-neighborhood, zero segment): the reference
    divides by norm=0 and emits NaN normals (Normal2dEstimation.cpp:236-241);
    pctpu's documented NaN policy is exclusion -> ok=False in both modes."""
    import numpy as np

    from pctpu.ops.normals2d import normals_2d, normals_2d_knn

    xyz = np.array([[1.0, 1.0, 0.0], [1.0, 1.0, 0.0], [50.0, 50.0, 0.0]],
                   np.float32)
    mask = np.ones(3, bool)
    _, _, ok_r = normals_2d(xyz, mask, radius=2.0)
    assert not bool(np.asarray(ok_r)[0]) and not bool(np.asarray(ok_r)[1])
    _, _, ok_k = normals_2d_knn(xyz, mask, k=2)
    assert not bool(np.asarray(ok_k)[0]) and not bool(np.asarray(ok_k)[1])
    # the far point with k=2 pairs with a distinct neighbor -> still valid
    assert bool(np.asarray(ok_k)[2])


def test_campaign_seed_800381_isotropic_neighborhood_window():
    """Fuzz campaign seed 800381 (k=5, point 151): a near-isotropic
    neighborhood (eigengap ratio 0.69) amplifies the op's uncentered-moment
    f32 cancellation (~1e-5 on scatter entries, ops/normals2d.py docstring)
    into a ~0.007 rad normal rotation — past a flat 5e-3 tolerance but
    inside the conditioning-aware window r²·cnt·2⁻²³/(λ₁−λ₀).  The normal
    direction of such a patch is ill-defined in both stacks."""
    rng = np.random.default_rng(800381)
    n = int(rng.integers(20, 200))
    a = rng.normal(0, [rng.uniform(0.5, 4.0), rng.uniform(0.1, 1.0)],
                   (n // 2, 2))
    t = rng.uniform(-5, 5, n - n // 2)
    b = np.stack([t, rng.uniform(-1, 1) * t + rng.normal(0, 0.1, len(t))], 1)
    p2 = np.concatenate([a, b]).astype(np.float32)
    xyz = np.concatenate([p2, np.zeros((n, 1), np.float32)], axis=1)
    k, i = 5, 151

    nrm, _, ok = normals_2d_knn(xyz, np.ones(n, bool), k)
    ref_n, ref_ok = ref_impl.normals2d_knn_ref(xyz, k)
    assert bool(np.asarray(ok)[i]) and bool(ref_ok[i])
    ours = np.asarray(nrm)[i, :2]
    d = min(np.linalg.norm(ours - ref_n[i]), np.linalg.norm(ours + ref_n[i]))

    d2 = np.sum((p2.astype(np.float64) - p2[i].astype(np.float64)) ** 2, 1)
    sel = p2[np.argsort(d2, kind="stable")[:k]].astype(np.float64)
    w = np.linalg.eigvalsh((sel - sel.mean(0)).T @ (sel - sel.mean(0)))
    assert w[0] / w[1] > 0.5, "the neighborhood became well-conditioned"
    bbox_c = 0.5 * (p2.min(axis=0) + p2.max(axis=0))
    r_sq = float(np.max(np.sum((p2 - bbox_c) ** 2, axis=1)))
    window = 4.0 * r_sq * k * 2.0**-23 / max(float(w[1] - w[0]), 1e-12)
    # d measured ~0.007 when pinned; only the upper bound is load-bearing
    # (a more accurate future op may shrink d below 5e-3, which is fine)
    assert d < max(5e-3, window), (d, window)
