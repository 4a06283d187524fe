"""Coverage for pca_test op and the Eigen eulerAngles emulation."""

import numpy as np

from pctpu.cloud import make_cloud
from pctpu.geom.se3 import eigen_euler_angles_xyz, quat_to_matrix
from pctpu.ops.pca import pca_test


def _rx(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])


def _ry(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def _rz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def test_eigen_euler_xyz_reconstruction_and_range():
    rng = np.random.default_rng(0)
    for _ in range(300):
        q = rng.standard_normal(4)
        q /= np.linalg.norm(q)
        r = quat_to_matrix(q)
        e = eigen_euler_angles_xyz(r)
        np.testing.assert_allclose(_rx(e[0]) @ _ry(e[1]) @ _rz(e[2]), r, atol=1e-12)
        assert -1e-12 <= e[0] <= np.pi + 1e-12  # Eigen's documented [0, pi]


def test_pca_test_matches_reference_semantics():
    rng = np.random.default_rng(1)
    # anisotropic cluster; the filter keeps z>=0, range<=30, label>0
    n = 500
    xyz = np.stack(
        [rng.normal(0, 8, n), rng.normal(0, 2, n), rng.uniform(0, 3, n)], axis=1
    ).astype(np.float32)
    label = np.ones(n, np.int32)
    # poison points that must be filtered out
    xyz[0] = [100.0, 0, 1]      # range > 30
    xyz[1] = [0, 0, -5.0]       # z < 0
    label[2] = 0                # ground
    label[3] = -2               # unsegmented
    cloud = make_cloud(xyz, label=label)
    mu, vals, vecs, kept = pca_test(cloud)
    assert int(kept) == n - 4
    # flattened to z=0 → smallest eigenvalue ~0, largest along x
    vals = np.asarray(vals)
    assert vals[0] < 1e-5
    assert vals[2] > vals[1] > vals[0]
    principal = np.abs(np.asarray(vecs)[:, 2])
    assert principal[0] > 0.9  # x-dominant

    # reference math: normalized covariance of the filtered flattened cloud
    keep = (xyz[:, 2] >= 0) & (np.sqrt(xyz[:, 0] ** 2 + xyz[:, 1] ** 2) <= 30) & (label > 0)
    flat = xyz[keep].copy()
    flat[:, 2] = 0
    mu_ref = flat.mean(axis=0)
    d = flat - mu_ref
    cov_ref = (d.T @ d) / len(flat)
    np.testing.assert_allclose(np.asarray(mu), mu_ref, atol=1e-4)
    np.testing.assert_allclose(np.sort(vals), np.sort(np.linalg.eigvalsh(cov_ref)), rtol=1e-3, atol=1e-4)


def test_pca_filter_keeps_nan_points_like_reference():
    """main.cpp:66 skips on (z < 0 || range > 30): NaN coordinates fail both
    comparisons, so the C++ KEEPS such points; the filter must match."""
    import numpy as np

    from pctpu.cloud import make_cloud
    from pctpu.ops.pca import pca_test_filter

    xyz = np.array([[1.0, 1.0, np.nan], [np.nan, 1.0, 2.0],
                    [1.0, 1.0, 1.0], [-1.0, 1.0, -0.5], [40.0, 0.0, 1.0]],
                   np.float32)
    c = make_cloud(xyz, label=np.ones(5, np.int32))
    _, keep = pca_test_filter(c)
    keep = np.asarray(keep)
    assert keep[0] and keep[1] and keep[2]   # NaN z / NaN range kept
    assert not keep[3] and not keep[4]        # z<0 / range>30 rejected
