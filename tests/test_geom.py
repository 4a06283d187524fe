import numpy as np
import pytest

from pctpu.geom import (
    Pose6f,
    euler_zyx_to_matrix,
    interpolate_pose,
    is_rotation_matrix,
    pose_distance,
    quat_from_matrix,
    quat_slerp,
    quat_to_matrix,
    rotation_matrix_to_euler_angles,
    yaw_rotation_4x4,
)


def random_rotation(rng):
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    return quat_to_matrix(q)


def test_euler_round_trip_zyx():
    rng = np.random.default_rng(0)
    for _ in range(200):
        roll, pitch, yaw = rng.uniform(-np.pi, np.pi, 3)
        pitch = np.clip(pitch, -np.pi / 2 + 0.05, np.pi / 2 - 0.05)
        r = euler_zyx_to_matrix(roll, pitch, yaw)
        e = rotation_matrix_to_euler_angles(r)
        # reference extraction returns (roll, pitch, yaw)
        np.testing.assert_allclose(e, [roll, pitch, yaw], atol=1e-9)


def test_euler_singular_branch():
    # pitch = +90° → sy ≈ 0 → yaw forced to 0 (Utility.cpp:35-39)
    r = euler_zyx_to_matrix(0.3, np.pi / 2, 0.7)
    e = rotation_matrix_to_euler_angles(r)
    assert e[2] == 0.0


def test_is_rotation_matrix():
    assert is_rotation_matrix(np.eye(3))
    assert not is_rotation_matrix(np.eye(3) * 1.01)


def test_quat_matrix_round_trip():
    rng = np.random.default_rng(1)
    for _ in range(100):
        r = random_rotation(rng)
        q = quat_from_matrix(r)
        np.testing.assert_allclose(quat_to_matrix(q), r, atol=1e-12)


def test_slerp_endpoints_and_midpoint():
    rng = np.random.default_rng(2)
    q0 = quat_from_matrix(random_rotation(rng))
    q1 = quat_from_matrix(random_rotation(rng))
    np.testing.assert_allclose(quat_slerp(q0, q1, 0.0), q0, atol=1e-12)
    # endpoint may be ±q1 (same rotation)
    qe = quat_slerp(q0, q1, 1.0)
    assert min(np.linalg.norm(qe - q1), np.linalg.norm(qe + q1)) < 1e-12
    # midpoint is unit norm and equidistant in angle
    qm = quat_slerp(q0, q1, 0.5)
    assert abs(np.linalg.norm(qm) - 1) < 1e-12
    a0 = abs(np.dot(qm, q0))
    a1 = abs(np.dot(qm, q1))
    np.testing.assert_allclose(a0, a1, atol=1e-9)


def test_slerp_shortest_path():
    q0 = np.array([1.0, 0, 0, 0])
    q1 = -quat_from_matrix(euler_zyx_to_matrix(0, 0, 0.2))  # negated: same rotation
    qm = quat_slerp(q0, q1, 0.5)
    r = quat_to_matrix(qm)
    e = rotation_matrix_to_euler_angles(r)
    np.testing.assert_allclose(e[2], 0.1, atol=1e-9)


def test_interpolate_pose_matches_reference_semantics():
    pa = Pose6f.from_matrix(euler_zyx_to_matrix(0, 0, 0.0), np.array([0.0, 0.0, 0.0]))
    pb = Pose6f.from_matrix(euler_zyx_to_matrix(0, 0, 1.0), np.array([2.0, 4.0, 6.0]))
    pm = interpolate_pose(pa, pb, 0.25)
    np.testing.assert_allclose([pm.x, pm.y, pm.z], [0.5, 1.0, 1.5], rtol=1e-6)
    np.testing.assert_allclose(pm.yaw, 0.25, atol=1e-6)
    # ratio 1 returns the end pose exactly
    pe = interpolate_pose(pa, pb, 1.0)
    np.testing.assert_allclose([pe.x, pe.y, pe.z], [2, 4, 6], rtol=1e-6)
    np.testing.assert_allclose(pe.yaw, 1.0, atol=1e-6)


def test_pose_distance():
    pa = Pose6f.from_matrix(np.eye(3), np.array([0.0, 0.0, 0.0]))
    pb = Pose6f.from_matrix(np.eye(3), np.array([3.0, 4.0, 0.0]))
    assert pose_distance(pa, pb) == pytest.approx(5.0)


def test_yaw_rotation_4x4():
    t = yaw_rotation_4x4(np.pi / 2)
    p = t @ np.array([1.0, 0, 0, 1])
    np.testing.assert_allclose(p[:3], [0, 1, 0], atol=1e-12)


def test_interpolate_position_double_promotion():
    """Utility.h:55-57: x is a float but ratio is a double, so the position
    mix runs in f64 with ONE final rounding — an all-f32 mix diverges on
    ~44% of random inputs (measured), enough to flip keyframes at the
    distance gate."""
    rng = np.random.default_rng(0)
    mismatch_f32 = 0
    for _ in range(500):
        xa = np.float32(rng.uniform(-500, 500))
        xb = np.float32(rng.uniform(-500, 500))
        ratio = float(rng.uniform(0.001, 0.999))
        a = Pose6f.from_matrix(np.eye(3), np.array([xa, 0, 0], np.float64))
        b = Pose6f.from_matrix(np.eye(3), np.array([xb, 0, 0], np.float64))
        out = interpolate_pose(a, b, ratio)
        expect = np.float32(np.float64(xa) * (1.0 - ratio) + np.float64(xb) * ratio)
        assert out.x == expect, (xa, xb, ratio)
        f32_mix = np.float32(xa * np.float32(1.0 - np.float32(ratio))
                             + xb * np.float32(ratio))
        if f32_mix != expect:
            mismatch_f32 += 1
    # the all-f32 formulation really does diverge often (sanity of the claim)
    assert mismatch_f32 > 50


def test_quat_helpers_do_not_renormalize():
    """Eigen's Quaterniond(Matrix3d) and slerp keep the raw result; for a
    CSV-roundtripped (only ~1e-6-orthonormal) matrix an extra normalize
    shifts components by several f32 ulps."""
    r = euler_zyx_to_matrix(0.3, -0.2, 1.1)
    r_csv = np.array([[float(f"{v:.6f}") for v in row] for row in r])
    q = quat_from_matrix(r_csv)
    # not forcibly unit: norm retains the matrix's orthonormality error
    assert abs(float(np.linalg.norm(q)) - 1.0) > 0  # bitwise-exact 1.0 would
    # indicate renormalization kicked in
    q2 = quat_slerp(q, quat_from_matrix(r), 0.37)
    assert abs(float(np.linalg.norm(q2)) - 1.0) < 1e-5  # near-unit, not exact


def test_eigen_euler_angles_zyx_matches_eigen_branches():
    """eulerAngles(2,1,0) emulation: principal recovery for yaw >= 0,
    alternate triple (first angle wrapped into [0, pi]) for yaw < 0, exact
    reconstruction either way (OxfordPointCloudSelect.cpp:84-99)."""
    from pctpu.geom.se3 import eigen_euler_angles_zyx, euler_zyx_to_matrix

    rng = np.random.default_rng(7)
    for _ in range(200):
        roll, yaw = rng.uniform(-np.pi, np.pi, 2)
        pitch = rng.uniform(-np.pi / 2 + 0.01, np.pi / 2 - 0.01)
        r = euler_zyx_to_matrix(roll, pitch, yaw)
        e = eigen_euler_angles_zyx(r)
        assert 0.0 <= e[0] <= np.pi + 1e-12
        np.testing.assert_allclose(
            euler_zyx_to_matrix(e[2], e[1], e[0]), r, atol=1e-12
        )
        if yaw >= 0:
            np.testing.assert_allclose(e, [yaw, pitch, roll], atol=1e-9)
        else:
            np.testing.assert_allclose(e[0], yaw + np.pi, atol=1e-9)


def test_interpolate_pose_euler_modes():
    """euler='eigen_zyx' (Oxford local Pose6f) vs the Utility.h extraction:
    same position/rotation, different euler triple when yaw < 0."""
    from pctpu.geom.se3 import (
        Pose6f,
        euler_zyx_to_matrix,
        interpolate_pose,
        quat_from_matrix,
    )

    def mk(yaw):
        r = euler_zyx_to_matrix(0.05, -0.1, yaw)
        return Pose6f(x=np.float32(1.0), y=np.float32(2.0), z=np.float32(3.0),
                      roll=np.float32(0.05), pitch=np.float32(-0.1),
                      yaw=np.float32(yaw), rotation_matrix=r,
                      rotation_quat=quat_from_matrix(r))

    a, b = mk(-0.9), mk(-0.7)
    pu = interpolate_pose(a, b, 0.5)
    pe = interpolate_pose(a, b, 0.5, euler="eigen_zyx")
    assert (pu.x, pu.y, pu.z) == (pe.x, pe.y, pe.z)
    np.testing.assert_array_equal(pu.rotation_matrix, pe.rotation_matrix)
    assert pu.yaw == pytest.approx(-0.8, abs=1e-3)        # custom extraction
    assert pe.yaw == pytest.approx(-0.8 + np.pi, abs=1e-3)  # Eigen branch
    assert pu.yaw != pe.yaw and pu.roll != pe.roll
    with pytest.raises(ValueError):
        interpolate_pose(a, b, 0.5, euler="bogus")
