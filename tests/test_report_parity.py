"""f32/f64 parity of the registration report arithmetic and the guess-angle
chain (/root/reference/BatchTopPartRegistration.cpp:416-425, 512-527)."""

import math

import numpy as np

from pctpu.geom.se3 import eigen_inverse3_f32, matmul3_f32, yaw_rotation_4x4
from pctpu.pipelines.registration import (
    _guess_angle_rad,
    _guess_pair_np,
    _pair_precision,
)


def test_guess_angle_reference_f32_chain():
    """angle/180.0f evaluates in f32 before the double *M_PI promotion —
    a pure-double chain differs for non-f32-exact guesses."""
    a = 123.456
    expected = float(np.float32(np.float32(a) / np.float32(180.0))) * math.pi
    assert _guess_angle_rad(a) == expected
    # the chain matters: double arithmetic gives a different angle here
    assert _guess_angle_rad(a) != a / 180.0 * math.pi
    # the +180° guess adds in f32 first ((angle + 180.0f) / 180.0f * M_PI)
    expected2 = (
        float(np.float32((np.float32(a) + np.float32(180.0)) / np.float32(180.0)))
        * math.pi
    )
    assert _guess_angle_rad(a, 180.0) == expected2
    g = _guess_pair_np(a)
    assert g.dtype == np.float32 and g.shape == (2, 4, 4)
    np.testing.assert_array_equal(
        g[0], yaw_rotation_4x4(expected).astype(np.float32)
    )
    np.testing.assert_array_equal(
        g[1], yaw_rotation_4x4(expected2).astype(np.float32)
    )
    # f32-exact guesses are untouched by the chain
    assert _guess_angle_rad(90.0) == 90.0 / 180.0 * math.pi


def test_match_results_parse_to_f32():
    import tempfile

    from pctpu.pipelines.registration import load_match_results

    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write("0 1 123.456\n2 3 -45.0\n")
        path = f.name
    m = load_match_results(path)
    # the reference stores a C float (ss >> float); 123.456 is not f32-exact
    assert m[0].angle_guess == float(np.float32("123.456"))
    assert m[0].angle_guess != 123.456
    assert m[1].angle_guess == -45.0


def test_eigen_inverse3_f32_inverts():
    rng = np.random.default_rng(0)
    for _ in range(50):
        m = rng.standard_normal((3, 3)).astype(np.float32)
        if abs(np.linalg.det(m.astype(np.float64))) < 1e-2:
            continue
        inv = eigen_inverse3_f32(m)
        assert inv.dtype == np.float32
        np.testing.assert_allclose(
            matmul3_f32(inv, m), np.eye(3, dtype=np.float32), atol=5e-5
        )
        np.testing.assert_allclose(
            inv, np.linalg.inv(m.astype(np.float64)), rtol=1e-4, atol=1e-5
        )


def test_matmul3_f32_matches_reference_order():
    a = np.float32([[1, 2, 3], [4, 5, 6], [7, 8, 9]])
    b = np.float32([[9, 8, 7], [6, 5, 4], [3, 2, 1]])
    out = matmul3_f32(a, b)
    # exact small integers: order-independent, must equal the plain product
    np.testing.assert_array_equal(out, (a.astype(np.float64) @ b).astype(np.float32))
    # entry (0,0) is the left-to-right f32 sum
    expected00 = np.float32(
        np.float32(np.float32(1) * np.float32(9) + np.float32(2) * np.float32(6))
        + np.float32(3) * np.float32(3)
    )
    assert out[0, 0] == expected00


def test_pair_precision_reference_arithmetic():
    t_coarse = yaw_rotation_4x4(math.radians(30.0)).astype(np.float32)
    t_coarse[0, 3], t_coarse[1, 3] = 1.25, -0.5
    t_fine = yaw_rotation_4x4(math.radians(30.25)).astype(np.float32)
    t_fine[0, 3], t_fine[1, 3] = 1.5, -0.25
    diff_xy, diff_yaw = _pair_precision(t_coarse, t_fine)
    # both values are exactly representable f32 (the reference's
    # `float diff_xy/diff_yaw` variables)
    assert diff_xy == float(np.float32(diff_xy))
    assert diff_yaw == float(np.float32(diff_yaw))
    # magnitudes: hypot(0.25, 0.25) and the -0.25 deg relative yaw
    assert abs(diff_xy - math.hypot(0.25, 0.25)) < 1e-6
    assert abs(diff_yaw - (-0.25)) < 1e-4
    # identical transforms -> exactly zero
    assert _pair_precision(t_fine, t_fine) == (0.0, 0.0)


def test_pair_precision_yaw_boundary_is_exact_180():
    """The ±180° boundary: f32(atan2) tops out at f32(π) = π + 8.7e-8, so
    angles(2)/M_PI*180.0 peaks at 180.0000050 in double — and the f32
    *assignment* rounds that back to exactly ±180.0 (f32 ulp at 180 is
    1.5e-5).  The ±360° wrap guard (BatchTopPartRegistration.cpp:523-525)
    is therefore defensively dead in both stacks; what matters for report
    parity is that the boundary prints as exactly 180, never wrapped."""
    eps = np.float32(1e-9)
    t_fine = np.eye(4, dtype=np.float32)

    def coarse(sin_val):
        t = np.eye(4, dtype=np.float32)
        t[0, 0] = -1.0
        t[1, 1] = -1.0
        t[1, 0] = sin_val
        t[0, 1] = -sin_val
        return t

    assert _pair_precision(coarse(+eps), t_fine)[1] == 180.0
    assert _pair_precision(coarse(-eps), t_fine)[1] == -180.0


def test_warn_flat_cap_prints_only_on_truncation(capsys):
    from pctpu.pipelines.registration import _warn_flat_cap

    _warn_flat_cap(100, 128)
    assert "WARNING" not in capsys.readouterr().out
    _warn_flat_cap(200, 128)
    assert "truncated" in capsys.readouterr().out


def test_rotmat_to_euler_f32_singular_branch():
    """Gimbal-lock extraction (sy < 1e-6): yaw forced to 0, pitch ±90°
    (/root/reference/BatchTopPartRegistration.cpp:290-309 else-branch)."""
    from pctpu.pipelines.registration import _rotmat_to_euler_f32

    # pitch = -90°: r[0,0] = r[1,0] = 0 → sy = 0
    r = np.array([[0.0, 0.0, 1.0],
                  [0.0, 1.0, 0.0],
                  [-1.0, 0.0, 0.0]], np.float32)
    e = _rotmat_to_euler_f32(r)
    assert e.dtype == np.float32
    assert e[2] == 0.0
    assert e[1] == np.float32(math.pi / 2)
    # non-singular sanity alongside: plain yaw keeps the arctan branch
    ry = yaw_rotation_4x4(math.radians(40.0)).astype(np.float32)[:3, :3]
    assert abs(_rotmat_to_euler_f32(ry)[2] - math.radians(40.0)) < 1e-6


def test_pow2_bucket_growth_and_cap():
    from pctpu.pipelines.registration import _BUCKET_FLOOR, _pow2_bucket

    assert _pow2_bucket(1, 1 << 20) == _BUCKET_FLOOR
    assert _pow2_bucket(_BUCKET_FLOOR + 1, 1 << 20) == _BUCKET_FLOOR * 2
    assert _pow2_bucket(5000, 1 << 20) == 8192
    assert _pow2_bucket(5000, 4096) == 4096  # capacity cap wins
