import numpy as np

from pctpu.io.csvfmt import format_csv


def test_float_csv_matches_opencv_probe():
    # Byte output captured from libopencv_core Formatter FMT_CSV with
    # set32fPrecision(4) (see pctpu/io/csvfmt.py docstring).
    m = np.array(
        [[0.0, 1.23456789, -2.5, 100.0], [0.125, -0.0001234, 3.0, 255.0]],
        np.float32,
    )
    assert format_csv(m) == "0, 1.235, -2.5, 100\n0.125, -0.0001234, 3, 255\n"


def test_uint8_csv_matches_opencv_probe():
    m = np.array([[0, 255, 12], [7, 0, 1]], np.uint8)
    assert format_csv(m) == "  0, 255,  12\n  7,   0,   1\n"


def test_single_row_has_no_trailing_newline():
    m = np.array([[0.0, 1.23456789, -2.5]], np.float32)
    assert format_csv(m) == "0, 1.235, -2.5"


def test_round_trip_parse():
    rng = np.random.default_rng(0)
    m = rng.standard_normal((5, 7)).astype(np.float32)
    text = format_csv(m, float_precision=9)
    back = np.array(
        [[float(v) for v in line.split(",")] for line in text.strip().split("\n")],
        np.float32,
    )
    np.testing.assert_array_equal(back, m)


def _generic_format(mat, float_precision=4):
    """The original per-value Python formatter (differential oracle for the
    vectorized/native fast paths)."""
    from pctpu.io.csvfmt import _value_formatter

    value = _value_formatter(mat.dtype, float_precision)
    rows = (", ".join(value(v) for v in row) for row in mat)
    if mat.shape[0] == 1:
        return next(rows)
    return "".join(r + "\n" for r in rows)


def test_uint8_fast_path_matches_generic():
    rng = np.random.default_rng(0)
    for shape in [(1, 7), (3, 5), (224, 224)]:
        m = rng.integers(0, 256, shape, dtype=np.uint8)
        assert format_csv(m) == _generic_format(m), shape
    # all boundary values
    m = np.arange(256, dtype=np.uint8).reshape(16, 16)
    assert format_csv(m) == _generic_format(m)


def test_float32_native_path_matches_python_fuzz():
    """C snprintf %.4g (the actual libopencv behavior) vs Python %.4g over
    random and adversarial values — both paths must agree byte-for-byte."""
    rng = np.random.default_rng(1)
    mats = [
        rng.uniform(-3, 8, (201, 201)).astype(np.float32),
        (rng.standard_normal((50, 50)) * 10.0 ** rng.integers(-8, 8, (50, 50))
         ).astype(np.float32),
        np.array([[0.0, -0.0, 1e-5, 9.9995e3, 1e16, 1.2345e-4]], np.float32),
        np.array([[0.12345, 0.123450001, 99995.0, 0.00012345]], np.float32),
        np.float32(np.ldexp(1.0, -140)) * np.ones((2, 2), np.float32),  # subnormal-ish
    ]
    for i, m in enumerate(mats):
        assert format_csv(m) == _generic_format(m), f"mat {i}"


def test_write_csv_bytes_round_trip(tmp_path):
    from pctpu.io.csvfmt import write_csv

    m = np.random.default_rng(2).integers(0, 256, (9, 4), dtype=np.uint8)
    p = tmp_path / "m.csv"
    write_csv(str(p), m)
    assert p.read_text() == _generic_format(m)


def test_negative_nan_matches_glibc():
    """glibc %g (OpenCV's formatter) prints sign-set NaNs as '-nan'; the
    Python fallback and the native path must agree."""
    m = np.array([[np.float32("nan"), -np.float32("nan"), np.inf, -np.inf]],
                 np.float32)
    assert format_csv(m) == "nan, -nan, inf, -inf"
    assert format_csv(m) == _generic_format(m)
