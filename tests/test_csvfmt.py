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
