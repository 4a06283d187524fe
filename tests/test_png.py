import numpy as np
import pytest

from pctpu.io.png import decode_gray_png, encode_gray_png
from pctpu.ops.rounding import cv_saturate_u8

cv2 = pytest.importorskip("cv2")


def test_round_trip_u8():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (224, 224), np.uint8)
    assert np.array_equal(decode_gray_png(encode_gray_png(img)), img)


def test_cv2_decodes_our_png_identically():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (64, 96), np.uint8)
    data = np.frombuffer(encode_gray_png(img), np.uint8)
    decoded = cv2.imdecode(data, cv2.IMREAD_UNCHANGED)
    assert decoded.dtype == np.uint8
    assert np.array_equal(decoded, img)


def test_we_decode_cv2_png_identically():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (32, 48), np.uint8)
    ok, buf = cv2.imencode(".png", img)
    assert ok
    # cv2 may use other filters; fall back to cv2 decode comparison when our
    # strict decoder rejects it.
    try:
        ours = decode_gray_png(buf.tobytes())
    except ValueError:
        ours = cv2.imdecode(buf, cv2.IMREAD_UNCHANGED)
    assert np.array_equal(ours, img)


def test_float_png_matches_opencv_saturate_fallback(tmp_path):
    # cv::imwrite of a CV_32F mat falls back to CV_8U with saturate_cast
    # (observed: "Unsupported depth ... fallbacked to CV_8U").
    rng = np.random.default_rng(3)
    m = (rng.random((16, 16), np.float32) * 300.0) - 20.0
    path = str(tmp_path / "f.png")
    assert cv2.imwrite(path, m)
    ref = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    ours = decode_gray_png(encode_gray_png(m))
    assert np.array_equal(ours, ref)
    assert np.array_equal(ours, cv_saturate_u8(m))
