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


def test_rle_deflate_level1_round_trip_and_boundaries():
    """The level-1 RLE fixed-Huffman encoder (pctpu/io/png.py
    _deflate_rle_fixed) produces valid streams across adversarial run
    shapes: runs straddling the 3/258/259/260 length boundaries, all-zero,
    dense noise, and single-pixel images."""
    import zlib

    from pctpu.io.png import _deflate_rle_fixed

    rng = np.random.default_rng(7)
    cases = [
        np.zeros((1, 1), np.uint8),
        np.zeros((224, 224), np.uint8),
        np.full((3, 7), 255, np.uint8),
        rng.integers(0, 256, (64, 64), np.uint8),  # dense worst case
    ]
    # exact run-length boundaries: L identical bytes then a breaker
    for L in (1, 2, 3, 4, 257, 258, 259, 260, 516, 517, 520):
        row = np.zeros(L + 1, np.uint8)
        row[-1] = 9
        cases.append(row[None, :])
    for img in cases:
        data = encode_gray_png(img, compress_level=1)
        assert np.array_equal(decode_gray_png(data), img)
        decoded = cv2.imdecode(np.frombuffer(data, np.uint8),
                               cv2.IMREAD_UNCHANGED)
        assert np.array_equal(decoded.reshape(img.shape), img)


def test_rle_deflate_matches_native_bytes():
    """Python level-1 encoder is byte-identical to the native one
    (native/pctpu_io.cpp deflate_rle_fixed) on adversarial patterns."""
    import pctpu.runtime.native_io as nio

    if not nio.native_available():
        pytest.skip("native lib unavailable")

    rng = np.random.default_rng(11)
    cases = [
        np.zeros((17, 31), np.uint8),
        rng.integers(0, 256, (33, 29), np.uint8),
        np.repeat(rng.integers(0, 256, 40, np.uint8), 13)[: 37 * 14]
        .reshape(37, 14),
    ]
    for idx, img in enumerate(cases):
        import tempfile, os
        with tempfile.TemporaryDirectory() as d:
            nio.write_png(os.path.join(d, "n.png"), img)
            native = open(os.path.join(d, "n.png"), "rb").read()
        assert native == encode_gray_png(img, compress_level=1), idx
