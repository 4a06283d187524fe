"""Native IO accelerator parity: artifacts identical across native/Python."""

import numpy as np
import pytest

from pctpu.io.png import read_gray_png
from pctpu.runtime.native_io import native_available, write_multi_bev, write_png


def test_native_png_decodes_identically(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (224, 224), np.uint8)
    p = str(tmp_path / "a.png")
    write_png(p, img)
    assert np.array_equal(read_gray_png(p), img)
    cv2 = pytest.importorskip("cv2")
    assert np.array_equal(cv2.imread(p, cv2.IMREAD_UNCHANGED), img)


def test_native_multi_bev_outputs(tmp_path):
    rng = np.random.default_rng(1)
    multi = (rng.random((24, 32, 32)) > 0.8).astype(np.uint8) * 255
    bin_path = str(tmp_path / "c.bin")
    img_dir = str(tmp_path / "imgs")
    write_multi_bev(bin_path, img_dir, multi)
    blob = np.fromfile(bin_path, np.uint8).reshape(24, 32, 32)
    assert np.array_equal(blob, multi)
    for layer in (0, 13, 23):
        png = read_gray_png(str(tmp_path / "imgs" / f"{layer:02d}.png"))
        assert np.array_equal(png, multi[layer])


def test_native_lib_builds():
    # informational: both paths are correct, but the native one should load
    # in this image (g++ + zlib available)
    assert native_available()


def test_native_lzf_matches_python():
    """Native liblzf decoder == the pure-Python fallback, incl. backrefs."""
    import pctpu.runtime.native_io as nio

    if not nio.native_available():
        import pytest

        pytest.skip("native lib unavailable")

    # literal-only stream
    rng = np.random.default_rng(0)
    payload = rng.integers(0, 255, 100_000, dtype=np.uint8).tobytes()
    from .test_pcd import _lzf_compress_literals

    comp = _lzf_compress_literals(payload)
    assert nio.lzf_decompress(comp, len(payload)) == payload

    # back-reference stream (overlapping copy)
    stream = bytes([0x02]) + b"XYZ" + bytes([0xE0, 0x00, 0x02])
    assert nio.lzf_decompress(stream, 12) == b"XYZXYZXYZXYZ"

    # corrupt stream: native returns None (caller falls back / errors)
    assert nio.lzf_decompress(stream, 13) is None
