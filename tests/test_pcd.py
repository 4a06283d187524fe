import numpy as np
import pytest

from pctpu.cloud import make_cloud
from pctpu.io.pcd import (
    XYZIRCT_FIELDS,
    cloud_to_pcd_dict,
    load_cloud_pcd,
    read_pcd,
    save_cloud_pcd,
    write_pcd,
)


def _random_fields(n, rng):
    return {
        "x": rng.standard_normal(n).astype(np.float32),
        "y": rng.standard_normal(n).astype(np.float32),
        "z": rng.standard_normal(n).astype(np.float32),
        "intensity": rng.standard_normal(n).astype(np.float32),
        "row": rng.integers(0, 64, n).astype(np.uint16),
        "col": rng.integers(0, 2083, n).astype(np.uint16),
        "t": rng.integers(0, 2**31, n).astype(np.uint32),
        "label": rng.integers(-2, 3, n).astype(np.int16),
    }


def test_binary_round_trip(tmp_path):
    rng = np.random.default_rng(0)
    data = _random_fields(1000, rng)
    path = str(tmp_path / "c.pcd")
    write_pcd(path, data)
    back, meta = read_pcd(path)
    assert meta["points"] == 1000
    assert meta["width"] == 1000 and meta["height"] == 1
    for k, v in data.items():
        np.testing.assert_array_equal(back[k], v)


def test_binary_layout_is_packed_26_bytes(tmp_path):
    # PCL's templated writeBinary packs registered fields without padding:
    # 4+4+4+4+2+2+4+2 = 26 bytes per XYZIRCT point.
    data = _random_fields(10, np.random.default_rng(1))
    path = str(tmp_path / "c.pcd")
    write_pcd(path, data)
    blob = open(path, "rb").read()
    body = blob[blob.index(b"DATA binary\n") + len(b"DATA binary\n") :]
    assert len(body) == 10 * 26
    # first point bytes: x,y,z,intensity f32 | row,col u16 | t u32 | label i16
    import struct

    x, y, z, i = struct.unpack_from("<ffff", body, 0)
    row, col = struct.unpack_from("<HH", body, 16)
    (t,) = struct.unpack_from("<I", body, 20)
    (label,) = struct.unpack_from("<h", body, 24)
    assert x == data["x"][0] and y == data["y"][0] and z == data["z"][0]
    assert i == data["intensity"][0]
    assert row == data["row"][0] and col == data["col"][0]
    assert t == data["t"][0] and label == data["label"][0]


def test_header_matches_pcl_format(tmp_path):
    data = _random_fields(5, np.random.default_rng(2))
    path = str(tmp_path / "c.pcd")
    write_pcd(path, data)
    header = open(path, "rb").read().split(b"DATA binary\n")[0].decode()
    assert header == (
        "# .PCD v0.7 - Point Cloud Data file format\n"
        "VERSION 0.7\n"
        "FIELDS x y z intensity row col t label\n"
        "SIZE 4 4 4 4 2 2 4 2\n"
        "TYPE F F F F U U U I\n"
        "COUNT 1 1 1 1 1 1 1 1\n"
        "WIDTH 5\n"
        "HEIGHT 1\n"
        "VIEWPOINT 0 0 0 1 0 0 0\n"
        "POINTS 5\n"
    )


def test_ascii_round_trip(tmp_path):
    rng = np.random.default_rng(3)
    data = _random_fields(50, rng)
    path = str(tmp_path / "c.pcd")
    write_pcd(path, data, binary=False)
    back, _ = read_pcd(path)
    for k, v in data.items():
        np.testing.assert_array_equal(back[k], v)


def test_cloud_adapter_round_trip(tmp_path):
    rng = np.random.default_rng(4)
    xyz = rng.standard_normal((100, 3)).astype(np.float32)
    cloud = make_cloud(
        xyz,
        intensity=rng.standard_normal(100).astype(np.float32),
        label=np.full(100, -2, np.int32),
    )
    path = str(tmp_path / "c.pcd")
    save_cloud_pcd(path, cloud)
    back = load_cloud_pcd(path)
    np.testing.assert_allclose(np.asarray(back.xyz), xyz, rtol=0, atol=0)
    np.testing.assert_array_equal(np.asarray(back.label), np.full(100, -2))
    assert int(back.count) == 100


def test_negative_label_sign_extension(tmp_path):
    # int16 -2 on disk must come back as int32 -2, not 65534.
    data = _random_fields(3, np.random.default_rng(5))
    data["label"] = np.array([-2, 0, 1], np.int16)
    path = str(tmp_path / "c.pcd")
    write_pcd(path, data)
    cloud = load_cloud_pcd(path)
    np.testing.assert_array_equal(np.asarray(cloud.label), [-2, 0, 1])


# --- binary_compressed (LZF) reading ----------------------------------------


def _lzf_compress_literals(data: bytes) -> bytes:
    """Minimal valid LZF stream: literal runs only (every control < 32)."""
    out = bytearray()
    for i in range(0, len(data), 32):
        chunk = data[i : i + 32]
        out.append(len(chunk) - 1)
        out += chunk
    return bytes(out)


def test_lzf_decompress_backref():
    from pctpu.io.pcd import _lzf_decompress

    # literal "XYZ" + 9-byte overlapping back reference (offset 3)
    stream = bytes([0x02]) + b"XYZ" + bytes([0xE0, 0x00, 0x02])
    assert _lzf_decompress(stream, 12) == b"XYZXYZXYZXYZ"


def test_read_binary_compressed_pcd(tmp_path):
    from pctpu.io.pcd import read_pcd, save_cloud_pcd
    from pctpu.cloud import make_cloud

    rng = np.random.default_rng(0)
    n = 37
    xyz = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    cloud = make_cloud(
        xyz,
        intensity=rng.random(n).astype(np.float32),
        row=rng.integers(0, 64, n).astype(np.int32),
        col=rng.integers(0, 2083, n).astype(np.int32),
        t=rng.integers(0, 1000, n).astype(np.uint32),
        label=np.full(n, -2, np.int32),
    )
    ref_path = str(tmp_path / "plain.pcd")
    save_cloud_pcd(ref_path, cloud)
    plain, meta = read_pcd(ref_path)

    # rebuild the same cloud as DATA binary_compressed (SoA field-major)
    with open(ref_path, "rb") as f:
        blob = f.read()
    header_end = blob.index(b"DATA binary\n")
    header = blob[:header_end].decode()
    soa = b""
    for f_ in meta["fields"]:
        soa += np.ascontiguousarray(plain[f_.name]).tobytes()
    comp = _lzf_compress_literals(soa)
    cpath = str(tmp_path / "compressed.pcd")
    with open(cpath, "wb") as f:
        f.write(header.encode() + b"DATA binary_compressed\n")
        f.write(np.array([len(comp), len(soa)], np.uint32).tobytes())
        f.write(comp)

    got, meta2 = read_pcd(cpath)
    assert meta2["points"] == n
    for name in plain:
        np.testing.assert_array_equal(got[name], plain[name])


def test_ascii_multi_count_field_round_trip(tmp_path):
    from pctpu.io.pcd import FieldSpec, read_pcd, write_pcd

    data = {"desc": np.arange(6, dtype=np.float32).reshape(2, 3) * 0.5,
            "x": np.array([1.5, -2.5], np.float32)}
    fields = (FieldSpec("desc", np.float32, 3), FieldSpec("x", np.float32, 1))
    p = tmp_path / "multi.pcd"
    write_pcd(str(p), data, fields=fields, binary=False)
    out, meta = read_pcd(str(p))
    np.testing.assert_array_equal(out["desc"], data["desc"])
    np.testing.assert_array_equal(out["x"], data["x"])


def test_ascii_float64_round_trip(tmp_path):
    from pctpu.io.pcd import FieldSpec, read_pcd, write_pcd

    v = np.array([1.000000000001, -3.141592653589793], np.float64)
    p = tmp_path / "f64.pcd"
    write_pcd(str(p), {"d": v}, fields=(FieldSpec("d", np.float64, 1),),
              binary=False)
    out, _ = read_pcd(str(p))
    np.testing.assert_array_equal(out["d"], v)


def test_corrupt_pcd_inputs_raise_cleanly(tmp_path):
    """Failure handling (SURVEY §5.3): corrupt inputs raise ValueError with
    an explanatory message instead of silently returning garbage."""
    from pctpu.cloud import make_cloud
    from pctpu.io.pcd import read_pcd, save_cloud_pcd

    good = tmp_path / "a.pcd"
    save_cloud_pcd(str(good), make_cloud(np.random.rand(10, 3).astype(np.float32)))
    raw = good.read_bytes()

    trunc = tmp_path / "trunc.pcd"
    trunc.write_bytes(raw[:-50])
    with pytest.raises(ValueError, match="truncated PCD"):
        read_pcd(str(trunc))

    garb = tmp_path / "garb.pcd"
    garb.write_bytes(b"not a pcd at all" * 3)
    with pytest.raises(ValueError, match="corrupt PCD"):
        read_pcd(str(garb))

    over = tmp_path / "overclaim.pcd"
    hdr_end = raw.index(b"DATA binary\n") + len(b"DATA binary\n")
    hdr = raw[:hdr_end].replace(b"POINTS 10", b"POINTS 999").replace(
        b"WIDTH 10", b"WIDTH 999"
    )
    over.write_bytes(hdr + raw[hdr_end:])
    with pytest.raises(ValueError, match="truncated PCD"):
        read_pcd(str(over))


def test_lzf_python_fallback_and_corrupt_streams(monkeypatch):
    """The pure-Python LZF decoder (native lib absent): literal runs,
    short + extended-length overlapping back references, and both corrupt
    stream errors (PCL lzfDecompress semantics, io/pcd.py docstring)."""
    import pctpu.runtime.native_io as nio
    from pctpu.io.pcd import _lzf_decompress

    monkeypatch.setattr(nio, "lzf_decompress", lambda data, size: None)

    # literal + short back reference (overlapping copy)
    stream = bytes([0x02]) + b"XYZ" + bytes([0xE0, 0x00, 0x02])
    assert _lzf_decompress(stream, 12) == b"XYZXYZXYZXYZ"

    # extended length (ctrl length field == 7 → extra length byte)
    stream = bytes([0x01]) + b"AB" + bytes([0xE0, 0x05, 0x01])
    assert _lzf_decompress(stream, 16) == b"AB" * 8

    # back reference pointing before the output start
    with pytest.raises(ValueError, match="reference before start"):
        _lzf_decompress(bytes([0x40, 0x00]), 4)

    # stream decodes to the wrong size
    with pytest.raises(ValueError, match="expected 5 bytes, got 3"):
        _lzf_decompress(bytes([0x02]) + b"abc", 5)

    # round-trip a real compressed PCD through the Python decoder
    assert _lzf_decompress(_lzf_compress_literals(b"x" * 100), 100) == b"x" * 100
