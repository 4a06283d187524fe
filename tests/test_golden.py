"""Golden regression fixtures: fixed synthetic inputs → committed output
bytes (SURVEY.md §4 recommendation).

Unlike the differential tests (which co-evolve with the oracle), these pin
the *absolute* outputs so a semantics drift in both implementation and
oracle is still caught.  Regenerate deliberately with:
    python -m tests.test_golden regen
"""

import hashlib
import json
import os
import sys

import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "hashes.json")


def _fixed_cloud():
    from pctpu.cloud import make_cloud

    rng = np.random.default_rng(12345)
    n = 600
    r = rng.uniform(2, 60, n).astype(np.float32)
    az = rng.uniform(-np.pi, np.pi, n).astype(np.float32)
    ground = rng.random(n) < 0.5
    z = np.where(ground, rng.uniform(-2.1, -1.7, n), rng.uniform(-1, 5, n)).astype(
        np.float32
    )
    xyz = np.stack([r * np.cos(az), r * np.sin(az), z], 1).astype(np.float32)
    intensity = np.where(rng.random(n) < 0.2, -1.0, rng.random(n)).astype(np.float32)
    return make_cloud(
        xyz,
        intensity=intensity,
        row=rng.integers(0, 16, n).astype(np.int32),
        col=rng.integers(0, 32, n).astype(np.int32),
        label=np.full(n, -2, np.int32),
    )


def _artifacts():
    from pctpu.config import SensorParams, SingleBevConfig
    from pctpu.io.csvfmt import format_csv
    from pctpu.ops.bev import float_bev, multi_bev, single_bev
    from pctpu.ops.ground import mark_ground
    from pctpu.ops.ordering import get_ordered_cloud

    params = SensorParams(n_scan=16, horizon_scan=32, ground_upper_scan=10, height_res=0.5)
    ordered = get_ordered_cloud(_fixed_cloud(), params)
    labeled, gm = mark_ground(ordered, params)
    single = np.asarray(single_bev(labeled, SingleBevConfig()))
    return {
        "ground_mat": np.asarray(gm).tobytes(),
        "labels": np.asarray(labeled.label).astype(np.int16).tobytes(),
        "multi_bev_bin": np.asarray(multi_bev(labeled, params.height_res)).tobytes(),
        "single_bev_csv": format_csv(single).encode(),
        "float_bev": np.asarray(float_bev(labeled)).tobytes(),
    }


def _full_scale_artifacts():
    """The FULL HDL-64E fused production path (grid-ordered fast path +
    sort-based BEV + swept-band ground) at real 64×2083 shapes — pins the
    exact program the bench and the flagship pipeline run."""
    import jax

    from pctpu.config import get_sensor_params
    from pctpu.ops.ordering import is_grid_ordered
    from pctpu.ops.preprocess import preprocess_cloud

    params = get_sensor_params("HDL_64E")
    rng = np.random.default_rng(777)
    g = params.grid_size
    mask = rng.random(g) < 0.85
    r = rng.uniform(2, 100, g).astype(np.float32)
    az = rng.uniform(-np.pi, np.pi, g).astype(np.float32)
    ground = rng.random(g) < 0.5
    z = np.where(ground, rng.uniform(-2.1, -1.7, g), rng.uniform(-1, 6, g)).astype(
        np.float32
    )
    # where(), not *mask: 0.0 * negative = -0.0, and the bit-zero empty-slot
    # gate (correctly) rejects -0.0 as a real point
    xyz = np.where(
        mask[:, None],
        np.stack([r * np.cos(az), r * np.sin(az), z], 1),
        0.0,
    ).astype(np.float32)
    from pctpu.cloud import make_cloud

    slot = np.arange(g)
    cloud = make_cloud(
        xyz,
        intensity=(np.maximum(rng.random(g), 1e-3) * mask).astype(np.float32),
        row=(slot // params.horizon_scan * mask).astype(np.int32),
        col=(slot % params.horizon_scan * mask).astype(np.int32),
        label=np.where(mask, -2, 0).astype(np.int32),
    )
    assert is_grid_ordered(cloud, params)
    labeled, multi, single = jax.device_get(
        preprocess_cloud(cloud, params, assume_ordered=True)
    )
    return {
        "hdl64e_labels": np.asarray(labeled.label).astype(np.int16).tobytes(),
        "hdl64e_multi_bev": np.asarray(multi).tobytes(),
        "hdl64e_single_bev": np.asarray(single).tobytes(),
    }


def _hashes():
    out = {k: hashlib.sha256(v).hexdigest() for k, v in _artifacts().items()}
    out.update(
        {k: hashlib.sha256(v).hexdigest()
         for k, v in _full_scale_artifacts().items()}
    )
    return out


def test_golden_hashes_unchanged():
    with open(GOLDEN) as f:
        expected = json.load(f)
    got = _hashes()
    mismatched = {k for k in expected if expected[k] != got.get(k)}
    assert not mismatched, (
        f"golden outputs changed: {sorted(mismatched)} — if intentional, "
        "regenerate with `python -m tests.test_golden regen` and explain in "
        "the commit message"
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "w") as f:
            json.dump(_hashes(), f, indent=2, sort_keys=True)
        print(f"wrote {GOLDEN}")
