"""Multi-device sharding tests on the 8-virtual-CPU-device mesh."""

import jax
import numpy as np
import pytest

from pctpu.config import GroundConfig, MultiBevConfig, SensorParams, SingleBevConfig
from pctpu.ops.knn import nn_1
from pctpu.ops.preprocess import preprocess_batch
from pctpu.parallel.mesh import (
    make_mesh,
    psum_metrics,
    shard_cloud_batch,
    sharded_nn_1,
    sharded_preprocess,
)

SMALL = SensorParams(n_scan=8, horizon_scan=64, ground_upper_scan=6, height_res=0.5)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _batch(batch):
    import __graft_entry__ as ge

    return ge._example_cloud(batch=batch, params=SMALL, n_points=256)


def test_sharded_preprocess_matches_single_device():
    mesh = make_mesh(n_data=4, n_points=2)
    clouds = _batch(8)
    ref = preprocess_batch(clouds, SMALL)
    run = sharded_preprocess(
        mesh, SMALL, GroundConfig(), MultiBevConfig(), SingleBevConfig()
    )
    out = run(shard_cloud_batch(clouds, mesh))
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(ref[1]))
    np.testing.assert_array_equal(np.asarray(out[2]), np.asarray(ref[2]))
    np.testing.assert_array_equal(np.asarray(out[0].label), np.asarray(ref[0].label))


def test_sharded_nn_matches_local():
    mesh = make_mesh(n_data=4, n_points=2)
    rng = np.random.default_rng(0)
    q = rng.standard_normal((64, 3)).astype(np.float32)
    t = rng.standard_normal((128, 3)).astype(np.float32)
    qm = np.ones(64, bool)
    tm = np.ones(128, bool)
    idx_ref, d2_ref = nn_1(q, qm, t, tm, tile=32)
    nn = sharded_nn_1(mesh, tile=32)
    idx, d2 = nn(q, qm, t, tm)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d2_ref), rtol=1e-5)


def test_psum_metrics():
    mesh = make_mesh(n_data=8, n_points=1)
    total = psum_metrics(mesh)(np.arange(8, dtype=np.float32))
    assert float(np.asarray(total)) == 28.0
