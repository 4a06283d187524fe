"""Small guard/error/fallback branches surfaced by the line-coverage sweep
(tests/covtrace.py): config validation raises, cloud helper utilities,
loader edge contracts, and the non-default preprocess/NN branches."""

import os

import numpy as np
import pytest


def test_parse_sensor_type_unknown_raises():
    from pctpu.config import parse_sensor_type

    with pytest.raises(ValueError, match="Unknown sensor type"):
        parse_sensor_type("VLP_16")


def test_ground_config_rejects_non_pow2_cell():
    from pctpu.config import GroundConfig

    with pytest.raises(ValueError, match="power of two"):
        GroundConfig(cell_size=3.0)


def test_bev_configs_reject_non_pow2_height_scale():
    from pctpu.config import SingleBevConfig

    with pytest.raises(ValueError, match="power of two"):
        SingleBevConfig(height_scale=3.0)


def test_make_cloud_rejects_bad_shapes():
    from pctpu.cloud import make_cloud

    xyz = np.zeros((5, 3), np.float32)
    with pytest.raises(ValueError, match="exceed capacity"):
        make_cloud(xyz, capacity=3)
    with pytest.raises(ValueError, match="field length"):
        make_cloud(xyz, intensity=np.zeros(4, np.float32))


def test_cloud_helpers_round_trip():
    from pctpu.cloud import empty_cloud, make_cloud, stack_clouds, to_numpy

    e = empty_cloud(7)
    assert int(e.count) == 7 and e.xyz.shape == (7, 3)
    assert not np.any(np.asarray(e.xyz))  # default-constructed PCL points

    rng = np.random.default_rng(0)
    c1 = make_cloud(rng.normal(size=(4, 3)).astype(np.float32), capacity=6)
    c2 = make_cloud(rng.normal(size=(6, 3)).astype(np.float32))
    s = stack_clouds([c1, c2])
    assert s.xyz.shape == (2, 6, 3)
    np.testing.assert_array_equal(np.asarray(s.count), [4, 6])

    d = to_numpy(c1)
    assert d["count"] == 4 and d["xyz"].shape == (6, 3)
    np.testing.assert_array_equal(d["xyz"], np.asarray(c1.xyz))


def test_bev_cell_np_matches_jax_twin():
    from pctpu.ops.rounding import bev_cell, bev_cell_np

    # half-away-zero knife edges incl. negatives and the .5 grid points
    coords = np.array(
        [-112.0, -111.5, -0.75, -0.5, -0.25, 0.0, 0.25, 0.5, 59.49999,
         59.5, 111.5, 112.0], np.float32)
    got_np = bev_cell_np(coords, 112.0, 1.0)
    got_jx = np.asarray(bev_cell(coords, 112.0, 1.0))
    np.testing.assert_array_equal(got_np, got_jx)


def test_assign_rings_empty_and_negative_start():
    from pctpu.io.kitti import assign_rings

    row, col, assigned = assign_rings(np.zeros((0, 4), np.float32))
    assert len(row) == 0 and len(col) == 0 and len(assigned) == 0

    # first azimuth <= 0: ring starts unassigned (-1) and resets to 0 at the
    # first upward zero crossing (KittiPointCloudSelect.cpp ring logic)
    pts = np.array(
        [[1.0, -0.1, 0.0, 0.0],  # az < 0 → ring -1
         [1.0, -0.05, 0.0, 0.0],
         [1.0, 0.1, 0.0, 0.0],   # crossing → reset to ring 0
         [1.0, 0.2, 0.0, 0.0]], np.float32)
    row, col, assigned = assign_rings(pts)
    assert row[0] == -1  # point 0 is never assigned
    assert not assigned[0] and not assigned[1]
    assert np.all(row[2:] == 0) and np.all(assigned[2:])


def test_read_timestamps_rejects_garbage(tmp_path):
    from pctpu.io.kitti import read_timestamps

    p = tmp_path / "times.txt"
    p.write_text("12.75 13.5\n")
    assert read_timestamps(str(p)) == [12, 13]  # std::stoll prefix parse
    p.write_text("abc\n")
    with pytest.raises(ValueError, match="unparseable timestamp"):
        read_timestamps(str(p))


def test_icp_sharded_requires_mesh():
    import jax.numpy as jnp

    from pctpu.config import FINE_ICP
    from pctpu.ops.icp import icp

    pts = jnp.zeros((8, 3), jnp.float32)
    mask = jnp.ones((8,), bool)
    with pytest.raises(ValueError, match="needs a mesh"):
        icp(pts, mask, pts, mask, jnp.eye(4), FINE_ICP, nn_impl="sharded",
            mesh=None)


def test_sharded_nn_rejects_indivisible_target():
    import jax

    from pctpu.parallel.mesh import make_mesh, sharded_nn_1

    if len(jax.devices()) < 2:
        pytest.skip("needs >1 device")
    mesh = make_mesh(n_data=len(jax.devices()) // 2, n_points=2)
    run = sharded_nn_1(mesh)
    q = np.zeros((4, 3), np.float32)
    t = np.zeros((9, 3), np.float32)  # odd: not divisible by 2 shards
    with pytest.raises(ValueError, match="must divide the target"):
        run(q, np.ones(4, bool), t, np.ones(9, bool))


def test_distributed_initialize_single_process_is_noop():
    from pctpu.parallel.distributed import initialize

    # must not touch jax.distributed (which would try to bind a coordinator)
    initialize("localhost:9999", num_processes=1, process_id=0)


def test_profiler_trace_enabled(tmp_path):
    import jax.numpy as jnp

    from pctpu.runtime.profiler import trace

    with trace("unit", enabled=True, trace_dir=str(tmp_path)):
        jnp.arange(4).sum().block_until_ready()
    # jax.profiler.trace wrote its session dir
    assert os.listdir(str(tmp_path))


def test_preprocess_unfused_branch_matches_ops():
    """preprocess_cloud with mismatched BEV grids takes the unfused
    multi_bev + single_bev branch; outputs equal the direct op calls."""
    import jax.numpy as jnp

    from pctpu.cloud import make_cloud
    from pctpu.config import (
        GroundConfig,
        MultiBevConfig,
        SensorParams,
        SingleBevConfig,
    )
    from pctpu.ops.bev import fused_bev_compatible, multi_bev, single_bev
    from pctpu.ops.preprocess import preprocess_cloud

    params = SensorParams(n_scan=8, horizon_scan=32, ground_upper_scan=6,
                          height_res=0.5)
    single_cfg = SingleBevConfig(max_range=100.0)  # 201-px grid vs multi's 225
    multi_cfg = MultiBevConfig()
    assert not fused_bev_compatible(multi_cfg, single_cfg)

    rng = np.random.default_rng(2)
    n = 120
    xyz = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
    xyz[:, 2] = rng.uniform(-2.2, 3.0, n).astype(np.float32)
    cloud = make_cloud(
        xyz,
        row=rng.integers(0, params.n_scan, n).astype(np.int32),
        col=rng.integers(0, params.horizon_scan, n).astype(np.int32),
        label=np.full(n, -2, np.int32),
        capacity=params.grid_size,
    )
    labeled, multi_img, single_img = preprocess_cloud(
        cloud, params, GroundConfig(), multi_cfg, single_cfg)
    np.testing.assert_array_equal(
        np.asarray(multi_img),
        np.asarray(multi_bev(labeled, params.height_res, multi_cfg)))
    np.testing.assert_array_equal(
        np.asarray(single_img),
        np.asarray(single_bev(labeled, single_cfg)))
