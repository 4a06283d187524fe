"""Multi-host work partitioning (pctpu.parallel.distributed), emulated in one
process: run the batch pipelines once per shard id on a shared tree and check
the union of outputs is byte-identical to the single-host run."""

import filecmp
import os
import shutil

import numpy as np

from pctpu.parallel.distributed import process_shard


def test_process_shard_strided_partition():
    items = list(range(11))
    shards = [process_shard(items, pid, 3) for pid in range(3)]
    assert shards[0] == [0, 3, 6, 9]
    assert shards[1] == [1, 4, 7, 10]
    assert shards[2] == [2, 5, 8]
    assert sorted(sum(shards, [])) == items
    # single process: identity
    assert process_shard(items, 0, 1) == items


def test_initialize_forwards_to_jax_distributed(monkeypatch):
    """pctpu.parallel.distributed.initialize: single-process is a no-op;
    multi-process forwards the coordinator/process args verbatim to
    jax.distributed.initialize (real multi-host hardware unavailable here,
    so the seam is pinned with a recording stub)."""
    import jax

    from pctpu.parallel.distributed import initialize

    calls = []
    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda **kwargs: calls.append(kwargs),
    )
    initialize(num_processes=1, process_id=0)  # single process: no-op
    assert calls == []
    initialize("10.0.0.1:1234", num_processes=2, process_id=1)
    assert calls == [dict(coordinator_address="10.0.0.1:1234",
                          num_processes=2, process_id=1)]
    initialize()  # cluster-env mode: all args None, still forwarded
    assert calls[-1] == dict(coordinator_address=None,
                             num_processes=None, process_id=None)


def test_mesh_defaults_span_all_devices():
    """make_mesh with no n_data splits all devices across (data, points);
    global_mesh is the multi-host-spanning alias."""
    import jax

    from pctpu.parallel.distributed import global_mesh
    from pctpu.parallel.mesh import make_mesh

    n = len(jax.devices())  # 8 virtual CPU devices under conftest
    m = make_mesh(n_points=2)
    assert dict(m.shape) == {"data": n // 2, "points": 2}
    m1 = global_mesh()
    assert dict(m1.shape) == {"data": n, "points": 1}


def _make_tree(root, params, n_clouds, rng):
    from pctpu.cloud import make_cloud
    from pctpu.io.pcd import save_cloud_pcd

    cloud_dir = os.path.join(root, "keyframe_point_cloud")
    os.makedirs(cloud_dir)
    for i in range(n_clouds):
        n = 150
        xyz = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
        xyz[:, 2] = rng.uniform(-2.2, 3.0, n).astype(np.float32)
        c = make_cloud(
            xyz,
            intensity=rng.random(n).astype(np.float32),
            row=rng.integers(0, params.n_scan, n).astype(np.int32),
            col=rng.integers(0, params.horizon_scan, n).astype(np.int32),
            label=np.full(n, -2, np.int32),
        )
        save_cloud_pcd(os.path.join(cloud_dir, f"{i:06d}.pcd"), c)
    with open(os.path.join(root, "keyframe_pose.csv"), "w") as f:
        for i in range(n_clouds):
            f.write(
                f"{i:06d},{i * 25.0:.6f},0.000000,0.000000,0,0,0,"
                "1.000000,0.000000,0.000000,0.000000,1.000000,0.000000,"
                "0.000000,0.000000,1.000000\n"
            )


def test_run_multi_bev_two_host_emulation(tmp_path):
    from pctpu.config import SensorParams
    from pctpu.pipelines.multi_bev import run_multi_bev

    params = SensorParams(n_scan=8, horizon_scan=64, ground_upper_scan=6,
                          height_res=0.5)
    rng = np.random.default_rng(5)
    single = str(tmp_path / "single")
    multi = str(tmp_path / "multi")
    n_clouds = 5
    _make_tree(single, params, n_clouds, rng)
    shutil.copytree(single, multi)

    run_multi_bev(single, params, batch_size=4, write_pngs=False)

    # host 0 runs first (it resets the output dirs), then host 1 on the SAME
    # tree; per-file outputs are disjoint so order past that doesn't matter
    out0 = run_multi_bev(multi, params, batch_size=4, write_pngs=False,
                         process_id=0, num_processes=2)
    out1 = run_multi_bev(multi, params, batch_size=4, write_pngs=False,
                         process_id=1, num_processes=2)
    assert out0.num_clouds == 3 and out1.num_clouds == 2  # strided 5 over 2
    assert out0.num_major_frames > 0  # labels on host 0
    assert out1.num_major_frames == 0  # host 1 skips the global label phase

    for sub in ("output_multi_bev/binary", "output_single_bev/csv",
                "non_ground_point_cloud"):
        a, b = os.path.join(single, sub), os.path.join(multi, sub)
        names = sorted(os.listdir(a))
        assert names == sorted(os.listdir(b)) and len(names) == n_clouds
        for nme in names:
            assert filecmp.cmp(os.path.join(a, nme), os.path.join(b, nme),
                               shallow=False), f"{sub}/{nme} differs"
    assert filecmp.cmp(os.path.join(single, "keyframe_label.csv"),
                       os.path.join(multi, "keyframe_label.csv"), shallow=False)


def test_run_multi_bev_shard1_keeps_host0_outputs(tmp_path):
    """A non-0 host must not wipe output dirs even without --resume."""
    from pctpu.config import SensorParams
    from pctpu.pipelines.multi_bev import run_multi_bev

    params = SensorParams(n_scan=8, horizon_scan=64, ground_upper_scan=6,
                          height_res=0.5)
    root = str(tmp_path / "tree")
    _make_tree(root, params, 4, np.random.default_rng(6))
    run_multi_bev(root, params, batch_size=4, write_pngs=False,
                  process_id=0, num_processes=2)
    marker = os.path.join(root, "output_multi_bev/binary/000000.bin")
    assert os.path.exists(marker)
    run_multi_bev(root, params, batch_size=4, write_pngs=False,
                  process_id=1, num_processes=2)
    assert os.path.exists(marker)  # host 1 didn't rmtree host 0's work


def test_batch_registration_two_host_emulation(tmp_path):
    from tests.test_registration_e2e import rigid, synth_scene

    from pctpu.cloud import make_cloud
    from pctpu.io.pcd import save_cloud_pcd
    from pctpu.pipelines.registration import run_batch_top_part_registration

    rng = np.random.default_rng(2)
    xyz, labels = synth_scene(rng)
    cloud_dir = tmp_path / "clouds"
    cloud_dir.mkdir()
    save_cloud_pcd(str(cloud_dir / "000000.pcd"),
                   make_cloud(xyz, label=labels, capacity=4096))
    for i, yaw in enumerate([10.0, 25.0, 40.0], start=1):
        save_cloud_pcd(
            str(cloud_dir / f"{i:06d}.pcd"),
            make_cloud(rigid(xyz, yaw, [1.0, 0.5, 0.0]), label=labels,
                       capacity=4096),
        )
    match_file = tmp_path / "match_result.txt"
    match_file.write_text("0 1 10.0\n0 2 25.0\n0 3 40.0\n")

    seq = run_batch_top_part_registration(
        str(match_file), str(cloud_dir), flat_cap=4096,
        report_path=str(tmp_path / "seq.txt"),
    )
    sh0 = run_batch_top_part_registration(
        str(match_file), str(cloud_dir), flat_cap=4096,
        report_path=str(tmp_path / "rep.txt"), process_id=0, num_processes=2,
    )
    sh1 = run_batch_top_part_registration(
        str(match_file), str(cloud_dir), flat_cap=4096,
        report_path=str(tmp_path / "rep.txt"), process_id=1, num_processes=2,
    )
    assert len(sh0) == 2 and len(sh1) == 1
    assert os.path.exists(tmp_path / "rep.txt.shard0")
    assert os.path.exists(tmp_path / "rep.txt.shard1")
    # union of shard reports == sequential reports (strided interleave)
    merged = {(r.query_idx, r.match_idx): r for r in sh0 + sh1}
    for r in seq:
        m = merged[(r.query_idx, r.match_idx)]
        np.testing.assert_array_equal(m.transform_fine, r.transform_fine)
        assert m.success == r.success


def test_batch_whole_registration_sharded_counts(tmp_path):
    from tests.test_registration_e2e import rigid, synth_scene

    from pctpu.cloud import make_cloud
    from pctpu.io.pcd import save_cloud_pcd
    from pctpu.pipelines.registration import run_batch_whole_registration

    rng = np.random.default_rng(3)
    xyz, labels = synth_scene(rng)
    cloud_dir = tmp_path / "clouds"
    cloud_dir.mkdir()
    save_cloud_pcd(str(cloud_dir / "000000.pcd"),
                   make_cloud(xyz, label=labels, capacity=4096))
    save_cloud_pcd(str(cloud_dir / "000001.pcd"),
                   make_cloud(rigid(xyz, 5.0, [0.5, 0.0, 0.0]), label=labels,
                              capacity=4096))
    match_file = tmp_path / "match_result.txt"
    match_file.write_text("0 1 5.0\n1 0 -5.0\n")
    s0, f0 = run_batch_whole_registration(
        str(match_file), str(cloud_dir), capacity=4096,
        report_path=str(tmp_path / "w.txt"), process_id=0, num_processes=2,
    )
    s1, f1 = run_batch_whole_registration(
        str(match_file), str(cloud_dir), capacity=4096,
        report_path=str(tmp_path / "w.txt"), process_id=1, num_processes=2,
    )
    assert s0 + f0 == 1 and s1 + f1 == 1
    assert os.path.exists(tmp_path / "w.txt.shard0")
    assert os.path.exists(tmp_path / "w.txt.shard1")
