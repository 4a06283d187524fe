"""Measured AsyncWriter overlap in run_multi_bev (VERDICT r4 item 1).

The pipeline's serial-sum [TIME] convention (device avg + write avg) is the
reference-comparable number; the tool's OWN end-to-end span overlaps the BEV
writes with device compute via the writer pool
(pctpu/runtime/writer.py).  This test measures that overlap instead of
asserting it: with writes stubbed to a fixed sleep (an IO-shaped cost the
GIL releases, like the native writers), the loop wall must sit near
max(device, writes/workers) — a serial-in-loop writer would add the FULL
write total to the wall.
"""

import os
import time

import numpy as np

import pctpu.pipelines.multi_bev as mb
from pctpu.config import SensorParams
from pctpu.geom.se3 import Pose6f
from pctpu.io.pcd import write_pcd
from pctpu.io.poses import format_pose_entry

# small custom sensor: full pipeline semantics, tiny compile/compute
PARAMS = SensorParams(n_scan=16, horizon_scan=128, ground_upper_scan=12,
                      height_res=0.25)


def _make_selected_tree(root: str, n: int) -> None:
    g = PARAMS.grid_size
    os.makedirs(os.path.join(root, "keyframe_point_cloud"))
    rng = np.random.default_rng(0)
    rows = (np.arange(g) // PARAMS.horizon_scan).astype(np.uint16)
    cols = (np.arange(g) % PARAMS.horizon_scan).astype(np.uint16)
    lines = []
    for i in range(n):
        r = rng.uniform(3, 60, g).astype(np.float32)
        az = rng.uniform(0, 2 * np.pi, g).astype(np.float32)
        write_pcd(
            os.path.join(root, "keyframe_point_cloud", f"{i:06d}.pcd"),
            {
                "x": r * np.cos(az),
                "y": r * np.sin(az),
                "z": rng.uniform(-2, 5, g).astype(np.float32),
                "intensity": rng.uniform(0.01, 1, g).astype(np.float32),
                "row": rows,
                "col": cols,
                "t": np.zeros(g, np.uint32),
                "label": np.full(g, -2, np.int16),
            },
            width=g,
        )
        lines.append(format_pose_entry(
            i, Pose6f.from_matrix(np.eye(3), np.array([3.0 * i, 0.0, 0.0]))
        ))
    with open(os.path.join(root, "keyframe_pose.csv"), "w") as f:
        f.writelines(lines)


def test_writes_overlap_device_loop(tmp_path, monkeypatch):
    n = 12
    sleep_s = 0.15
    root = str(tmp_path / "tree")
    _make_selected_tree(root, n)

    def slow_write(*args):
        # signature of mb._write_outputs; timer is the last positional
        time.sleep(sleep_s)
        args[-1].add("bev-write", sleep_s * 1e3)

    monkeypatch.setattr(mb, "_write_outputs", slow_write)
    out = mb.run_multi_bev(root, PARAMS, batch_size=2)
    assert out.num_clouds == n
    write_total_ms = n * sleep_s * 1e3
    device_total_ms = out.avg_device_ms_per_cloud * n
    # the loop wall also covers the (prefetch-overlapped) loads and thread
    # scheduling; a serial-in-loop writer would make this >= write_total
    visible_write_ms = out.loop_wall_ms - device_total_ms
    assert visible_write_ms < 0.65 * write_total_ms, (
        f"writes not overlapped: wall {out.loop_wall_ms:.0f} ms, device "
        f"{device_total_ms:.0f} ms, writes {write_total_ms:.0f} ms"
    )
    # and the serial-sum convention upper-bounds the measured span
    assert out.wall_ms_per_cloud < out.avg_ms_per_cloud
    # the serial-sum average still reports the full write cost
    assert abs(out.avg_bev_write_ms_per_cloud - sleep_s * 1e3) < 20.0


def test_measure_pipeline_span_plumbing(monkeypatch):
    """bench.measure_pipeline_span end-to-end on CPU with a tiny sensor:
    the published span keys exist and are mutually consistent."""
    import bench

    monkeypatch.setattr(bench, "BATCH", 2)
    out = bench.measure_pipeline_span(n_clouds=4, sensor=PARAMS)
    wall = out["pipeline_wall_ms_per_cloud"]
    assert wall > 0
    assert abs(out["pipeline_full_span_clouds_per_sec"] - 1000.0 / wall) < 0.01
    # the overlapped loop wall never exceeds the serial-sum convention by
    # more than loader/scheduling noise
    assert wall <= out["pipeline_serial_sum_ms_per_cloud"] * 1.25
    assert 0.0 <= out["pipeline_write_overlap_hidden_pct"] <= 100.0
    assert out["tunnel_transfer_ms_per_batch"] > 0
    assert out["pipeline_full_span_clouds_per_sec_pcie_estimate"] >= \
        out["pipeline_full_span_clouds_per_sec"]


def test_utilization_block_plumbing(monkeypatch):
    """bench.utilization_block on CPU with the tiny sensor: every stage row
    carries measured/bound/pct and the cross-check keys are consistent
    (VERDICT r4 item 9 — the block must exist mechanically, not as prose)."""
    import bench

    monkeypatch.setattr(bench, "BATCH", 2)
    out = bench.utilization_block(tol_cps=100.0, exact_cps=80.0, sensor=PARAMS)
    assert set(out["primitive_peaks"]) == {
        "sort_ns_per_elem_per_operand", "scatter_ns_per_update_row",
        "matmul_f32_highest_tmacs", "hbm_read_gbps",
    }
    assert all(v > 0 for v in out["primitive_peaks"].values())
    for name in ("fused_multi_single_bev", "mark_ground_bitexact",
                 "mark_ground_tolerance"):
        row = out["stages"][name]
        assert row["measured_ms_per_cloud"] > 0
        assert row["primitive_bound_ms"] > 0
        assert row["pct_of_primitive_peak"] > 0
    assert out["kernel_tolerance_ms_per_cloud"] == 10.0
    assert out["kernel_bitexact_ms_per_cloud"] == 12.5
    assert abs(
        out["stage_sum_vs_kernel"]
        - out["stage_sum_tolerance_ms"] / 10.0
    ) < 0.01


def test_ratio_interval_spans_host_spread():
    """bench._ratio_interval covers the session measurement AND the pinned
    historical host spread (VERDICT r4 item 4)."""
    import bench

    # session inside history: interval is exactly the historical band
    lo, hi = bench._ratio_interval(1000.0, 9.0, (7.47, 10.5))
    assert (lo, hi) == (7.47, 10.5)
    # session outside history widens the band on that side
    lo2, hi2 = bench._ratio_interval(1000.0, 12.0, (7.47, 10.5))
    assert (lo2, hi2) == (7.47, 12.0)
    lo3, _ = bench._ratio_interval(1000.0, 6.0, (7.47, 10.5))
    assert lo3 == 6.0
    # the point ratio always sits inside the interval
    for ms in (6.0, 9.0, 12.0):
        a, b = bench._ratio_interval(500.0, ms, (7.47, 10.5))
        assert a <= 500.0 * ms / 1000.0 <= b


def test_loop_wall_recorded_on_real_writes(tmp_path):
    root = str(tmp_path / "tree")
    _make_selected_tree(root, 3)
    out = mb.run_multi_bev(root, PARAMS, batch_size=2)
    assert out.num_clouds == 3
    assert out.loop_wall_ms > 0.0
    assert out.wall_ms_per_cloud == out.loop_wall_ms / 3
    # real artifacts landed
    assert sorted(os.listdir(os.path.join(root, "output_multi_bev", "binary"))) == [
        "000000.bin", "000001.bin", "000002.bin",
    ]
