"""bench.main() wiring test: every measurement stubbed, the driver-facing
JSON line and bench_details.json must carry the round-5 keys (pipeline
span, ratio intervals, utilization) and stay emittable when the pipeline
span probe fails — the driver runs `python bench.py` unattended at round
end, so a wiring bug here loses the round's benchmark."""

import json

import pytest


@pytest.fixture
def stubbed_bench(monkeypatch, tmp_path):
    import bench

    monkeypatch.setattr(bench, "_wait_for_backend", lambda *a, **k: None)
    monkeypatch.setattr(
        bench, "measure_baseline",
        lambda full_span=False: 24.0 if full_span else 9.0,
    )
    monkeypatch.setattr(
        bench, "measure_tpu",
        lambda ordered=True, sensor="HDL_64E", n_points=None,
        compat="bitexact": 700.0 if compat == "bitexact" else 1200.0,
    )
    monkeypatch.setattr(bench, "measure_write_ms", lambda *a, **k: 3.0)
    monkeypatch.setattr(bench, "verify_on_device", lambda: "ok")
    monkeypatch.setattr(
        bench, "measure_pipeline_span",
        lambda *a, **k: {
            "pipeline_full_span_clouds_per_sec": 150.0,
            "pipeline_wall_ms_per_cloud": 6.67,
            "pipeline_device_ms_per_cloud_incl_transfers": 5.0,
            "pipeline_bev_write_ms_per_cloud": 3.0,
            "pipeline_serial_sum_ms_per_cloud": 8.0,
            "pipeline_write_overlap_hidden_pct": 44.0,
            "tunnel_transfer_ms_per_batch": 900.0,
            "tunnel_transfer_mb_per_batch": 55.0,
            "pipeline_full_span_clouds_per_sec_pcie_estimate": 200.0,
        },
    )
    monkeypatch.setattr(
        bench, "measure_registration",
        lambda return_stages=False, depth=1, **k:
        (40.0, {"fine": 18.0}) if return_stages else 40.0,
    )
    monkeypatch.setattr(
        bench, "measure_registration_baseline",
        lambda *a, **k: {"ms_per_pair": 65.0, "coarse_ms": 10.0,
                         "fine_ms": 55.0},
    )
    monkeypatch.setattr(
        bench, "utilization_block",
        lambda *a, **k: {"primitive_peaks": {}, "stages": {},
                         "substages_isolated": {},
                         "stage_sum_tolerance_ms": 0.6},
    )
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    return bench


def _run_main(bench, monkeypatch, capsys, argv):
    monkeypatch.setattr(bench.sys, "argv", argv)
    assert bench.main() == 0
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    return json.loads(lines[-1])


def test_main_json_line_keys(stubbed_bench, monkeypatch, capsys):
    out = _run_main(stubbed_bench, monkeypatch, capsys, ["bench.py"])
    assert out["metric"] == "hdl64e_multibev_clouds_per_sec"
    assert out["value"] == 1200.0
    assert out["unit"] == "clouds/s"
    # ratio intervals span the session + pinned-history baseline spread
    lo, hi = out["vs_baseline_interval"]
    assert lo <= out["vs_baseline"] <= hi
    lo_fs, hi_fs = out["vs_baseline_full_span_interval"]
    assert lo_fs <= out["vs_baseline_full_span"] <= hi_fs
    # the tool's own measured overlapped span rides the main line
    assert out["pipeline_full_span_clouds_per_sec"] == 150.0
    assert out["pipeline_write_overlap_hidden_pct"] == 44.0
    assert "pipeline_span_error" not in out


def test_main_survives_pipeline_span_failure(stubbed_bench, monkeypatch,
                                             capsys):
    def boom(*a, **k):
        raise RuntimeError("device wedged")

    monkeypatch.setattr(stubbed_bench, "measure_pipeline_span", boom)
    out = _run_main(stubbed_bench, monkeypatch, capsys, ["bench.py"])
    assert out["value"] == 1200.0  # headline survives
    assert out["pipeline_full_span_clouds_per_sec"] is None
    assert "device wedged" in out["pipeline_span_error"]


def test_main_details_block(stubbed_bench, monkeypatch, capsys, tmp_path):
    _run_main(stubbed_bench, monkeypatch, capsys, ["bench.py", "--details"])
    with open(tmp_path / "bench_details.json") as f:
        det = json.load(f)
    for key in (
        "pipeline_full_span_clouds_per_sec", "vs_baseline_interval",
        "vs_baseline_full_span_interval", "baseline_ms_spread",
        "utilization", "registration_vs_baseline",
        "full_span_clouds_per_sec_tolerance",
    ):
        assert key in det, key
    assert det["utilization"]["stage_sum_tolerance_ms"] == 0.6
    lo, hi = det["baseline_ms_spread"]
    assert lo <= 9.0 <= hi
