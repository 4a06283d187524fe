"""CLI smoke tests: every entry point prints usage and exits 1 on missing
args (the reference binaries' behavior), and --key=value parsing works."""

import importlib

import pytest

ENTRY_POINTS = [
    "pctpu.cli.kitti_point_cloud_select",
    "pctpu.cli.mulran_point_cloud_select",
    "pctpu.cli.oxford_point_cloud_select",
    "pctpu.cli.batch_multi_bev_gen",
    "pctpu.cli.batch_cloud_manip",
    "pctpu.cli.cloud_manip",
    "pctpu.cli.top_part_registration",
    "pctpu.cli.batch_top_part_registration",
    "pctpu.cli.batch_whole_registration",
    "pctpu.cli.pointcloud_pca_test",
]


@pytest.mark.parametrize("module", ENTRY_POINTS)
def test_usage_exit_on_missing_args(module, capsys):
    main = importlib.import_module(module).main
    with pytest.raises(SystemExit) as exc:
        main([])
    assert exc.value.code == 1
    out = capsys.readouterr().out
    assert "Usage" in out or "usage" in out


def test_split_args():
    from pctpu.cli._common import split_args

    pos, kw = split_args(["a", "--resume", "b", "--batch-size=4", "--flat-cap=2048"])
    assert pos == ["a", "b"]
    assert kw == {"resume": "true", "batch_size": "4", "flat_cap": "2048"}
