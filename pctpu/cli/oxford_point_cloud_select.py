"""CLI: oxford_point_cloud_select — argv contract of
/root/reference/OxfordPointCloudSelect.cpp:331-376."""

import sys

from pctpu.cli._common import split_args, usage_exit
from pctpu.pipelines.selectors import run_oxford_select

USAGE = """\
Usage: oxford_point_cloud_select [dataset_root_dir] [keyframe_dist_interval](default=2)

[dataset_root_dir] should be organized as follows:
[dataset_root_dir]
├ velodyne_left/
├ velodyne_left.timestamps
└ gps/ins.csv
"""


def main(argv=None) -> int:
    pos, kw = split_args(sys.argv[1:] if argv is None else argv)
    if len(pos) < 1:
        usage_exit(USAGE)
    interval = float(pos[1]) if len(pos) > 1 else 2.0
    run_oxford_select(pos[0], interval, resume=kw.get("resume", "false") == "true")
    return 0


if __name__ == "__main__":
    sys.exit(main())
