"""CLI: batch_cloud_manip — argv contract of
/root/reference/BatchCloudManip.cpp:269-274 (``batch_cloud_manip <root>``)."""

import sys

from pctpu.cli._common import int_kw, split_args, usage_exit
from pctpu.pipelines.batch_cloud_manip import run_batch_cloud_manip


def main(argv=None) -> int:
    pos, kw = split_args(sys.argv[1:] if argv is None else argv)
    if len(pos) < 1:
        usage_exit("Usage: batch_cloud_manip <keyframes_root_dir>")
    run_batch_cloud_manip(
        pos[0],
        batch_size=int_kw(kw, "batch_size", 8),
        resume=kw.get("resume", "false") == "true",
        compat=kw.get("compat", "bitexact"),
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
