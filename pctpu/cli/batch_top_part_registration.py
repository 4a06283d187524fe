"""CLI: batch_top_part_registration — argv contract of
/root/reference/BatchTopPartRegistration.cpp:311-321
(``batch_top_part_registration <match_result.txt> <point_cloud_dir>``)."""

import sys

from pctpu.cli._common import split_args, usage_exit
from pctpu.pipelines.registration import run_batch_top_part_registration


def main(argv=None) -> int:
    pos, kw = split_args(sys.argv[1:] if argv is None else argv)
    if len(pos) < 2:
        usage_exit(
            "Usage: batch_top_part_registration <match_result.txt> <point_cloud_dir>"
        )
    capacity = kw.get("capacity")
    nproc = int(kw["num_processes"]) if "num_processes" in kw else None
    pid = int(kw["process_id"]) if "process_id" in kw else None
    if nproc is not None and nproc > 1 and "coordinator" in kw:
        from pctpu.parallel.distributed import initialize

        initialize(kw["coordinator"], nproc, pid)
    run_batch_top_part_registration(
        pos[0],
        pos[1],
        report_path=kw.get("report", "./icp_precision_report.txt"),
        flat_cap=int(kw.get("flat_cap", "32768")),
        capacity=int(capacity) if capacity else None,
        pair_batch=int(kw.get("pair_batch", "1")),
        devices=int(kw["devices"]) if "devices" in kw else None,
        process_id=pid,
        num_processes=nproc,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
