"""CLI: cloud_manip — argv contract of /root/reference/CloudManip.cpp:111-161
(``cloud_manip <pcd> tx ty tz yaw_deg``).  ``--snapshot=out.png`` writes a
headless render of the viewer scene (input red, output green,
CloudManip.cpp:143-158); ``--snapshot-view=front`` for the elevation view;
``--html=out.html`` writes the same scene as a standalone interactive
WebGL viewer (pctpu.io.html_viewer)."""

import math
import sys

from pctpu.cli._common import path_kw, split_args, usage_exit
from pctpu.pipelines.cloud_manip import run_cloud_manip


def main(argv=None) -> int:
    pos, kw = split_args(sys.argv[1:] if argv is None else argv)
    if len(pos) < 5:
        usage_exit("Usage: cloud_manip <pcd> tx ty tz yaw_deg")
    print(f"rotating yaw radiance: {float(pos[4]) / 180.0 * math.pi}")
    run_cloud_manip(
        pos[0],
        float(pos[1]),
        float(pos[2]),
        float(pos[3]),
        float(pos[4]),
        output_dir=kw.get("output_dir", "."),
        snapshot=path_kw(kw, "snapshot"),
        snapshot_view=kw.get("snapshot_view", "top"),
        html=path_kw(kw, "html"),
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
