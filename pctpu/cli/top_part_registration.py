"""CLI: top_part_registration — single-pair two-stage registration.

Mirrors /root/reference/TopPartRegistration.cpp:256-455 including the
per-stage ``[TIME]`` reports (:318-326); the interactive viewer is omitted
(headless)."""

import sys

import numpy as np

from pctpu.cli._common import split_args, usage_exit
from pctpu.io.pcd import load_cloud_pcd
from pctpu.pipelines.registration import register_pair
from pctpu.runtime.profiler import StageTimer
from pctpu.utils import logging as log


def main(argv=None) -> int:
    pos, kw = split_args(sys.argv[1:] if argv is None else argv)
    if len(pos) < 3:
        usage_exit("Usage: top_part_registration <pcd_1> <pcd_2> <yaw_guess_deg>")
    c1 = load_cloud_pcd(pos[0])
    c2 = load_cloud_pcd(pos[1])
    timer = StageTimer()
    best, fine = register_pair(
        c1, c2, float(pos[2]),
        flat_cap=int(kw.get("flat_cap", "32768")),
        timer=timer,
    )
    log.info(f"[TIME] 1st stage (top extraction + normals + coarse ICP x2): "
             f"{timer.totals_ms.get('coarse', 0.0)}ms. ")
    log.info(
        f"best coarse result: \nfitness score: {float(best.fitness)}\n"
        f"trans: \n{np.asarray(best.transform)}. "
    )
    log.info(f"[TIME] 2nd stage (fine 3D ICP): {timer.totals_ms.get('fine', 0.0)}ms. ")
    log.info(
        f"is icp converged: {bool(fine.converged)}, fitness score: "
        f"{float(fine.fitness)}, trans: \n{np.asarray(fine.transform)}. "
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
