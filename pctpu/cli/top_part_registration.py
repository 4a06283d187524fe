"""CLI: top_part_registration — single-pair two-stage registration.

The reference binary (/root/reference/TopPartRegistration.cpp:256-455) takes
two pcds + a yaw guess, runs the same two-stage pipeline as the batch tool,
prints results, and opens a viewer (omitted here — headless)."""

import sys

import numpy as np

from pctpu.cli._common import split_args, usage_exit
from pctpu.io.pcd import load_cloud_pcd
from pctpu.pipelines.registration import register_pair
from pctpu.utils import logging as log


def main(argv=None) -> int:
    pos, kw = split_args(sys.argv[1:] if argv is None else argv)
    if len(pos) < 3:
        usage_exit("Usage: top_part_registration <pcd_1> <pcd_2> <yaw_guess_deg>")
    c1 = load_cloud_pcd(pos[0])
    c2 = load_cloud_pcd(pos[1])
    best, fine = register_pair(c1, c2, float(pos[2]))
    log.info(
        f"best coarse result: \nfitness score: {float(best.fitness)}\n"
        f"trans: \n{np.asarray(best.transform)}. "
    )
    log.info(
        f"is icp converged: {bool(fine.converged)}, fitness score: "
        f"{float(fine.fitness)}, trans: \n{np.asarray(fine.transform)}. "
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
