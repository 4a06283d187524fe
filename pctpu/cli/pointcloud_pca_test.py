"""CLI: pointcloud_pca_test — argv contract of /root/reference/main.cpp:50-57
(``pointcloud_pca_test <pcd>``); prints eigenvalues/vectors instead of the
interactive arrow viewer."""

import sys

import numpy as np

from pctpu.cli._common import split_args, usage_exit
from pctpu.io.pcd import load_cloud_pcd
from pctpu.ops.pca import pca_test


def main(argv=None) -> int:
    pos, _ = split_args(sys.argv[1:] if argv is None else argv)
    if len(pos) < 1:
        usage_exit("Usage: pointcloud_pca_test <pcd>")
    cloud = load_cloud_pcd(pos[0])
    mu, vals, vecs, kept = pca_test(cloud)
    print(f"cloud_in: {int(cloud.count)}, filter: {int(kept)}")
    print(np.asarray(vals))
    print(np.asarray(vecs))
    return 0


if __name__ == "__main__":
    sys.exit(main())
