"""CLI: pointcloud_pca_test — argv contract of /root/reference/main.cpp:50-57
(``pointcloud_pca_test <pcd>``); prints eigenvalues/vectors.
``--snapshot=out.png`` writes a headless render of the reference's arrow
viewer (filtered cloud red on white, principal-axis arrows eigvec×200 from
the centroid colored blue/green/red, /root/reference/main.cpp:100-135);
``--html=out.html`` writes the same scene as a standalone interactive
WebGL viewer."""

import sys

import numpy as np

from pctpu.cli._common import path_kw, split_args, usage_exit
from pctpu.io.pcd import load_cloud_pcd
from pctpu.ops.pca import pca3d, pca_test_filter


def main(argv=None) -> int:
    pos, kw = split_args(sys.argv[1:] if argv is None else argv)
    if len(pos) < 1:
        usage_exit("Usage: pointcloud_pca_test <pcd>")
    cloud = load_cloud_pcd(pos[0])
    # one filter pass feeds both the PCA and the optional snapshot
    xyz, keep = pca_test_filter(cloud)
    mu, vals, vecs = pca3d(xyz, keep)
    kept = int(np.asarray(keep).sum())
    print(f"cloud_in: {int(cloud.count)}, filter: {kept}")
    print(np.asarray(vals))
    print(np.asarray(vecs))

    snapshot = path_kw(kw, "snapshot")
    if snapshot:
        from pctpu.io.png import write_rgb_png
        from pctpu.ops.render import Layer, render_snapshot, segment_points

        c = np.asarray(mu)
        v = np.asarray(vecs)  # eigenvectors ascending, columns like Eigen
        tips = [c + 200.0 * v[:, i] for i in range(3)]
        # arrow colors follow the reference: col0 blue, col1 green, col2 red
        layers = [
            Layer(np.asarray(xyz), (255, 0, 0), mask=np.asarray(keep)),
            Layer(segment_points(c[None], tips[0][None]), (0, 0, 255)),
            Layer(segment_points(c[None], tips[1][None]), (0, 255, 0)),
            Layer(segment_points(c[None], tips[2][None]), (255, 0, 0)),
        ]
        img = render_snapshot(
            layers, view=kw.get("snapshot_view", "top"),
            background=(255, 255, 255),
        )
        write_rgb_png(snapshot, img)

    html = path_kw(kw, "html")
    if html:
        from pctpu.io.html_viewer import write_pca_test_html

        write_pca_test_html(
            html, np.asarray(xyz), np.asarray(keep), np.asarray(mu),
            np.asarray(vecs),
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
