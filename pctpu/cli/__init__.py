"""The ten reference-compatible CLI entry points (SURVEY.md §2.3).

Each module's argv contract matches the corresponding reference binary:

  python -m pctpu.cli.kitti_point_cloud_select  <dataset_root> [interval]
  python -m pctpu.cli.mulran_point_cloud_select <dataset_root> [interval]
  python -m pctpu.cli.oxford_point_cloud_select <dataset_root> [interval]
  python -m pctpu.cli.batch_multi_bev_gen       <keyframes_root> <sensor_type>
  python -m pctpu.cli.batch_cloud_manip         <keyframes_root>
  python -m pctpu.cli.cloud_manip               <pcd> tx ty tz yaw_deg
  python -m pctpu.cli.top_part_registration     <pcd1> <pcd2> yaw_guess
  python -m pctpu.cli.batch_top_part_registration  <match_result.txt> <cloud_dir>
  python -m pctpu.cli.batch_whole_registration     <match_result.txt> <cloud_dir>
  python -m pctpu.cli.pointcloud_pca_test       <pcd>

Extra keyword-style flags (--resume, --batch-size) extend the reference
contract without breaking it.
"""
