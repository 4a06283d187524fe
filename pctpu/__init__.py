"""pctpu — a TPU-native (JAX/XLA/Pallas) LiDAR point-cloud preprocessing
framework with the capabilities of soytony/Point-Cloud-Preprocessing-Tools.

Layers (see SURVEY.md §7):
  pctpu.cloud / pctpu.config    data model + typed configuration
  pctpu.geom                    SE(3) with reference euler/slerp semantics
  pctpu.io                      pcd/bin/csv/png, dataset ingest (host side)
  pctpu.ops                     jit-able kernels on fixed-size point batches
  pctpu.pipelines               batch drivers (host loop ↔ device kernels)
  pctpu.parallel                mesh/sharding utilities (pjit/shard_map)
  pctpu.runtime                 loaders, writers, profiling
  pctpu.cli                     the ten reference-compatible entry points
"""

from pctpu.cloud import Cloud, make_cloud
from pctpu.config import (
    GroundConfig,
    MultiBevConfig,
    RegistrationConfig,
    SensorParams,
    SingleBevConfig,
    get_sensor_params,
    parse_sensor_type,
)

__version__ = "0.1.0"

__all__ = [
    "Cloud",
    "make_cloud",
    "GroundConfig",
    "MultiBevConfig",
    "RegistrationConfig",
    "SensorParams",
    "SingleBevConfig",
    "get_sensor_params",
    "parse_sensor_type",
]
