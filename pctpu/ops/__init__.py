from pctpu.ops.rounding import bev_cell, bev_cell_np, c_round, c_round_np, cv_saturate_u8

__all__ = [
    "bev_cell",
    "bev_cell_np",
    "c_round",
    "c_round_np",
    "cv_saturate_u8",
]
