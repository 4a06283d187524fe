from pctpu.ops.rounding import c_round, c_round_np, cv_saturate_u8

__all__ = ["c_round", "c_round_np", "cv_saturate_u8"]
