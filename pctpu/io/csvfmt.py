"""OpenCV ``cv::Formatter FMT_CSV``-compatible matrix → CSV text.

The reference exports BEVs through ``cv::format(mat, FMT_CSV)`` with 4-digit
float precision (/root/reference/BatchCloudManip.cpp:227-229,
BatchMultiBevGen.cpp:371).  The exact byte format, verified against
libopencv_core (see tests/test_csvfmt.py):

  * float32/float64: ``%.4g`` per value (precision = set32fPrecision)
  * uint8:           ``%3d`` per value (width-3, right aligned)
  * int16/int32:     ``%d``
  * values joined by ``", "``; every row terminated by ``"\\n"`` —
    except single-row matrices, which get no trailing newline.
"""

from __future__ import annotations

import numpy as np


def _value_formatter(dtype: np.dtype, float_precision: int):
    if dtype == np.uint8 or dtype == np.int8:
        return lambda v: "%3d" % int(v)
    if dtype in (np.dtype(np.uint16), np.dtype(np.int16), np.dtype(np.int32)):
        return lambda v: "%d" % int(v)
    if dtype in (np.dtype(np.float32), np.dtype(np.float64)):
        fmt = f"%.{float_precision}g"
        return lambda v: fmt % float(v)
    raise TypeError(f"unsupported dtype for FMT_CSV: {dtype}")


def format_csv(mat: np.ndarray, float_precision: int = 4) -> str:
    """Render a 2-D matrix exactly like OpenCV FMT_CSV."""
    mat = np.asarray(mat)
    if mat.ndim != 2:
        raise ValueError(f"expected a 2-D matrix, got shape {mat.shape}")
    value = _value_formatter(mat.dtype, float_precision)
    rows = (", ".join(value(v) for v in row) for row in mat)
    if mat.shape[0] == 1:
        return next(rows)
    return "".join(r + "\n" for r in rows)


def write_csv(path: str, mat: np.ndarray, float_precision: int = 4) -> None:
    with open(path, "w") as f:
        f.write(format_csv(mat, float_precision))
