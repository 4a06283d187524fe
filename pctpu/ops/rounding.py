"""Rounding primitives that reproduce the C/C++ semantics of the reference.

The reference's BEV/grid indexing uses C ``round()`` — round half away from
zero (e.g. /root/reference/BatchMultiBevGen.cpp:279-281) — while
``jnp.round``/``np.round`` are round-half-to-even.  Pixel-exact BEV parity
requires matching the C behavior at .5 boundaries, which the integer grid
arithmetic hits constantly (cell edges land exactly on .5 after the +0.5
offset).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def c_round(v: jnp.ndarray) -> jnp.ndarray:
    """C round(): half away from zero, as jnp (returns floating dtype)."""
    return jnp.where(v >= 0, jnp.floor(v + 0.5), jnp.ceil(v - 0.5))


def c_round_np(v: np.ndarray) -> np.ndarray:
    """C round(): half away from zero, numpy."""
    v = np.asarray(v)
    return np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5))


def cv_saturate_u8(v: np.ndarray) -> np.ndarray:
    """OpenCV ``saturate_cast<uchar>(float)``: rint (half-to-even) + clamp.

    Used when emulating cv::imwrite's CV_32F→CV_8U fallback for float BEV
    PNGs (/root/reference/BatchCloudManip.cpp:238 writes a CV_32F mat)."""
    return np.clip(np.rint(np.asarray(v)), 0, 255).astype(np.uint8)
