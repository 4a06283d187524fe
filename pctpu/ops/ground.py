"""Ground marking: slope test per column + grid-average heights + rooftop veto.

Reproduces ``markGroundPoints`` (/root/reference/BatchMultiBevGen.cpp:119-252)
as three fused, fully-vectorized passes over the dense range image — no
per-column loops, no data-dependent control flow:

1. **Slope sweep** over the lowest ``ground_upper_scan`` rows.  For each swept
   cell the reference compares against the cell one ring up, falling back to
   col+2, col-2, then row-2 when the upper reading is missing
   (``intensity == -1``, :146-160).  The sequential bottom-up write pattern
   collapses to a closed form: a swept cell's mark is
   ``-1`` if its own pair is invalid, else ``1`` if its own slope test or the
   test of the cell below (which writes row-1 upward, :181) passed, else 0.
   The row just above the sweep can only be marked by the sweep's top row.
2. **Grid averages**: scatter-add of z over the 75×50 2-metre grid
   (:187-210) with the 0.01 count epsilon (:135-136).
3. **Rooftop veto + labeling**: un-mark cells >0.30 m above any 4-neighbor
   grid average; surviving marks set ``label = 0`` (:216-250).

Empty grid cells are all-zero points and participate exactly like in the
reference (zero coords pass the slope test, land in grid sector (37, 25)).

The col-2 fallback reproduces the C++ ``(col_idx - 2) % Horizon_SCAN`` which
is *negative* for col<2, so the flat index walks into the previous row —
we keep flat-index arithmetic to stay bit-compatible (:152-153).
"""

from __future__ import annotations

import jax.numpy as jnp

from pctpu.cloud import Cloud
from pctpu.config import GroundConfig, SensorParams


def _belonging_grid(x: jnp.ndarray, y: jnp.ndarray, cfg: GroundConfig):
    """Point → ground-grid sector (/root/reference/BatchMultiBevGen.h:73-99).

    The C++ computes floor((x + 75.0) / 2.0) in *double* on a float x.  With
    the default 2 m cells that is bit-exactly expressible in f32:
    x/2 is exact (power-of-two divide), and floor(t + 37.5) =
    floor(t) + 37 + (frac(t) >= 0.5) with an exact fraction — no f64 needed.
    """
    if cfg.cell_size == 2.0 and cfg.offset_x == 75.0 and cfg.offset_y == 50.0:
        tx = x * jnp.float32(0.5)
        fx = jnp.floor(tx)
        row = fx.astype(jnp.int32) + 37 + (tx - fx >= 0.5).astype(jnp.int32)
        col = jnp.floor(y * jnp.float32(0.5)).astype(jnp.int32) + 25
    else:
        row = jnp.floor((x + cfg.offset_x) / cfg.cell_size).astype(jnp.int32)
        col = jnp.floor((y + cfg.offset_y) / cfg.cell_size).astype(jnp.int32)
    row = jnp.clip(row, 0, cfg.grid_rows - 1)
    col = jnp.clip(col, 0, cfg.grid_cols - 1)
    return row, col


def mark_ground(
    ordered: Cloud,
    params: SensorParams,
    cfg: GroundConfig = GroundConfig(),
) -> tuple[Cloud, jnp.ndarray]:
    """Label ground points 0 in a dense ordered cloud.

    Returns (cloud with updated labels, ground_mat int8 (n_scan, horizon_scan))
    where ground_mat follows the reference encoding {-1 invalid, 0 no, 1 ground}.
    """
    n, h = params.n_scan, params.horizon_scan
    g = n * h
    x = ordered.xyz[:, 0]
    y = ordered.xyz[:, 1]
    z = ordered.xyz[:, 2]
    intensity = ordered.intensity

    # --- pass 1: slope test on the swept rows -----------------------------
    r_min = n - params.ground_upper_scan  # lowest row index swept
    rows = jnp.arange(r_min, n)  # (R,)
    cols = jnp.arange(h)  # (H,)
    rr = rows[:, None]  # (R, 1)
    cc = cols[None, :]  # (1, H)

    lower = rr * h + cc
    up = (rr - 1) * h + cc
    # fallback chain, each step re-reads intensity at the current candidate
    u1 = (rr - 1) * h + (cc + 2) % h
    up = jnp.where(intensity[up] == -1, u1, up)
    # C++ (col-2) % H is negative for col<2 → flat index walks backwards
    cpp_mod = jnp.where(cc >= 2, (cc - 2) % h, cc - 2)
    u2 = (rr - 1) * h + cpp_mod
    up = jnp.where(intensity[up] == -1, u2, up)
    u3 = (rr - 2) * h + cc
    up = jnp.where((intensity[up] == -1) & (rr >= 2), u3, up)

    invalid = (intensity[lower] == -1) | (intensity[up] == -1)

    dx = x[up] - x[lower]
    dy = y[up] - y[lower]
    dz = z[up] - z[lower]
    angle = jnp.degrees(jnp.arctan2(dz, jnp.sqrt(dx * dx + dy * dy)))
    slope_ok = (~invalid) & (jnp.abs(angle) <= cfg.slope_deg)

    # closed form of the sequential bottom-up writes (see module docstring)
    ground_from_below = jnp.zeros((n, h), bool)
    # cell (r-1, c) is marked when the test at (r, c) passes
    ground_from_below = ground_from_below.at[r_min - 1 : n - 1].set(slope_ok)
    mark = jnp.zeros((n, h), jnp.int8)
    mark = mark.at[r_min - 1 : n - 1].set(
        jnp.where(ground_from_below[r_min - 1 : n - 1], 1, 0).astype(jnp.int8)
    )
    swept_vals = jnp.where(
        invalid, jnp.int8(-1), jnp.where(slope_ok | ground_from_below[r_min:], 1, 0).astype(jnp.int8)
    )
    mark = mark.at[r_min:].set(swept_vals)

    ground1 = (mark == 1).reshape(g)

    # --- pass 2: grid-average ground heights ------------------------------
    srow, scol = _belonging_grid(x, y, cfg)
    sector = srow * cfg.grid_cols + scol
    nsec = cfg.grid_rows * cfg.grid_cols
    zsum = jnp.zeros((nsec,), jnp.float32).at[sector].add(jnp.where(ground1, z, 0.0))
    counts = jnp.full((nsec,), cfg.count_epsilon, jnp.float32).at[sector].add(
        jnp.where(ground1, 1.0, 0.0)
    )
    avg = (zsum / counts).reshape(cfg.grid_rows, cfg.grid_cols)

    # --- pass 3: rooftop veto + final labels ------------------------------
    srow2 = srow.reshape(n, h)
    scol2 = scol.reshape(n, h)
    z2 = z.reshape(n, h)
    veto = jnp.zeros((n, h), bool)
    for dr, dc in ((-1, 0), (0, 1), (0, -1), (1, 0)):  # setNeighbors order (:73-84)
        nr = srow2 + dr
        nc = scol2 + dc
        ok = (nr >= 0) & (nr < cfg.grid_rows) & (nc >= 0) & (nc < cfg.grid_cols)
        nbr_avg = avg[jnp.clip(nr, 0, cfg.grid_rows - 1), jnp.clip(nc, 0, cfg.grid_cols - 1)]
        # C++ compares the f32 difference against the double literal 0.30;
        # f32(0.30) > 0.30 in f64, so "diff > 0.30(f64)" ⟺ "diff >= f32(0.30)"
        veto |= ok & (z2 - nbr_avg >= jnp.float32(cfg.rooftop_margin))

    # the veto zeroes *any* cell, including -1 invalid ones (:236-240)
    mark = jnp.where(veto, jnp.int8(0), mark)
    is_ground = (mark == 1).reshape(g)
    label = jnp.where(is_ground, 0, ordered.label)
    return ordered.replace(label=label), mark
