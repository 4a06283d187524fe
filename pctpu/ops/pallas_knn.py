"""Pallas TPU kernel: fused 1-NN (distance matmul + running argmin).

The registration hot op is, per ICP iteration, a (Q, T) squared-distance
problem.  The jnp path (ops/knn.py) materializes per-tile distance blocks
through XLA; this kernel keeps everything in VMEM: per (q-tile, t-tile) grid
step it computes the cross term on the MXU and folds it into a running
(min, argmin) accumulator, so the (Q, T) matrix never exists anywhere.

Layout: points are staged as (8, N) planes — rows 0..2 the coordinates,
row 3 the squared norm (+big for masked targets), rows 4..7 zero — so the
MXU contraction runs over a padded K=8 and every block is lane-aligned.  For
the argmin it suffices to minimize |t|² − 2·q·t (the |q|² term is constant
per query row); the exact distance of the winner is re-derived at the end.

Reference equivalents: pcl::search::KdTree 1-NN inside ICP correspondence
estimation (/root/reference/BatchTopPartRegistration.cpp:199-239) and
nanoflann queries (/root/reference/BatchMultiBevGen.cpp:534-613).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pallas TPU lowering is only exercised on TPU; CPU uses interpret mode
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_AVAILABLE = True
except Exception:  # pragma: no cover
    PALLAS_AVAILABLE = False

_BIG = 3e38  # python float: a jnp constant would be captured by the kernel


def _nn_kernel(q_ref, t_ref, val_ref, idx_ref):
    j = pl.program_id(1)
    tt = t_ref.shape[1]

    @pl.when(j == 0)
    def _():
        val_ref[:] = jnp.full_like(val_ref, jnp.float32(_BIG))
        idx_ref[:] = jnp.zeros_like(idx_ref)

    # cross(i, j) = Σ_k q[k, i] · t[k, j] — MXU contraction over padded K=8
    cross = jax.lax.dot_general(
        q_ref[:],
        t_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # full-f32 MXU passes
    )  # (TQ, TT)
    score = t_ref[3, :][None, :] - 2.0 * cross
    local_best = jnp.min(score, axis=1)
    local_arg = jnp.argmin(score, axis=1).astype(jnp.int32) + j * tt

    better = local_best < val_ref[0, :]
    val_ref[0, :] = jnp.where(better, local_best, val_ref[0, :])
    idx_ref[0, :] = jnp.where(better, local_arg, idx_ref[0, :])


def _plane_layout(xyz: jnp.ndarray, mask: jnp.ndarray, n_pad: int, with_sq: bool):
    """(N,3)+(N,) → (8, n_pad) planes [x, y, z, row3, 0…].

    Row 3 carries |p|² (+big when masked) for *targets* only — query planes
    keep it zero so the K=8 contraction sums coordinates alone.
    """
    n = xyz.shape[0]
    planes = jnp.zeros((8, n_pad), jnp.float32)
    planes = planes.at[0, :n].set(xyz[:, 0])
    planes = planes.at[1, :n].set(xyz[:, 1])
    planes = planes.at[2, :n].set(xyz[:, 2])
    if with_sq:
        sq = jnp.where(mask, jnp.sum(xyz * xyz, axis=1), _BIG)
        planes = planes.at[3, :n].set(sq)
        if n < n_pad:
            planes = planes.at[3, n:].set(_BIG)
    return planes


@functools.partial(jax.jit, static_argnames=("tq", "tt", "interpret"))
def pallas_nn_1(
    query: jnp.ndarray,
    query_mask: jnp.ndarray,
    target: jnp.ndarray,
    target_mask: jnp.ndarray,
    tq: int = 256,
    tt: int = 2048,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in fused variant of ops.knn.nn_1 (TPU; interpret=True elsewhere)."""
    qn = query.shape[0]
    tn = target.shape[0]
    qp = -(-qn // tq) * tq
    tp = -(-tn // tt) * tt
    q_planes = _plane_layout(query, query_mask, qp, with_sq=False)
    t_planes = _plane_layout(target, target_mask, tp, with_sq=True)

    grid = (qp // tq, tp // tt)
    val, idx = pl.pallas_call(
        _nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, tq), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tt), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tq), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, qp), jnp.float32),
            jax.ShapeDtypeStruct((1, qp), jnp.int32),
        ],
        interpret=interpret,
    )(q_planes, t_planes)

    idx = idx[0, :qn]
    idx = jnp.clip(idx, 0, tn - 1)
    diff = query - target[idx]
    d2 = jnp.sum(diff * diff, axis=1)
    d2 = jnp.where(query_mask & target_mask[idx], d2, jnp.inf)
    return idx, d2
