"""Closed experiment: sort-based last-wins ordering vs segment_max+gather.

VERDICT r3 item 3: the general (non-grid-ordered) preprocess path pays the
~0.94 ms ordering kernel (docs/PERFORMANCE.md "Ordering as ONE packed (P,8)
scatter-set").  Candidate: replace the idx-valued ``segment_max`` with two
stable 2-operand sorts —

1. prepend one sentinel entry per output cell (idx = -1) and stable-sort
   (cell, idx) by cell: within each cell's run the LAST entry is the
   reference's last-wins winner (/root/reference/BatchMultiBevGen.cpp:94-117
   overwrites in input order; stable sort preserves it);
2. compaction sort: run-last entries keep their cell as key, everything else
   keys to ``grid_size`` — the first ``grid_size`` outputs are then the
   winner indices in cell order (every cell has its sentinel, so exactly one
   run-last per cell).

The final packed (P, 8) row gather is shared with the incumbent.  Priors
from the measured v5e primitive costs (sort 0.32 ms/133k for 2 operands vs
the incumbent's 0.94 ms TOTAL) say the two (P+G)-length sorts + gather
should land near ~2.2 ms — this script exists to measure it honestly and
close the question either way.

Run on the real chip: ``python scripts/exp_sort_ordering.py``
(one JSON line: ms/cloud for both kernels + bit-equality verdict).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pctpu.cloud import Cloud
from pctpu.config import SensorParams, get_sensor_params
from pctpu.ops.ordering import get_ordered_cloud

BATCH = 8


def get_ordered_cloud_sort(cloud: Cloud, params: SensorParams) -> Cloud:
    """Sort-based last-wins ordering candidate (see module docstring).
    Bit-identical to ``get_ordered_cloud`` by construction; the equality is
    asserted on device below."""
    g = params.grid_size
    p = cloud.capacity
    in_bounds = (
        (cloud.row >= 0)
        & (cloud.row < params.n_scan)
        & (cloud.col >= 0)
        & (cloud.col < params.horizon_scan)
        & cloud.valid_mask()
    )
    cell = cloud.row * params.horizon_scan + cloud.col
    cell = jnp.where(in_bounds, cell, g).astype(jnp.int32)

    # sentinels first: stable sort then keeps each cell's sentinel ahead of
    # its real points, so a sentinel only wins when the cell is empty
    keys = jnp.concatenate([jnp.arange(g, dtype=jnp.int32), cell])
    idxs = jnp.concatenate(
        [jnp.full((g,), -1, jnp.int32), jnp.arange(p, dtype=jnp.int32)]
    )
    sk, si = jax.lax.sort((keys, idxs), num_keys=1, is_stable=True)
    is_last = jnp.concatenate(
        [sk[:-1] != sk[1:], jnp.ones((1,), bool)]
    )
    ck = jnp.where(is_last & (sk < g), sk, g)
    _, widx = jax.lax.sort((ck, si), num_keys=1, is_stable=True)
    winner = widx[:g]
    occupied = winner >= 0
    src = jnp.where(occupied, winner, 0)

    packed = jnp.concatenate(
        [
            jax.lax.bitcast_convert_type(cloud.xyz, jnp.int32),
            jax.lax.bitcast_convert_type(cloud.intensity, jnp.int32)[:, None],
            cloud.row[:, None],
            cloud.col[:, None],
            jax.lax.bitcast_convert_type(cloud.t, jnp.int32)[:, None],
            cloud.label[:, None],
        ],
        axis=1,
    )
    taken = jnp.where(occupied[:, None], packed[src], 0)
    return Cloud(
        xyz=jax.lax.bitcast_convert_type(taken[:, 0:3], jnp.float32),
        intensity=jax.lax.bitcast_convert_type(taken[:, 3], jnp.float32),
        row=taken[:, 4],
        col=taken[:, 5],
        t=jax.lax.bitcast_convert_type(taken[:, 6], jnp.uint32),
        label=taken[:, 7],
        count=jnp.asarray(g, jnp.int32),
    )


def _time_kernel(fn, stacked, params):
    """ms/cloud of vmapped ``fn`` using bench.py's scan methodology
    (amortize inside one dispatch, perturb values, time to checksum fetch,
    subtract the measured dispatch+fetch roundtrip)."""
    k_stack = int(stacked.xyz.shape[0])
    reps = 8

    @jax.jit
    def run(batches, offset):
        def one(batch, rep):
            b = batch.replace(
                xyz=batch.xyz * (1.0 + jnp.float32(1e-7) * (rep + offset))
            )
            out = jax.vmap(lambda c: fn(c, params))(b)
            return (
                jnp.sum(jax.lax.bitcast_convert_type(out.xyz, jnp.int32))
                + jnp.sum(out.label)
                + jnp.sum(out.row)
            )

        def scan_body(carry, batch):
            def rep_body(r, acc):
                return acc + one(batch, r)

            return carry + jax.lax.fori_loop(0, reps, rep_body, jnp.int32(0)), None

        total, _ = jax.lax.scan(scan_body, jnp.int32(0), batches)
        return total

    @jax.jit
    def _trivial(x):
        return x + 1

    int(_trivial(jnp.int32(0)))
    lats = []
    for i in range(3):
        t0 = time.perf_counter()
        int(_trivial(jnp.int32(i + 1)))
        lats.append(time.perf_counter() - t0)
    latency = sorted(lats)[1]

    int(run(stacked, jnp.float32(0.0)))  # warm/compile
    dt = float("inf")
    for k in range(3):
        t0 = time.perf_counter()
        checksum = int(run(stacked, jnp.float32(1000.0 * (k + 1))))
        dt = min(dt, time.perf_counter() - t0)
        assert checksum != 0
    return max(dt - latency, 1e-6) * 1000.0 / (k_stack * reps * BATCH)


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import N_POINTS, synth_batch

    params = get_sensor_params("HDL_64E")
    n_points = min(N_POINTS, int(params.grid_size * 0.9))
    k_stack = 16
    stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[
            synth_batch(params, BATCH, n_points, seed, ordered=False)
            for seed in range(k_stack)
        ],
    )

    # bit-equality on one batch before timing anything
    batch0 = jax.tree.map(lambda x: x[0], stacked)
    a = jax.device_get(
        jax.jit(jax.vmap(lambda c: get_ordered_cloud(c, params)))(batch0)
    )
    b = jax.device_get(
        jax.jit(jax.vmap(lambda c: get_ordered_cloud_sort(c, params)))(batch0)
    )
    bit_equal = all(
        np.array_equal(
            np.ascontiguousarray(x).view(np.uint8),
            np.ascontiguousarray(y).view(np.uint8),
        )
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )

    ms_incumbent = _time_kernel(get_ordered_cloud, stacked, params)
    ms_sort = _time_kernel(get_ordered_cloud_sort, stacked, params)
    print(
        json.dumps(
            {
                "experiment": "sort_ordering",
                "bit_equal": bit_equal,
                "ms_per_cloud_segment_max_gather": round(ms_incumbent, 4),
                "ms_per_cloud_sort_based": round(ms_sort, 4),
                "winner": "sort" if ms_sort < ms_incumbent else "incumbent",
            }
        )
    )
    return 0 if bit_equal else 1


if __name__ == "__main__":
    sys.exit(main())
