"""Measure the DEVICE-SERIAL floor of the two-stage registration chain.

The pipelined stream's achieved rate (bench.py `measure_registration`)
mixes device compute with tunnel dispatch/fetch latency, and the
per-stage wall probes each pay their own dispatch overhead — their sum
(~34 ms/pair at the bench shapes) exceeds what the pipeline actually
achieves (~25 ms/pair), so neither number is the device floor.

This probe runs the FULL per-pair chain — flat prep, coarse two-guess
ICP, full-cloud voxel, fine ICP — at the bench shapes and the exact
production capacity buckets, `lax.scan`ned over many batches inside ONE
jitted program: one dispatch, one scalar fetch, so per-program overhead
amortizes to ~0.3 ms/pair and the wall time is device compute.  The
result is the honest single-chip ceiling the pipelined driver is chasing
(reference span: BatchTopPartRegistration.cpp:396-506).

Buckets are learned from one verified production batch first, so the
scanned chain runs the same programs production dispatches (speculation
hits steady-state on this scene).  The chain output is checksummed so
the fetch proves full execution (this runtime's block_until_ready does
not).

Usage: python scripts/probe_registration_floor.py [n_steps]
Prints one JSON line with ms/pair and the implied pairs/s ceiling.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def main() -> int:
    bench._wait_for_backend()
    import jax
    import jax.numpy as jnp

    from pctpu.config import RegistrationConfig
    from pctpu.pipelines import registration as R
    from pctpu.runtime.profiler import StageTimer

    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    n_pairs = 16  # the bench's batch size
    flat_cap = 32768

    cfg = RegistrationConfig()
    c1, c2 = bench.registration_scene()
    pairs = [
        (c1.replace(xyz=c1.xyz + i * 1e-4), c2, 17.0) for i in range(n_pairs)
    ]

    # learn the production buckets from one verified batch
    spec = R.BucketSpec()
    timer = StageTimer()
    c1b, c2b, best = R._coarse_stage_batched(
        pairs, cfg, flat_cap, timer, None, spec=spec
    )
    fine = R._fine_dispatch(c1b, c2b, best.transform, cfg, timer, spec=spec)
    float(np.asarray(fine.fitness[0]))  # force execution (value fetch)
    cb, fb = spec.coarse, spec.fine
    print(f"buckets: coarse={cb} fine={fb}", file=sys.stderr, flush=True)

    guesses = jnp.asarray(np.stack([R._guess_pair_np(17.0)] * n_pairs))

    def chain(c1x, c2x, gb):
        s, t, chk, _ = jax.vmap(
            lambda a, b: R._stage_flat(a, b, flat_cap, cfg.voxel_leaf)
        )(c1x, c2x)
        win = jax.vmap(
            lambda sx, sm, tx, tm, g: R._stage_coarse(sx, sm, tx, tm, g, cfg, cb)
        )(s[0], s[1], t[0], t[1], gb)
        a, b, chk2 = jax.vmap(
            lambda x, y: R._stage_voxel_full(x, y, cfg.voxel_leaf)
        )(c1x, c2x)
        fin = jax.vmap(
            lambda sx, sm, tx, tm, g: R._stage_fine(sx, sm, tx, tm, g, cfg, fb)
        )(a[0], a[1], b[0], b[1], win.transform)
        return (
            jnp.sum(fin.transform) + jnp.sum(fin.fitness)
            + jnp.sum(chk) + jnp.sum(chk2)
        )

    @jax.jit
    def scanned(cb1, cb2, gb, offs):
        def body(acc, off):
            # per-step input perturbation mirrors the wall bench's distinct
            # pair values (and keeps XLA from hoisting the chain out of the
            # scan as loop-invariant)
            return acc + chain(cb1.replace(xyz=cb1.xyz + off), cb2, gb), off

        acc, _ = jax.lax.scan(body, jnp.float32(0), offs)
        return acc

    offs = jnp.asarray(np.arange(1, n_steps + 1, dtype=np.float32) * 1e-4)
    t0 = time.perf_counter()
    float(scanned(c1b, c2b, guesses, offs))  # compile + first run
    compile_s = time.perf_counter() - t0
    # timed run on DIFFERENT offset values: this runtime value-caches
    # results for repeated identical inputs (see CLAUDE.md)
    t0 = time.perf_counter()
    chk = float(scanned(c1b, c2b, guesses, offs + 7e-3))
    dt = time.perf_counter() - t0
    ms_per_pair = dt * 1e3 / (n_steps * n_pairs)
    print(json.dumps({
        "ms_per_pair_device_serial": round(ms_per_pair, 3),
        "pairs_per_sec_ceiling": round(1e3 / ms_per_pair, 2),
        "n_steps": n_steps, "n_pairs": n_pairs,
        "bucket_coarse": cb, "bucket_fine": fb,
        "compile_s": round(compile_s, 1), "checksum": chk,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
