"""Benchmark: HDL-64E multi-BEV preprocessing throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "clouds/s", "vs_baseline": N}

The baseline is self-measured (the reference publishes no numbers,
BASELINE.md): a single-core C++ re-implementation of the same per-point
algorithm (native/baseline_bev.cpp) is built and timed on this machine, and
vs_baseline = TPU clouds/s ÷ single-core clouds/s.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))

N_POINTS = 120_000
BATCH = 8
WARMUP_BATCHES = 2
BENCH_BATCHES = 6
BASELINE_CLOUDS = 10

# Pinned historical spread of the compute-only C++ baseline on this shared
# host (best-of-3 per session, rounds 2-4 + quiet-box re-bench — see
# docs/PERFORMANCE.md "Baseline volatility"): the ratio's error bar is the
# HOST, not either code base, so every emitted vs_baseline carries an
# interval built from this spread union the current session's measurement.
BASELINE_HIST_MS = (7.47, 10.5)
# same, for the full-span baseline (compute + in-[TIME] artifact writes):
# round-4 driver capture 20.7 ms (48.3 clouds/s) vs loaded-box 24.2 ms
BASELINE_SPAN_HIST_MS = (20.7, 24.2)


def _ratio_interval(pctpu_cps: float, session_ms: float,
                    hist_ms: tuple) -> list:
    """[min, max] of pctpu_cps / baseline_cps over the union of this
    session's baseline measurement and the pinned historical spread —
    the host's measured volatility, not either code base's (VERDICT r4
    item 4).  ratio = pctpu_cps * baseline_ms / 1000."""
    lo_ms = min(session_ms, hist_ms[0])
    hi_ms = max(session_ms, hist_ms[1])
    return [round(pctpu_cps * lo_ms / 1000.0, 3),
            round(pctpu_cps * hi_ms / 1000.0, 3)]


def measure_baseline(full_span: bool = False) -> float:
    """Single-core C++ ms/cloud (same algorithm, per-point loops).

    ``full_span=True`` matches the reference's actual [TIME] bracket
    (/root/reference/BatchMultiBevGen.cpp:731-749): the timed loop then also
    performs the in-span artifact writes — layer-major .bin, per-cloud
    mkdir, 24+1 PNGs (cv::imwrite-default encoder: SUB filter, zlib level 1,
    Z_RLE), and the FMT_CSV.  ``full_span=False`` is the compute-only span
    (stronger baseline — faster than the real reference)."""
    exe = os.path.join(REPO, "native", "baseline_bev")
    src = os.path.join(REPO, "native", "baseline_bev.cpp")
    stale = os.path.exists(src) and (
        not os.path.exists(exe)
        or os.path.getmtime(exe) < os.path.getmtime(src)
    )
    if stale:
        # atomic publish (see runtime/native_io.py): parallel bench runs
        # must not exec a half-written binary
        tmp = f"{exe}.build.{os.getpid()}"
        subprocess.run(
            ["g++", "-O2", "-std=c++14", "-o", tmp, src, "-lz"],
            check=True,
            cwd=REPO,
        )
        os.replace(tmp, exe)
    # best of 3 to resist host-load noise (single shared CPU core)
    import shutil
    import tempfile

    best = float("inf")
    for _ in range(3):
        argv = [exe, str(BASELINE_CLOUDS), str(N_POINTS)]
        io_dir = None
        if full_span:
            io_dir = tempfile.mkdtemp(prefix="pctpu_baseline_span_")
            argv.append(io_dir)
        try:
            out = subprocess.run(
                argv, check=True, capture_output=True, text=True
            ).stdout
        finally:
            if io_dir is not None:
                shutil.rmtree(io_dir, ignore_errors=True)
        best = min(best, float(json.loads(out)["ms_per_cloud"]))
    return best


def _wait_for_backend(max_wait_s: float | None = None,
                      probe_timeout_s: float = 120.0) -> None:
    """Ride out transient TPU-backend unavailability before benching.

    The tunneled axon TPU occasionally refuses backend initialization for
    tens of minutes (claim contention on the shared chip): ``jax.devices()``
    blocks and finally raises "Unable to initialize backend 'axon'".  A
    bench launched into that window would crash and the round would record
    no measurement.  Probe the backend in short-lived subprocesses (a hung
    in-process init cannot be retried — the failure is memoized) until it
    answers or the budget runs out, then proceed either way.
    """
    if os.environ.get("JAX_PLATFORMS", "").lower() in ("", "cpu"):
        return  # CPU backend can't be claim-blocked
    if max_wait_s is None:
        max_wait_s = float(os.environ.get("PCTPU_BENCH_BACKEND_WAIT_S", 1800))
    deadline = time.monotonic() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout_s, capture_output=True,
            )
            if r.returncode == 0:
                if attempt > 1:
                    print(f"bench: TPU backend up after {attempt} probes",
                          file=sys.stderr)
                return
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() >= deadline:
            print(
                f"bench: TPU backend still unavailable after {attempt} "
                "probes; attempting the measurement anyway",
                file=sys.stderr,
            )
            return
        time.sleep(60.0)


def synth_batch(params, batch: int, n_points: int, seed: int, ordered: bool = False):
    """Synthetic clouds.  ``ordered=True`` emits the selector-tool layout the
    production pipeline actually consumes (dense grid, slot = row*H + col,
    empty slots all-zero with label 0) — the fast path of preprocess_batch;
    ``ordered=False`` emits random row/col placement (the general path)."""
    import jax.numpy as jnp

    from pctpu.cloud import Cloud

    rng = np.random.default_rng(seed)
    g = params.grid_size
    rangev = rng.uniform(3, 100, (batch, g)).astype(np.float32)
    az = rng.uniform(0, 2 * np.pi, (batch, g)).astype(np.float32)
    ground = rng.random((batch, g)) < 0.5
    z = np.where(
        ground,
        rng.uniform(-2.0, -1.8, (batch, g)),
        rng.uniform(-1.0, 6.0, (batch, g)),
    ).astype(np.float32)
    xyz = np.stack([rangev * np.cos(az), rangev * np.sin(az), z], axis=-1)
    if ordered:
        mask = rng.random((batch, g)) < (n_points / g)
        slot = np.arange(g)
        row = np.broadcast_to(slot // params.horizon_scan, (batch, g)).astype(np.int32)
        col = np.broadcast_to(slot % params.horizon_scan, (batch, g)).astype(np.int32)
        count = np.full((batch,), g, np.int32)
        intensity = np.maximum(rng.random((batch, g)).astype(np.float32), 1e-3)
    else:
        mask = np.broadcast_to(np.arange(g)[None, :] < n_points, (batch, g))
        row = rng.integers(0, params.n_scan, (batch, g)).astype(np.int32)
        col = rng.integers(0, params.horizon_scan, (batch, g)).astype(np.int32)
        count = np.full((batch,), n_points, np.int32)
        intensity = rng.random((batch, g)).astype(np.float32)
    return Cloud(
        xyz=jnp.asarray(xyz * mask[..., None]),
        intensity=jnp.asarray(intensity * mask),
        row=jnp.asarray(row * mask),
        col=jnp.asarray(col * mask),
        t=jnp.zeros((batch, g), jnp.uint32),
        label=jnp.asarray(np.where(mask, -2, 0).astype(np.int32)),
        count=jnp.asarray(count),
    )


def measure_tpu(ordered: bool = True, sensor: str = "HDL_64E",
                n_points: int | None = None, compat: str = "bitexact") -> float:
    """Sustained on-device clouds/sec of the fused preprocess+BEV kernel.

    One dispatch runs ``K_STACK`` distinct batches × ``REPS`` perturbed
    repetitions inside a jitted scan, with outputs checksummed on device —
    robust against host↔device tunnel latency and any per-(program, value)
    result caching in the runtime, and fair vs the baseline (which also
    excludes IO).

    ``ordered=True`` is the production path: BatchMultiBevGen's documented
    input is the selector tools' dense-grid PCDs (README.md:23-30), which the
    pipeline detects host-side (is_grid_ordered) and preprocesses without the
    ordering scatter.  ``ordered=False`` measures the general path (arbitrary
    row/col placement).  The C++ baseline runs its ordering loop either way.
    """
    import jax
    import jax.numpy as jnp

    from pctpu.config import get_sensor_params
    from pctpu.ops.preprocess import preprocess_batch

    params = get_sensor_params(sensor)
    if n_points is None:
        n_points = min(N_POINTS, int(params.grid_size * 0.9))
    k_stack, reps = 16, 8  # higher rep counts can exceed tunnel deadlines
    stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[
            synth_batch(params, BATCH, n_points, seed, ordered=ordered)
            for seed in range(k_stack)
        ],
    )

    @jax.jit
    def run(batches, offset):
        def one(batch, rep):
            # perturb so no two executions see identical values —
            # multiplicatively, so empty grid slots stay bit-zero and the
            # ordered clouds keep satisfying the assume_ordered precondition
            b = batch.replace(
                xyz=batch.xyz * (1.0 + jnp.float32(1e-7) * (rep + offset))
            )
            labeled, multi, single = preprocess_batch(
                b, params, assume_ordered=ordered, compat=compat
            )
            return (
                jnp.sum(multi, dtype=jnp.int32)
                + jnp.sum(single, dtype=jnp.int32)
                + jnp.sum(labeled.label)
            )

        def scan_body(carry, batch):
            def rep_body(r, acc):
                return acc + one(batch, r)

            return carry + jax.lax.fori_loop(0, reps, rep_body, jnp.int32(0)), None

        total, _ = jax.lax.scan(scan_body, jnp.int32(0), batches)
        return total

    # warm/compile with one offset, time a dispatch with a different offset so
    # no (program, value) pair repeats.  Timing ends when the checksum VALUE
    # reaches the host — on tunneled runtimes block_until_ready alone does
    # not guarantee execution finished.  The dispatch+fetch roundtrip latency
    # is measured separately and subtracted.
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

    int(run(stacked, jnp.float32(0.0)))
    # best of 3 timed dispatches (distinct offsets so no (program, value)
    # pair repeats): the shared chip sees transient co-tenant contention that
    # can depress a single dispatch ~25%, and the C++ baseline is already
    # best-of-3 — symmetric treatment keeps the ratio honest
    dt = float("inf")
    for k in range(3):
        t0 = time.perf_counter()
        checksum = int(run(stacked, jnp.float32(1000.0 * (k + 1))))
        dt = min(dt, time.perf_counter() - t0)
        assert checksum != 0
    dt_compute = max(dt - latency, 1e-6)
    return k_stack * reps * BATCH / dt_compute


def measure_write_ms(n_clouds: int = 12) -> float:
    """pctpu's per-cloud artifact-write cost (ms) for the full-span ratio.

    Writes exactly the artifacts the reference's [TIME] bracket covers —
    layer-major .bin + 24 layer PNGs + single PNG + FMT_CSV — through the
    production writer path (pipelines/multi_bev._write_outputs: ONE
    runtime/native_io.write_cloud_artifacts call per cloud from the packed
    occupancy wire format), on real rasters from one preprocessed bench
    batch.  Matches the pipeline convention (pipelines/multi_bev.py):
    full-span per-cloud = device-compute average + this per-cloud write
    average (the serial-sum convention; the pipeline itself overlaps the
    writes — see measure_pipeline_span)."""
    import shutil
    import tempfile

    import jax

    from pctpu.config import get_sensor_params
    from pctpu.ops.preprocess import preprocess_batch
    from pctpu.runtime.native_io import write_cloud_artifacts

    params = get_sensor_params("HDL_64E")
    n_points = min(N_POINTS, int(params.grid_size * 0.9))
    cloud = synth_batch(params, BATCH, n_points, seed=3, ordered=True)
    _, multi, single = jax.device_get(
        jax.jit(
            lambda b: preprocess_batch(b, params, assume_ordered=True)
        )(cloud)
    )
    multi = np.asarray(multi)
    single = np.asarray(single)
    # the pipeline ships the occupancy BEV in its packed wire format and the
    # writer expands it natively (pipelines/multi_bev._preprocess_wire)
    nl, s = multi.shape[1], multi.shape[2]
    packed = np.packbits(
        (multi != 0).reshape(BATCH, nl, s, s // 8, 8), axis=-1,
        bitorder="little",
    ).reshape(BATCH, nl, s, s // 8)
    io_dir = tempfile.mkdtemp(prefix="pctpu_span_")
    try:
        for sub in ("binary", "image", "single_image", "single_csv"):
            os.makedirs(os.path.join(io_dir, sub), exist_ok=True)
        # warm one cloud (dlopen of libpctpu_io, page cache)
        write_cloud_artifacts(
            os.path.join(io_dir, "binary", "warm.bin"),
            os.path.join(io_dir, "image", "warm/"),
            os.path.join(io_dir, "single_image", "warm.png"),
            os.path.join(io_dir, "single_csv", "warm.csv"),
            single[0], packed=packed[0],
        )
        # best of 3 like measure_baseline: ext4 dirty-page writeback on the
        # shared host throttles bursts unpredictably (up to ~4x)
        best = float("inf")
        for rep in range(3):
            t0 = time.perf_counter()
            for i in range(n_clouds):
                b = i % BATCH
                short = f"{rep}_{i:06d}"
                write_cloud_artifacts(
                    os.path.join(io_dir, "binary", short + ".bin"),
                    os.path.join(io_dir, "image", short + "/"),
                    os.path.join(io_dir, "single_image", short + ".png"),
                    os.path.join(io_dir, "single_csv", short + ".csv"),
                    single[b], packed=packed[b],
                )
            best = min(best, time.perf_counter() - t0)
    finally:
        shutil.rmtree(io_dir, ignore_errors=True)
    return best * 1000.0 / n_clouds


def _write_bench_tree(root: str, n_clouds: int, seed0: int,
                      sensor: str = "HDL_64E") -> None:
    """A selected-keyframe tree of bench-shaped clouds (the production input
    layout the selector tools emit: dense grid, empty slots all-zero with
    label 0), for the end-to-end pipeline span measurement."""
    from pctpu.config import get_sensor_params
    from pctpu.geom.se3 import Pose6f
    from pctpu.io.pcd import write_pcd
    from pctpu.io.poses import format_pose_entry

    params = get_sensor_params(sensor) if isinstance(sensor, str) else sensor
    n_points = min(N_POINTS, int(params.grid_size * 0.9))
    os.makedirs(os.path.join(root, "keyframe_point_cloud"), exist_ok=True)
    lines = []
    idx = 0
    for seed in range(seed0, seed0 + (n_clouds + BATCH - 1) // BATCH):
        batch = synth_batch(params, BATCH, n_points, seed, ordered=True)
        xyz = np.asarray(batch.xyz)
        intensity = np.asarray(batch.intensity)
        row = np.asarray(batch.row).astype(np.uint16)
        col = np.asarray(batch.col).astype(np.uint16)
        label = np.asarray(batch.label).astype(np.int16)
        for b in range(BATCH):
            if idx >= n_clouds:
                break
            write_pcd(
                os.path.join(root, "keyframe_point_cloud", f"{idx:06d}.pcd"),
                {
                    "x": xyz[b, :, 0], "y": xyz[b, :, 1], "z": xyz[b, :, 2],
                    "intensity": intensity[b], "row": row[b], "col": col[b],
                    "t": np.zeros(xyz.shape[1], np.uint32), "label": label[b],
                },
                width=xyz.shape[1],
            )
            lines.append(format_pose_entry(
                idx, Pose6f.from_matrix(np.eye(3), np.array([3.0 * idx, 0, 0]))
            ))
            idx += 1
    with open(os.path.join(root, "keyframe_pose.csv"), "w") as f:
        f.writelines(lines)


def measure_pipeline_span(n_clouds: int = 64, sensor: str = "HDL_64E") -> dict:
    """End-to-end `run_multi_bev` measured span (VERDICT r4 item 1).

    Runs the REAL tool (prefetch loader → jitted batch kernel → AsyncWriter,
    write_pngs=True, tolerance compat) over `n_clouds` bench-shaped HDL-64E
    clouds: a warm tree first (jit cache + writer lib), then one timed tree
    with fresh values (the tunneled runtime value-caches repeated inputs).
    The pipeline's own loop wall is the published span — the BEV writes
    overlap device compute in it, unlike the serial-sum convention.

    Tunnel adjustment: this dev environment reaches the chip through a
    tunnel (~60 MB/s effective, docs/PERFORMANCE.md "End-to-end pipeline"),
    so each 8-cloud batch pays ~1 s of pure transfer a PCIe-local TPU host
    (>10 GB/s) would not.  The measured per-batch transfer cost is reported,
    and `pipeline_full_span_clouds_per_sec_pcie_estimate` subtracts the
    excess over a 5 ms/batch PCIe cost — an estimate, labeled as such; the
    raw keys are the measurement."""
    import shutil
    import tempfile

    import jax
    import jax.numpy as jnp

    from pctpu.pipelines.multi_bev import run_multi_bev
    from pctpu.runtime.loader import load_xyzirct_arrays, stack_batch
    from pctpu.config import get_sensor_params

    params = get_sensor_params(sensor) if isinstance(sensor, str) else sensor
    warm_dir = tempfile.mkdtemp(prefix="pctpu_pipe_warm_")
    timed_dir = tempfile.mkdtemp(prefix="pctpu_pipe_")
    try:
        _write_bench_tree(warm_dir, BATCH, seed0=100, sensor=sensor)
        _write_bench_tree(timed_dir, n_clouds, seed0=200, sensor=sensor)
        run_multi_bev(warm_dir, sensor, batch_size=BATCH, compat="tolerance")
        out = run_multi_bev(
            timed_dir, sensor, batch_size=BATCH, compat="tolerance"
        )
        assert out.num_clouds == n_clouds

        # measured per-batch tunnel transfer: h2d of one loader batch +
        # d2h of the same bytes, completion proven by value fetch
        files = sorted(
            os.path.join(warm_dir, "keyframe_point_cloud", f)
            for f in os.listdir(os.path.join(warm_dir, "keyframe_point_cloud"))
        )[:BATCH]
        arrays = stack_batch(
            [load_xyzirct_arrays(f, params.grid_size, params=params)
             for f in files]
        )
        nbytes = sum(np.asarray(v).nbytes for v in arrays.values())

        @jax.jit
        def _touch(a):
            return jnp.sum(a["xyz"][..., 0]) + jnp.float32(a["count"][0])

        # warm pass compiles _touch and primes the transfer path; the timed
        # pass uses perturbed values (the tunneled runtime value-caches
        # repeated inputs — docs/PERFORMANCE.md)
        float(_touch({k: jax.device_put(v) for k, v in arrays.items()}))
        arrays["xyz"] = arrays["xyz"] + np.float32(1e-3)
        t0 = time.perf_counter()
        dev = {k: jax.device_put(v) for k, v in arrays.items()}
        float(_touch(dev))
        dt_up = time.perf_counter() - t0
        t0 = time.perf_counter()
        back = jax.device_get(dev)
        dt_down = time.perf_counter() - t0
        assert back["xyz"].shape == arrays["xyz"].shape
        transfer_ms = (dt_up + dt_down) * 1e3
    finally:
        shutil.rmtree(warm_dir, ignore_errors=True)
        shutil.rmtree(timed_dir, ignore_errors=True)

    wall_ms = out.wall_ms_per_cloud
    device_ms = out.avg_device_ms_per_cloud  # includes in-stage transfers
    write_ms = out.avg_bev_write_ms_per_cloud
    hidden_pct = max(
        0.0, 100.0 * (1.0 - max(wall_ms - device_ms, 0.0) / max(write_ms, 1e-9))
    )
    # excess tunnel cost per cloud over a PCIe-local host's ~5 ms/batch;
    # floored at the write drain (2 writer threads) — the adjusted span
    # cannot beat what the writers themselves need
    excess_ms = max(transfer_ms - 5.0, 0.0) / BATCH
    pcie_wall_ms = max(wall_ms - excess_ms, write_ms / 2.0, 1e-3)
    return {
        "pipeline_full_span_clouds_per_sec": round(1000.0 / wall_ms, 3),
        "pipeline_wall_ms_per_cloud": round(wall_ms, 3),
        "pipeline_device_ms_per_cloud_incl_transfers": round(device_ms, 3),
        "pipeline_bev_write_ms_per_cloud": round(write_ms, 3),
        "pipeline_serial_sum_ms_per_cloud": round(device_ms + write_ms, 3),
        "pipeline_write_overlap_hidden_pct": round(hidden_pct, 1),
        "tunnel_transfer_ms_per_batch": round(transfer_ms, 1),
        "tunnel_transfer_mb_per_batch": round(2 * nbytes / 1e6, 1),
        "pipeline_full_span_clouds_per_sec_pcie_estimate": round(
            1000.0 / pcie_wall_ms, 3
        ),
    }


def _stage_ms(fn, args, reps: int = 8, target_ms: float = 250.0) -> float:
    """ms per call of `fn(offset, *args)` — perturbed iterations amortized
    inside ONE jitted fori_loop dispatch, timed by fetching the checksum
    value (tunnel discipline: block_until_ready does not prove execution;
    repeated values may be result-cached), dispatch latency subtracted,
    best of 3 dispatches with distinct offsets.

    The rep count auto-scales until one dispatch's compute is ≥`target_ms`
    (≫ the ~28 ms tunnel roundtrip): short probes (a 0.05 ms matmul, a
    0.1 ms grid pass) are otherwise latency-subtraction noise — a measured
    failure mode on this runtime, not a theoretical one."""
    import jax
    import jax.numpy as jnp

    def make_run(n):
        @jax.jit
        def run(offset, *a):
            def body(i, acc):
                return acc + fn(jnp.float32(i) + offset, *a)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        return run

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

    run = make_run(reps)
    float(run(jnp.float32(0.0), *args))  # compile + warm
    t0 = time.perf_counter()
    float(run(jnp.float32(17.0), *args))
    dt = time.perf_counter() - t0
    compute_ms = max(dt - latency, 1e-6) * 1e3
    if compute_ms < target_ms:
        # one rescale + recompile: per-rep estimate from the pilot
        per_rep = max(compute_ms / reps, 1e-4)
        reps = min(int(target_ms / per_rep) + 1, reps * 1024)
        run = make_run(reps)
        float(run(jnp.float32(0.0), *args))
    best = float("inf")
    for k in range(3):
        t0 = time.perf_counter()
        float(run(jnp.float32(1000.0 * (k + 1)), *args))
        best = min(best, time.perf_counter() - t0)
    return max(best - latency, 1e-9) * 1e3 / reps


def utilization_block(tol_cps: float | None = None,
                      exact_cps: float | None = None,
                      sensor: str = "HDL_64E") -> dict:
    """Per-stage device time vs measured primitive peaks (VERDICT r4 item 9).

    Mechanizes docs/PERFORMANCE.md's roofline table: each hot stage of the
    preprocess kernel is timed standalone at kernel shapes (batch=BATCH,
    HDL-64E grid), each primitive peak is measured fresh on THIS device in
    the same session, and `pct_of_primitive_peak = bound / measured` so an
    MFU regression in any stage shows up as a dropping percentage in
    bench_details.json rather than only in hand-maintained prose.  The
    stage probes are cross-checked against the end-to-end kernel: the sum
    of (BEV + tolerance grid + sweep) is emitted next to the measured
    full-kernel ms/cloud (from `tol_cps`) as `stage_sum_vs_kernel`.
    """
    import jax
    import jax.numpy as jnp

    from pctpu.config import GroundConfig, get_sensor_params
    from pctpu.ops.bev import fused_multi_single_bev
    from pctpu.ops.ground import (
        _belonging_grid,
        _grid_sums_bitexact,
        _grid_sums_tolerance,
        mark_ground,
    )

    params = get_sensor_params(sensor) if isinstance(sensor, str) else sensor
    cfg = GroundConfig()
    n_points = min(N_POINTS, int(params.grid_size * 0.9))
    batch = synth_batch(params, BATCH, n_points, seed=3, ordered=True)
    g = params.grid_size
    swept = min((params.ground_upper_scan + 1) * params.horizon_scan, g)

    # ---- measured primitive peaks (this session, this chip) ----
    def f_sort(off, keys, payload):
        k2 = keys + off.astype(jnp.int32)
        sk, sp = jax.vmap(
            lambda a, b: jax.lax.sort([a, b], num_keys=1)
        )(k2, payload)
        return (sk[:, 0].sum().astype(jnp.float32)
                + sp[:, -1].sum(dtype=jnp.uint32).astype(jnp.float32))

    from pctpu.config import MultiBevConfig

    s_bev = MultiBevConfig().mat_size
    L = g + s_bev * s_bev  # fused-BEV sort length: points + one sentinel/cell
    rng = np.random.default_rng(11)
    keys = jnp.asarray(rng.integers(0, 1 << 24, (BATCH, L), dtype=np.int32))
    payload = jnp.asarray(
        rng.integers(0, 1 << 30, (BATCH, L), dtype=np.int64).astype(np.uint32)
    )
    sort_ms = _stage_ms(f_sort, (keys, payload), reps=8)
    sort_ns = sort_ms * 1e6 / (BATCH * L * 2)  # per element per operand

    def f_scatter(off, idx, vals):
        v = vals * (1.0 + jnp.float32(1e-7) * off)
        out = jax.vmap(
            lambda i, p: jnp.zeros((8192, 2), jnp.float32).at[i].add(p)
        )(idx, v)
        return jnp.sum(out)

    idx = jnp.asarray(rng.integers(0, 8192, (BATCH, swept), dtype=np.int32))
    vals = jnp.asarray(rng.random((BATCH, swept, 2), np.float32))
    scatter_ms = _stage_ms(f_scatter, (idx, vals), reps=8)
    scatter_ns = scatter_ms * 1e6 / (BATCH * swept)  # per 2-wide update row

    def f_matmul(off, a, b):
        a2 = a * (1.0 + jnp.float32(1e-7) * off)
        return jnp.sum(
            jax.lax.dot(a2, b, precision=jax.lax.Precision.HIGHEST)
        )

    mm = 1024
    a = jnp.asarray(rng.random((mm, mm), np.float32))
    b = jnp.asarray(rng.random((mm, mm), np.float32))
    matmul_ms = _stage_ms(f_matmul, (a, b), reps=16)
    matmul_tmacs = mm**3 / (matmul_ms * 1e-3) / 1e12  # f32 MAC/s (HIGHEST)

    def f_hbm(off, x):
        return jnp.sum(x * (1.0 + jnp.float32(1e-7) * off) + off)

    big = jnp.asarray(rng.random((1 << 25,), np.float32))  # 128 MB
    hbm_ms = _stage_ms(f_hbm, (big,), reps=8)
    hbm_gbps = big.nbytes / (hbm_ms * 1e-3) / 1e9  # one read pass (fused sum)

    # ---- measured stage times at kernel shapes (ms per cloud) ----
    labeled = jax.vmap(lambda c: mark_ground(c, params, cfg)[0])(batch)

    def f_bev(off, lb):
        b2 = lb.replace(xyz=lb.xyz * (1.0 + jnp.float32(1e-7) * off))
        m, s = jax.vmap(
            lambda c: fused_multi_single_bev(c, params.height_res)
        )(b2)
        return jnp.float32(
            jnp.sum(m, dtype=jnp.int32) + jnp.sum(s, dtype=jnp.int32)
        )

    bev_ms = _stage_ms(f_bev, (labeled,), reps=8) / BATCH

    def _grid_args():
        x = batch.xyz[:, :swept, 0]
        y = batch.xyz[:, :swept, 1]
        z = batch.xyz[:, :swept, 2]
        srow, scol = jax.vmap(lambda xx, yy: _belonging_grid(xx, yy, cfg))(x, y)
        ground = batch.label[:, :swept] == -2
        return srow, scol, z, ground

    srow, scol, z, ground = _grid_args()
    sector = srow * cfg.grid_cols + scol

    def f_grid_exact(off, sec, zz, gg):
        z2 = zz * (1.0 + jnp.float32(1e-7) * off)
        out = jax.vmap(
            lambda s_, z_, g_: _grid_sums_bitexact(s_, z_, g_, cfg)
        )(sec, z2, gg)
        return jnp.sum(out)

    grid_exact_ms = _stage_ms(f_grid_exact, (sector, z, ground), reps=8) / BATCH

    def f_grid_tol(off, sr, sc, zz, gg):
        z2 = zz * (1.0 + jnp.float32(1e-7) * off)
        out = jax.vmap(
            lambda r_, c_, z_, g_: _grid_sums_tolerance(r_, c_, z_, g_, cfg)
        )(sr, sc, z2, gg)
        return jnp.sum(out)

    grid_tol_ms = _stage_ms(f_grid_tol, (srow, scol, z, ground), reps=8) / BATCH

    def f_mark(compat):
        def f(off, bb):
            b2 = bb.replace(xyz=bb.xyz * (1.0 + jnp.float32(1e-7) * off))
            lb, gm = jax.vmap(
                lambda c: mark_ground(c, params, cfg, compat=compat)
            )(b2)
            return jnp.float32(
                jnp.sum(lb.label) + jnp.sum(gm, dtype=jnp.int32)
            )

        return f

    mark_tol_ms = _stage_ms(f_mark("tolerance"), (batch,), reps=8) / BATCH
    mark_exact_ms = _stage_ms(f_mark("bitexact"), (batch,), reps=8) / BATCH

    # ---- primitive bounds per stage (docs/PERFORMANCE.md roofline) ----
    bev_bound = 2 * L * 2 * sort_ns / 1e6  # two sorts, 2 operands each
    scatter_bound = swept * scatter_ns / 1e6  # one 2-wide update per point
    macs = swept * 2 * cfg.grid_rows * cfg.grid_cols  # (P,2R)@(P,C)
    grid_tol_bound = macs / (matmul_tmacs * 1e12) * 1e3
    # ~30 elementwise passes over the swept planes (x,y,z,... shifted
    # candidates — docs/PERFORMANCE.md roofline row 3), read+write each
    sweep_bound = 30 * (swept * 4 * 2) / (hbm_gbps * 1e9) * 1e3

    def row(measured, bound):
        return {
            "measured_ms_per_cloud": round(measured, 4),
            "primitive_bound_ms": round(bound, 4),
            "pct_of_primitive_peak": round(100.0 * bound / measured, 1)
            if measured > 0 else None,
        }

    out = {
        "primitive_peaks": {
            "sort_ns_per_elem_per_operand": round(sort_ns, 3),
            "scatter_ns_per_update_row": round(scatter_ns, 3),
            "matmul_f32_highest_tmacs": round(matmul_tmacs, 3),
            "hbm_read_gbps": round(hbm_gbps, 1),
        },
        # full ground-marking in each compat mode (sweep + veto + its grid
        # accumulation as XLA actually fuses them) — a stage's percentage
        # over 100 means the kernel formulation beats the generic primitive
        # probe (banded scatter / narrow sort keys), consistent with the
        # docs/PERFORMANCE.md roofline notes
        "stages": {
            "fused_multi_single_bev": row(bev_ms, bev_bound),
            "mark_ground_bitexact": row(
                mark_exact_ms, scatter_bound + sweep_bound
            ),
            "mark_ground_tolerance": row(
                mark_tol_ms, grid_tol_bound + sweep_bound
            ),
        },
        # the grid accumulations timed in isolation (their standalone cost
        # exceeds their marginal cost inside mark_ground — the one-hot /
        # index build fuses with the sweep there)
        "substages_isolated": {
            "ground_grid_scatter_bitexact": row(grid_exact_ms, scatter_bound),
            "ground_grid_mxu_tolerance": row(grid_tol_ms, grid_tol_bound),
        },
        "stage_sum_tolerance_ms": round(bev_ms + mark_tol_ms, 4),
    }
    if tol_cps:
        kernel_ms = 1000.0 / tol_cps
        out["kernel_tolerance_ms_per_cloud"] = round(kernel_ms, 4)
        out["stage_sum_vs_kernel"] = round(
            out["stage_sum_tolerance_ms"] / kernel_ms, 3
        )
    if exact_cps and tol_cps:
        # the bit-exact kernel swaps the MXU grid for the scatter grid
        out["kernel_bitexact_ms_per_cloud"] = round(1000.0 / exact_cps, 4)
    return out


def measure_registration_baseline(n_pairs: int = 5) -> dict:
    """Single-core C++ two-stage ICP ms/pair on the bench scene
    (native/baseline_registration.cpp — same algorithm as the reference,
    grid NN standing in for PCL's kd-tree, which favors the baseline).
    Returns the binary's JSON (best ms_per_pair of 3 runs)."""
    exe = os.path.join(REPO, "native", "baseline_registration")
    src = os.path.join(REPO, "native", "baseline_registration.cpp")
    stale = os.path.exists(src) and (
        not os.path.exists(exe)
        or os.path.getmtime(exe) < os.path.getmtime(src)
    )
    if stale:
        tmp = f"{exe}.build.{os.getpid()}"
        subprocess.run(
            ["g++", "-O2", "-std=c++14", "-o", tmp, src], check=True, cwd=REPO
        )
        os.replace(tmp, exe)
    best = None
    for _ in range(3):
        out = json.loads(
            subprocess.run(
                [exe, str(n_pairs)], check=True, capture_output=True, text=True
            ).stdout
        )
        if best is None or out["ms_per_pair"] < best["ms_per_pair"]:
            best = out
    assert best["successes"] == best["n_pairs"], best
    # the timing comparison is only fair if the baseline SOLVES the scene:
    # its recovered transform must match the known (17°, (1.5, −2)) inside
    # the north-star window, like the pctpu on-chip precision gate
    assert abs(best["last_fine_yaw_deg"] - 17.0) < 0.5, best
    assert abs(best["last_fine_tx"] - 1.5) < 0.1, best
    assert abs(best["last_fine_ty"] + 2.0) < 0.1, best
    return best


def verify_on_device() -> str:
    """On-TPU verification gate (VERDICT round-2 item 5).

    The Pallas kernels' real-chip lowering is otherwise exercised only
    implicitly (the CPU suite runs them with ``interpret=True``), so this
    gate diffs them against their XLA oracles on the actual device:

    1. ``pallas_nn_1_pruned`` vs ``nn_1`` at 49k² fine-stage shapes, both
       the thresholded (1 m correspondence gate) and the unthresholded
       fitness pass — exact index/value agreement (correspondence semantics
       /root/reference/BatchTopPartRegistration.cpp:199-239);
    2. the fused sort-based BEV vs the scatter-based ops at full HDL-64E
       shapes, in both compat modes — byte-identical rasters.

    Returns "ok" or raises AssertionError.
    """
    import jax
    import jax.numpy as jnp

    from pctpu.config import get_sensor_params
    from pctpu.ops.bev import fused_multi_single_bev, multi_bev, single_bev
    from pctpu.ops.ground import mark_ground
    from pctpu.ops.knn import nn_1
    from pctpu.ops.ordering import get_ordered_cloud
    from pctpu.ops.pallas_knn import pallas_nn_1_pruned, spatial_sort

    # --- pruned Pallas NN vs XLA blocked argmin at 49k² --------------------
    rng = np.random.default_rng(7)
    n = 49_000
    pts = rng.uniform(-70, 70, (n, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-2, 8, n).astype(np.float32)
    tgt = (pts + rng.normal(0, 0.5, (n, 3))).astype(np.float32)
    q, qm, _ = spatial_sort(jnp.asarray(pts), jnp.ones(n, bool))
    t, tm, _ = spatial_sort(jnp.asarray(tgt), jnp.ones(n, bool))

    @jax.jit
    def _nn_all(q, qm, t, tm):
        i_ref, d_ref = nn_1(q, qm, t, tm)
        i_thr, d_thr = pallas_nn_1_pruned(q, qm, t, tm, max_distance=1.0)
        i_fit, d_fit = pallas_nn_1_pruned(q, qm, t, tm, max_distance=None)
        return i_ref, d_ref, i_thr, d_thr, i_fit, d_fit

    i_ref, d_ref, i_thr, d_thr, i_fit, d_fit = jax.device_get(
        _nn_all(q, qm, t, tm)
    )
    # Winner selection happens on MXU scores |t|² − 2q·t with absolute error
    # ~|p|²·2⁻²³ (ops/pallas_knn.py docstring) — targets whose exact
    # distances differ by less than that window may resolve either way, and
    # the two paths realize the window differently on-chip.  Exactness
    # demand: identical indices AND d² everywhere outside the window, and
    # any winner swap bounded by it (both d²s are re-derived exactly).
    max_sq = float(np.max(np.sum(np.asarray(t) ** 2, axis=1)))
    window = 8.0 * max_sq * 2.0**-23

    def check(name, i2, d2, sel):
        swap = (i2 != i_ref) & sel
        assert np.all(np.abs(d2[swap] - d_ref[swap]) <= window), (
            f"pruned NN ({name}): winner swap outside the score window"
        )
        assert swap.sum() <= max(1, int(0.001 * n)), (
            f"pruned NN ({name}): {swap.sum()} swaps — not near-tie noise"
        )
        same = sel & ~swap
        assert np.array_equal(i2[same], i_ref[same]), f"pruned NN ({name}) idx"
        assert np.array_equal(d2[same], d_ref[same]), f"pruned NN ({name}) d2"

    within = d_ref <= 1.0
    check("thr", i_thr, d_thr, within)
    beyond = ~within
    assert np.all(~np.isfinite(d_thr[beyond]) | (d_thr[beyond] > 1.0 - window)), (
        "pruned NN (thr) beyond-gate"
    )
    check("fitness", i_fit, d_fit, np.ones(n, bool))

    # --- fused vs unfused preprocess BEVs at HDL-64E, both compat modes ----
    # Stages compile as SEPARATE programs: one mega-program containing both
    # the sort-based fused BEV and the scatter rasters measured a 340 s XLA
    # fusion-search blowup on this backend, while the pieces compile in
    # seconds and the BEV programs are shared across the two compat modes.
    params = get_sensor_params("HDL_64E")
    cloud = synth_batch(params, 1, min(N_POINTS, params.grid_size), seed=11)
    one = jax.tree.map(lambda x: x[0], cloud)
    ordered = jax.jit(lambda c: get_ordered_cloud(c, params))(one)
    _mark = jax.jit(
        lambda c, compat: mark_ground(c, params, compat=compat),
        static_argnames=("compat",),
    )
    _fused = jax.jit(lambda c: fused_multi_single_bev(c, params.height_res))
    _multi = jax.jit(lambda c: multi_bev(c, params.height_res))
    _single = jax.jit(single_bev)
    for compat in ("bitexact", "tolerance"):
        labeled, _ = _mark(ordered, compat)
        fm, fs = jax.device_get(_fused(labeled))
        m, s = jax.device_get((_multi(labeled), _single(labeled)))
        assert np.array_equal(fm, m), f"fused multi BEV ({compat})"
        assert np.array_equal(fs, s), f"fused single BEV ({compat})"

    # --- on-chip north-star precision: known-transform registration --------
    # the CPU suite bounds yaw error over 20 scenes; this asserts the SAME
    # acceptance window (<0.5°, BASELINE.json:5) on the real chip, where the
    # matmul-precision and Pallas-lowering behavior differ from CPU jax
    import math

    from pctpu.cloud import make_cloud
    from pctpu.pipelines.registration import register_pair, register_pairs

    batched_inputs = []
    single_fine = []
    for seed in range(3):
        rng = np.random.default_rng(500 + seed)
        pts, labels = [], []
        for _ in range(12):
            cx, cy = rng.uniform(-50, 50, 2)
            k = 150
            pts.append(np.stack([cx + rng.normal(0, 2.5, k),
                                 cy + rng.normal(0, 2.5, k),
                                 rng.uniform(0, 9, k)], 1))
            labels.append(np.full(k, -2))
        ng = 1500
        pts.append(np.stack([rng.uniform(-70, 70, ng), rng.uniform(-70, 70, ng),
                             rng.uniform(-2.0, -1.9, ng)], 1))
        labels.append(np.zeros(ng))
        xyz = np.concatenate(pts).astype(np.float32)
        lab = np.concatenate(labels).astype(np.int32)
        true_yaw = float(rng.uniform(-60, 60))
        tx, ty = rng.uniform(-3, 3, 2)
        th = math.radians(true_yaw)
        rot = np.array([[np.cos(th), -np.sin(th), 0],
                        [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
        xyz2 = (xyz @ rot.T + np.float32([tx, ty, 0])
                + rng.normal(0, 0.01, xyz.shape)).astype(np.float32)
        c1 = jax.device_put(make_cloud(xyz, label=lab, capacity=4096))
        c2 = jax.device_put(make_cloud(xyz2, label=lab, capacity=4096))
        guess = true_yaw + float(rng.uniform(-8, 8))
        _, fine = register_pair(c1, c2, angle_guess_deg=guess, flat_cap=4096)
        assert float(fine.fitness) <= 1.5, (
            f"on-chip registration failed (seed {seed}): {float(fine.fitness)}"
        )
        tf = np.asarray(fine.transform)
        yaw = math.degrees(math.atan2(tf[1, 0], tf[0, 0]))
        yaw_err = abs(yaw - true_yaw)
        t_err = float(np.hypot(tf[0, 3] - tx, tf[1, 3] - ty))
        assert yaw_err < 0.5, f"on-chip yaw error {yaw_err}° (seed {seed})"
        assert t_err < 0.10, f"on-chip translation error {t_err} m (seed {seed})"
        batched_inputs.append((c1, c2, guess))
        single_fine.append(tf)

    # --- vmapped-vs-single equivalence on-chip ------------------------------
    # register_pairs vmaps the Pallas NN through the batched ICP stages — the
    # batched lowering must reproduce the single-pair transforms (buckets
    # derive from batch maxima, so padding widths — and with them f32
    # reduction trees — may differ: same tolerance as the CPU equivalence
    # test, tests/test_registration_e2e.py)
    batched = register_pairs(batched_inputs, flat_cap=4096)
    for k, (_, fine_b) in enumerate(batched):
        assert np.allclose(
            np.asarray(fine_b.transform), single_fine[k], atol=2e-3
        ), f"vmapped fine transform diverges from single-pair (scene {k})"

    # --- on-chip end-to-end two-stage differential vs the composed oracle --
    # the CPU suite asserts register_pair against tests/ref_impl.two_stage_ref
    # (the per-stage PCL-semantics oracles glued the reference's way,
    # /root/reference/BatchTopPartRegistration.cpp:356-532); this repeats ONE
    # stable pinned scene on the real chip.  capacity/flat_cap 4096 reuse the
    # stage programs the precision sweep above just compiled.
    from tests.test_twostage_differential import (
        assert_two_stage_matches,
        oracle_stable,
        run_production,
        twostage_scene,
    )

    xyz1, lab1, xyz2, lab2, guess, _ = twostage_scene(1)
    ref2, stable = oracle_stable(xyz1, lab1, xyz2, lab2, guess)
    assert stable, "verify scene became a knife edge (pin a different seed)"
    best_ts, fine_ts = run_production(
        xyz1, lab1, xyz2, lab2, guess, capacity=4096, flat_cap=4096
    )
    assert_two_stage_matches(best_ts, fine_ts, ref2)
    return "ok"


def registration_scene():
    """The bench's 65k-point registration pair (40 vertical clusters + flat
    ground, 17° yaw + translation), device-resident at capacity 65536.
    Shared by `measure_registration` and the device-floor probe
    (`scripts/probe_registration_floor.py`)."""
    from pctpu.cloud import make_cloud

    rng = np.random.default_rng(0)
    pts, labels = [], []
    for _ in range(40):
        cx, cy = rng.uniform(-60, 60, 2)
        n = 150
        pts.append(
            np.stack([cx + rng.normal(0, 2.5, n), cy + rng.normal(0, 2.5, n),
                      rng.uniform(0, 9, n)], 1)
        )
        labels.append(np.full(n, -2))
    ng = 45000
    pts.append(np.stack([rng.uniform(-70, 70, ng), rng.uniform(-70, 70, ng),
                         rng.uniform(-2.0, -1.9, ng)], 1))
    labels.append(np.zeros(ng))
    xyz = np.concatenate(pts).astype(np.float32)
    lab = np.concatenate(labels).astype(np.int32)
    th = np.radians(17.0)
    rot = np.array([[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0],
                    [0, 0, 1]], np.float32)
    xyz2 = xyz @ rot.T + np.array([1.5, -2.0, 0], np.float32)
    import jax

    c1 = jax.device_put(make_cloud(xyz, label=lab, capacity=65536))
    c2 = jax.device_put(make_cloud(xyz2, label=lab, capacity=65536))
    return c1, c2


def measure_registration(return_stages: bool = False, depth: int = 1,
                         offset_base: int = 100):
    """Fused two-stage registration pairs/sec on 65k-point synthetic scenes.

    ``return_stages=True`` also returns the measured per-pair stage wall
    times (the reference's two [TIME] spans) from the pipelined run.
    ``depth`` is the pipeline's device-queue depth; ``offset_base`` shifts
    the perturbation offsets so repeated probes in one process never
    re-present bit-identical inputs (the axon runtime value-caches them)."""
    import jax

    c1, c2 = registration_scene()
    # clouds live on device (the production pipeline streams them in via the
    # async loader, overlapped with compute); pairs run batched — each stage
    # is one vmapped dispatch over the pair axis
    from pctpu.pipelines.registration import register_pairs

    n_pairs = 16  # batch 24 measured slower (HBM pressure); 8 leaves
    # dispatch latency unamortized
    def batch(off):
        pairs = [
            (c1.replace(xyz=c1.xyz + (off + i) * 1e-4), c2, 17.0)
            for i in range(n_pairs)
        ]
        # force the perturbations to finish: input prep is not pipeline work
        # (production pairs stream from the loader, overlapped with compute),
        # and on this runtime only a value fetch proves completion
        for p in pairs:
            float(np.asarray(p[0].xyz[0, 0]))
        return pairs

    # flat_cap matches the CLI default (cli/batch_top_part_registration.py):
    # the bench measures the out-of-the-box configuration, not a tuned one
    # (the flat stage pads its voxel to flat_cap; the ICP stages bucket to
    # the true counts either way)
    from pctpu.config import RegistrationConfig
    from pctpu.pipelines.registration import register_pairs_pipelined

    from pctpu.runtime.profiler import StageTimer

    cfg = RegistrationConfig()
    register_pairs(batch(1), cfg, flat_cap=32768)  # compile
    stage_timer = StageTimer()
    # timed: the production pipelined stream — batch k+1's stack+coarse
    # stage overlaps batch k's fine stage, like the batch driver.  The
    # synthetic inputs are prebuilt OUTSIDE the timed region (their
    # perturb+fetch proof costs 16 tunnel roundtrips per batch — an
    # artifact of the value-perturbation methodology, not pipeline work;
    # production pairs stream from the disk loader thread)
    # stride >= n_pairs so no perturbation offset recurs across batches:
    # the axon runtime value-caches repeated input values (CLAUDE.md), and
    # re-presenting bit-identical pairs would inflate the measured rate
    # 6 batches: the pipeline needs one batch of ramp-up before coarse/fine
    # halves fully overlap — 3 batches under-reported the steady-state rate
    # the batch driver reaches on real match lists (hundreds of pairs)
    n_batches = 6
    built = [batch(offset_base + n_pairs * i) for i in range(n_batches)]
    t0 = time.perf_counter()
    for _ in register_pairs_pipelined(
        iter([lambda b=b: b for b in built]), cfg, flat_cap=32768,
        timer=stage_timer, depth=depth,
    ):
        pass
    pps = n_batches * n_pairs / (time.perf_counter() - t0)
    if return_stages:
        stages = {
            k: round(stage_timer.average_ms(k), 3)
            for k in sorted(stage_timer.totals_ms)
        }
        return pps, stages
    return pps


def main() -> int:
    _wait_for_backend()
    if "--verify" in sys.argv:
        # standalone gate: on-chip kernel-lowering diffs + north-star
        # precision sweep, no throughput measurement
        print(json.dumps({"verify": verify_on_device()}))
        return 0
    details = "--details" in sys.argv
    baseline_ms = measure_baseline()
    baseline_cps = 1000.0 / baseline_ms
    # span-matched baseline: the reference's real [TIME] bracket includes the
    # per-cloud artifact writes (bin + 24+1 PNGs + csv); both sides get their
    # write cost added for the full-span ratio (VERDICT r3 item 1)
    baseline_span_ms = measure_baseline(full_span=True)
    baseline_span_cps = 1000.0 / baseline_span_ms
    # headline: the tolerance-compat production path (the measured throughput
    # mode; <1 px BEV divergence — the north star's acceptance window,
    # BASELINE.json:5).  The bit-exact default mode is reported alongside.
    tol_cps = measure_tpu(ordered=True, compat="tolerance")
    exact_cps = measure_tpu(ordered=True, compat="bitexact")
    write_ms = measure_write_ms()
    tol_span_cps = 1000.0 / (1000.0 / tol_cps + write_ms)
    exact_span_cps = 1000.0 / (1000.0 / exact_cps + write_ms)
    # the tool's OWN measured end-to-end span (writes overlapped via
    # AsyncWriter — VERDICT r4 item 1); never let its failure kill the bench
    try:
        pipe = measure_pipeline_span()
    except Exception as e:  # pragma: no cover - depends on device state
        pipe = {"pipeline_span_error": f"{type(e).__name__}: {e}"}
    verify = verify_on_device()
    if details:
        general_cps = measure_tpu(ordered=False)
        general_tol_cps = measure_tpu(ordered=False, compat="tolerance")
        hdl32_cps = measure_tpu(ordered=True, sensor="HDL_32E")
        os1_cps = measure_tpu(ordered=True, sensor="OS1_64")
        pairs_per_sec, reg_stages = measure_registration(return_stages=True)
        reg_base = measure_registration_baseline()
        reg_base_pps = 1000.0 / reg_base["ms_per_pair"]
        with open(os.path.join(REPO, "bench_details.json"), "w") as f:
            json.dump(
                {
                    "hdl64e_multibev_clouds_per_sec_tolerance": round(tol_cps, 3),
                    "hdl64e_multibev_clouds_per_sec_bitexact": round(exact_cps, 3),
                    "hdl64e_multibev_general_path_clouds_per_sec": round(general_cps, 3),
                    "hdl64e_multibev_general_path_clouds_per_sec_tolerance": round(
                        general_tol_cps, 3
                    ),
                    "hdl32e_multibev_clouds_per_sec": round(hdl32_cps, 3),
                    "os1_64_multibev_clouds_per_sec": round(os1_cps, 3),
                    "baseline_single_core_clouds_per_sec": round(baseline_cps, 3),
                    "baseline_ms_per_cloud": baseline_ms,
                    "baseline_full_span_clouds_per_sec": round(
                        baseline_span_cps, 3
                    ),
                    "baseline_full_span_ms_per_cloud": baseline_span_ms,
                    "pctpu_bev_write_ms_per_cloud": round(write_ms, 3),
                    "full_span_clouds_per_sec_tolerance": round(tol_span_cps, 3),
                    "full_span_clouds_per_sec_bitexact": round(
                        exact_span_cps, 3
                    ),
                    "vs_baseline_full_span": round(
                        tol_span_cps / baseline_span_cps, 3
                    ),
                    "vs_baseline_full_span_bitexact": round(
                        exact_span_cps / baseline_span_cps, 3
                    ),
                    "registration_pairs_per_sec_65k": round(pairs_per_sec, 3),
                    "registration_stage_wall_ms_per_pair": reg_stages,
                    "registration_baseline_single_core_pairs_per_sec": round(
                        reg_base_pps, 3
                    ),
                    "registration_baseline_ms_per_pair": reg_base["ms_per_pair"],
                    "registration_baseline_stage_ms": {
                        "coarse": reg_base["coarse_ms"],
                        "fine": reg_base["fine_ms"],
                    },
                    "registration_vs_baseline": round(
                        pairs_per_sec / reg_base_pps, 3
                    ),
                    **pipe,
                    "vs_baseline_interval": _ratio_interval(
                        tol_cps, baseline_ms, BASELINE_HIST_MS
                    ),
                    "vs_baseline_full_span_interval": _ratio_interval(
                        tol_span_cps, baseline_span_ms, BASELINE_SPAN_HIST_MS
                    ),
                    "baseline_ms_spread": [
                        min(baseline_ms, BASELINE_HIST_MS[0]),
                        max(baseline_ms, BASELINE_HIST_MS[1]),
                    ],
                    "utilization": utilization_block(tol_cps, exact_cps),
                    "verify": verify,
                },
                f,
                indent=2,
            )
    print(
        json.dumps(
            {
                "metric": "hdl64e_multibev_clouds_per_sec",
                "value": round(tol_cps, 3),
                "unit": "clouds/s",
                "vs_baseline": round(tol_cps / baseline_cps, 3),
                "compat": "tolerance",
                "bitexact_clouds_per_sec": round(exact_cps, 3),
                "bitexact_vs_baseline": round(exact_cps / baseline_cps, 3),
                # span-matched ratio: both sides include the reference's
                # in-[TIME] artifact writes (bin + 24+1 PNGs + csv)
                "full_span_clouds_per_sec": round(tol_span_cps, 3),
                "baseline_full_span_clouds_per_sec": round(
                    baseline_span_cps, 3
                ),
                "vs_baseline_full_span": round(
                    tol_span_cps / baseline_span_cps, 3
                ),
                # ratio error bars over the host's measured baseline spread
                # (session ∪ pinned history; pctpu absolute clouds/s is the
                # stable cross-session number — docs/PERFORMANCE.md)
                "vs_baseline_interval": _ratio_interval(
                    tol_cps, baseline_ms, BASELINE_HIST_MS
                ),
                "vs_baseline_full_span_interval": _ratio_interval(
                    tol_span_cps, baseline_span_ms, BASELINE_SPAN_HIST_MS
                ),
                # the production tool's own measured end-to-end span
                # (run_multi_bev loop wall: writes overlap device compute)
                "pipeline_full_span_clouds_per_sec": pipe.get(
                    "pipeline_full_span_clouds_per_sec"
                ),
                "pipeline_write_overlap_hidden_pct": pipe.get(
                    "pipeline_write_overlap_hidden_pct"
                ),
                **({"pipeline_span_error": pipe["pipeline_span_error"]}
                   if "pipeline_span_error" in pipe else {}),
                "verify": verify,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
