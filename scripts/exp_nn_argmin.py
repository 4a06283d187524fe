"""Closed experiments on the fine-ICP NN argmin floor (VERDICT r4 item 3).

The 49k² bbox-pruned Pallas NN pass (ops/pallas_knn.py, loop kernel,
tiles (tq=256, tt=1024)) sets the single-chip registration ceiling at
~40 pairs/s and is VPU-argmin-bound: per visited (256, 1024) block the
K=8 HIGHEST matmul is ~0.1 µs of MXU work while the lane-axis min/argmin
plus merge costs several VPU passes over the 1 MB score block.  Three
attack angles, each measured at the production fine-stage shapes (the
bench scene voxelized to the 49152 bucket, Morton-sorted, both the
thresholded 1 m pass and the unthresholded fitness pass):

  (a) fold the argmin onto the MXU: after the lane-min, the index is
      recovered by a one-hot contraction `indicator @ iota` — a deep
      K=tt matmul the MXU likes.  Two variants: `onehot_mxu` (plain f32
      iota, default-precision dot — a SPEED probe only: TPU default
      matmuls round operands to bf16, corrupting indices ≥256, and ties
      sum indices) and `onehot_exact` (the adoptable form: split 8-bit
      index encoding exact in bf16, an exact tie-count column, and a
      rare-tie lane-iota fallback — winner selection matches `prod`
      index-for-index);
  (b) bf16 prefilter + exact f32 rescore: round 1 closed direct bf16
      scores (±100 m coords → ~0.4 m coordinate error), and round 4
      measured bound-seeding worth <2% (the pass is not bound-limited),
      so the only way a prefilter helps is if the bf16 pass itself is
      much cheaper — measured here as the bf16-input variant;
  (c) tile shapes beyond the swept set: the round-3 sweep covered the
      2-D-grid kernel; the loop kernel amortizes per-tile fixed costs
      differently, so (tq, tt) up to (1024, 2048) are re-swept (VMEM cap
      ~16 MB: score block tq*tt*4 ≤ 8 MB).

Methodology: probe_registration_floor.py's in-scan discipline — REPS
perturbed passes inside one jitted scan, checksum fetched (value fetch
proves execution on this tunneled runtime), dispatch latency measured
and subtracted, best of 3.

Usage: python scripts/exp_nn_argmin.py [--quick]
Prints one JSON line per variant plus a summary.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def main() -> int:
    quick = "--quick" in sys.argv
    cpu_check = "--cpu-check" in sys.argv

    import jax

    if cpu_check:
        # the JAX_PLATFORMS env var does NOT exclude the axon plugin in
        # this environment (measured: jax.devices() returns the TPU with
        # JAX_PLATFORMS=cpu exported) — the config update is the only way
        # to force CPU, same as tests/conftest.py.  Without it the
        # "cpu check" silently runs on the chip, where the precision-less
        # onehot index matmul executes in bf16 and corrupts indices ≥256.
        jax.config.update("jax_platforms", "cpu")
    else:
        bench._wait_for_backend()
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pctpu.config import RegistrationConfig
    from pctpu.ops import pallas_knn as PK
    from pctpu.pipelines import registration as R
    reps = 16 if quick else 48
    cfg = RegistrationConfig()
    fine_bucket = 2048 if cpu_check else 49152

    if cpu_check:
        # tiny scene, interpret-mode kernels: validates every variant's
        # indices/distances against the production op before TPU time is
        # spent compiling a broken kernel
        rng = np.random.default_rng(5)
        n = 1800
        q_np = rng.uniform(-40, 40, (n, 3)).astype(np.float32)
        t_np = (q_np + rng.normal(0, 0.4, (n, 3))).astype(np.float32)
        q_xyz = jnp.zeros((fine_bucket, 3)).at[:n].set(q_np)
        t_xyz = jnp.zeros((fine_bucket, 3)).at[:n].set(t_np)
        q_mask = jnp.arange(fine_bucket) < n
        t_mask = jnp.arange(fine_bucket) < n
    else:
        # production fine-stage inputs: bench scene, full-cloud voxel,
        # bucket slice, Morton sort (exactly ops/icp.py's pruned-path prep)
        c1, c2 = bench.registration_scene()
        a, b, _ = jax.jit(
            lambda x, y: R._stage_voxel_full(x, y, cfg.voxel_leaf)
        )(c1, c2)
        q_xyz, q_mask = a[0][:fine_bucket], a[1][:fine_bucket]
        t_xyz, t_mask = b[0][:fine_bucket], b[1][:fine_bucket]
    q_xyz, q_mask = PK.spatial_sort_payload(q_xyz, q_mask)
    t_xyz, t_mask = PK.spatial_sort_payload(t_xyz, t_mask)
    q_xyz.block_until_ready()
    print(
        f"scene: {int(np.asarray(jnp.sum(q_mask)))} valid queries, "
        f"{int(np.asarray(jnp.sum(t_mask)))} valid targets "
        f"(bucket {fine_bucket})",
        file=sys.stderr, flush=True,
    )

    BIG = PK._BIG

    def make_kernel(nq_t, nt_t, tt, mode):
        """Loop-kernel factory: `mode` swaps the per-visited-tile
        min/argmin formulation; everything else mirrors
        pallas_knn._make_nn_pruned_loop_kernel."""

        def kernel(qb_ref, tb_ref, thr_ref, q_ref, t_vmem, val_ref, idx_ref):
            i = pl.program_id(0)
            masked = q_ref[4, :] > 0.5
            val_ref[0, :] = jnp.where(masked, -jnp.float32(BIG),
                                      jnp.float32(BIG))
            idx_ref[0, :] = jnp.zeros_like(idx_ref[0, :])
            q2 = q_ref[0, :] ** 2 + q_ref[1, :] ** 2 + q_ref[2, :] ** 2

            def do_visit(jj, bound):
                t_tile = t_vmem[:, pl.ds(jj * tt, tt)]
                if mode == "bf16":
                    cross = jax.lax.dot_general(
                        q_ref[:].astype(jnp.bfloat16),
                        t_tile.astype(jnp.bfloat16),
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                elif mode == "high3":
                    # bf16_3x passes — would be the middle of the
                    # precision-speed curve, but Mosaic's pallas dot
                    # lowering raises NotImplementedError("Unsupported dot
                    # precision: HIGH") on this toolchain: in-kernel the
                    # menu is DEFAULT (bf16) or HIGHEST only.  Kept for
                    # the record / future toolchains; not in the default
                    # mode list.
                    cross = jax.lax.dot_general(
                        q_ref[:], t_tile,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGH,
                    )
                else:
                    cross = jax.lax.dot_general(
                        q_ref[:], t_tile,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                score = t_tile[3, :][None, :] - 2.0 * cross
                if mode in ("prod", "bf16", "high3"):
                    local_best = jnp.min(score, axis=1) + q2
                    local_arg = (
                        jnp.argmin(score, axis=1).astype(jnp.int32) + jj * tt
                    )
                elif mode == "explicit2":
                    best_col = jnp.min(score, axis=1, keepdims=True)
                    lane = jax.lax.broadcasted_iota(
                        jnp.int32, score.shape, 1
                    )
                    local_arg = jnp.min(
                        jnp.where(score <= best_col, lane, jnp.int32(tt)),
                        axis=1,
                    ) + jj * tt
                    local_best = best_col[:, 0] + q2
                elif mode == "onehot_mxu":
                    best_col = jnp.min(score, axis=1, keepdims=True)
                    ind = (score <= best_col).astype(jnp.float32)
                    # int iota then cast: Mosaic rejects tpu.iota with a
                    # float result type on the compiled path
                    iota_col = jax.lax.broadcasted_iota(
                        jnp.int32, (score.shape[1], 128), 0
                    ).astype(jnp.float32)
                    # (TQ, TT) @ (TT, 128) — deep-K MXU contraction; ties
                    # SUM indices (speed probe only; column 0 is the index)
                    arg_f = jax.lax.dot_general(
                        ind, iota_col,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )[:, 0]
                    local_arg = arg_f.astype(jnp.int32) + jj * tt
                    local_best = best_col[:, 0] + q2
                elif mode == "onehot_exact":
                    # the ADOPTABLE formulation: the index rides the MXU as
                    # a split 8-bit encoding that is exact in bf16 (TPU
                    # default-precision matmuls round operands to bf16:
                    # plain iota corrupts indices ≥256).  ind is 0/1 (bf16-
                    # exact); B columns are integers ≤255 (bf16-exact);
                    # products accumulate in f32 with ≤tt terms ≤255 each
                    # (< 2²⁴, exact integer f32 arithmetic).  Column 2
                    # counts exact-score ties; any tie falls back to the
                    # lane-iota min for the whole tile (exact, rare), so
                    # winner selection matches `prod` index-for-index.
                    best_col = jnp.min(score, axis=1, keepdims=True)
                    indicator = score <= best_col
                    ind_b = indicator.astype(jnp.bfloat16)
                    r_iota = jax.lax.broadcasted_iota(
                        jnp.int32, (score.shape[1], 128), 0
                    )
                    c_iota = jax.lax.broadcasted_iota(
                        jnp.int32, (score.shape[1], 128), 1
                    )
                    enc = jnp.where(
                        c_iota == 0, r_iota // 256,
                        jnp.where(c_iota == 1, r_iota % 256,
                                  jnp.where(c_iota == 2, 1, 0)),
                    ).astype(jnp.bfloat16)
                    sums = jax.lax.dot_general(
                        ind_b, enc,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (TQ, 128): col0 = Σ j>>8, col1 = Σ j&255, col2 = n
                    arg_unique = (
                        sums[:, 0] * 256.0 + sums[:, 1]
                    ).astype(jnp.int32)
                    lane = jax.lax.broadcasted_iota(
                        jnp.int32, score.shape, 1
                    )

                    def _tie_arg():
                        return jnp.min(
                            jnp.where(indicator, lane, jnp.int32(tt)), axis=1
                        )

                    local_arg = jax.lax.cond(
                        jnp.max(sums[:, 2]) > 1.5, _tie_arg,
                        lambda: arg_unique,
                    ) + jj * tt
                    local_best = best_col[:, 0] + q2
                else:
                    raise ValueError(mode)
                better = (local_best < val_ref[0, :]) | (
                    (local_best == val_ref[0, :]) & (local_arg < idx_ref[0, :])
                )
                val_ref[0, :] = jnp.where(better, local_best, val_ref[0, :])
                idx_ref[0, :] = jnp.where(better, local_arg, idx_ref[0, :])
                return jnp.minimum(thr_ref[0], jnp.max(val_ref[0, :]))

            def visit(j, bound):
                jj = PK._diag_tile(i, j, nq_t, nt_t)
                gap = jnp.float32(0.0)
                for d in range(3):
                    lo_q, hi_q = qb_ref[d, i], qb_ref[3 + d, i]
                    lo_t, hi_t = tb_ref[d, jj], tb_ref[3 + d, jj]
                    g = jnp.maximum(
                        jnp.maximum(lo_t - hi_q, lo_q - hi_t), 0.0
                    )
                    gap = gap + g * g
                return jax.lax.cond(
                    gap <= bound, do_visit, lambda _, bd: bd, jj, bound
                )

            bound0 = jnp.minimum(thr_ref[0], jnp.max(val_ref[0, :]))
            jax.lax.fori_loop(0, nt_t, visit, bound0)

        return kernel

    @functools.partial(
        jax.jit,
        static_argnames=("tq", "tt", "thresholded", "mode", "interpret"),
    )
    def nn_variant(query, query_mask, target, target_mask,
                   thresholded, tq, tt, mode, interpret=False):
        qn, tn = query.shape[0], target.shape[0]
        qp = -(-qn // tq) * tq
        tp = -(-tn // tt) * tt
        q_planes = PK._plane_layout(query, query_mask, qp, with_sq=False)
        q_planes = q_planes.at[4, :qn].set(
            jnp.where(query_mask, 0.0, 1.0)
        )
        if qn < qp:
            q_planes = q_planes.at[4, qn:].set(1.0)
        t_planes = PK._plane_layout(target, target_mask, tp, with_sq=True)
        qxyz_p = jnp.zeros((qp, 3), jnp.float32).at[:qn].set(query)
        qmask_p = jnp.zeros((qp,), bool).at[:qn].set(query_mask)
        txyz_p = jnp.zeros((tp, 3), jnp.float32).at[:tn].set(target)
        tmask_p = jnp.zeros((tp,), bool).at[:tn].set(target_mask)
        q_bbox = PK._tile_bboxes(qxyz_p, qmask_p, tq)
        t_bbox = PK._tile_bboxes(txyz_p, tmask_p, tt)
        thr = jnp.full(
            (1,),
            jnp.float32(cfg.fine.max_correspondence_distance) ** 2
            if thresholded else jnp.float32(BIG),
            jnp.float32,
        )
        nq_t, nt_t = qp // tq, tp // tt
        val, idx = pl.pallas_call(
            make_kernel(nq_t, nt_t, tt, mode),
            grid=(nq_t,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((8, tq), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, tp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, tq), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tq), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((1, qp), jnp.float32),
                jax.ShapeDtypeStruct((1, qp), jnp.int32),
            ],
            interpret=interpret,
        )(q_bbox, t_bbox, thr, q_planes, t_planes)
        idx = idx[0, :qn]
        idx = jnp.clip(idx, 0, tn - 1)
        found = val[0, :qn] < jnp.float32(BIG) / 2
        diff = query - target[idx]
        d2 = jnp.sum(diff * diff, axis=1)
        d2 = jnp.where(query_mask & target_mask[idx] & found, d2, jnp.inf)
        return idx, d2

    def timed(fn_of_q, label):
        """ms per pass: REPS perturbed passes in one jitted scan."""
        @jax.jit
        def run(offs):
            def body(acc, off):
                q = q_xyz * (1.0 + jnp.float32(1e-7) * off)
                idx, d2 = fn_of_q(q)
                return acc + jnp.sum(idx) + jnp.sum(
                    jnp.where(jnp.isfinite(d2), d2, 0.0)
                ).astype(jnp.int32), off

            acc, _ = jax.lax.scan(body, jnp.int32(0), offs)
            return acc

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
        offs = jnp.arange(1, reps + 1, dtype=jnp.float32)
        int(run(offs))  # compile + warm
        best = float("inf")
        for k in range(3):
            t0 = time.perf_counter()
            chk = int(run(offs + jnp.float32(100.0 * (k + 1))))
            best = min(best, time.perf_counter() - t0)
        ms = max(best - latency, 1e-9) * 1e3 / reps
        print(json.dumps({"variant": label, "ms_per_pass": round(ms, 3),
                          "checksum": chk}), flush=True)
        return ms

    if cpu_check:
        ok = True
        for thresholded in (True, False):
            ref_idx, ref_d2 = PK.pallas_nn_1_pruned(
                q_xyz, q_mask, t_xyz, t_mask,
                max_distance=cfg.fine.max_correspondence_distance
                if thresholded else None,
                interpret=True, kernel="loop",
            )
            ref_idx, ref_d2 = np.asarray(ref_idx), np.asarray(ref_d2)
            for mode in ("prod", "explicit2", "onehot_exact",
                         "onehot_mxu", "bf16"):
                idx, d2 = nn_variant(
                    q_xyz, q_mask, t_xyz, t_mask, thresholded,
                    256, 1024, mode, interpret=True,
                )
                idx, d2 = np.asarray(idx), np.asarray(d2)
                valid = np.isfinite(ref_d2)
                if mode in ("prod", "explicit2", "onehot_exact"):
                    same = np.array_equal(idx[valid], ref_idx[valid]) and \
                        np.array_equal(d2, ref_d2)
                    exact = "exact-match" if same else "MISMATCH"
                    ok &= same
                else:
                    # onehot ties / bf16 precision may move near-tie
                    # winners; require the distances to agree closely
                    both = valid & np.isfinite(d2)
                    dd = np.abs(d2[both] - ref_d2[both])
                    frac = float(np.mean(idx[valid] == ref_idx[valid]))
                    exact = f"idx-agree={frac:.4f} max|Δd²|={dd.max():.2e}"
                    ok &= frac > (0.98 if mode == "onehot_mxu" else 0.90)
                print(json.dumps({
                    "cpu_check": mode,
                    "pass": "thr" if thresholded else "fitness",
                    "result": exact,
                }), flush=True)
        print(json.dumps({"cpu_check_ok": ok}), flush=True)
        return 0 if ok else 1

    results = {}

    # production baseline through the REAL op (sanity anchor)
    results["prod_op_thr"] = timed(
        lambda q: PK.pallas_nn_1_pruned(
            q, q_mask, t_xyz, t_mask,
            max_distance=cfg.fine.max_correspondence_distance,
        ),
        "prod_op thr=1m (256,1024)",
    )
    results["prod_op_fit"] = timed(
        lambda q: PK.pallas_nn_1_pruned(q, q_mask, t_xyz, t_mask),
        "prod_op fitness (256,1024)",
    )

    # (a)+(b): argmin formulations at the production tiles
    # (--modes=a,b reruns a subset; --no-tiles skips the sweep)
    mode_list = ("prod", "explicit2", "onehot_exact", "onehot_mxu", "bf16")
    for a in sys.argv:
        if a.startswith("--modes="):
            mode_list = tuple(a.split("=", 1)[1].split(","))
    for mode in mode_list:
        results[f"{mode}_thr"] = timed(
            lambda q, m=mode: nn_variant(
                q, q_mask, t_xyz, t_mask, True, 256, 1024, m
            ),
            f"{mode} thr=1m (256,1024)",
        )
        results[f"{mode}_fit"] = timed(
            lambda q, m=mode: nn_variant(
                q, q_mask, t_xyz, t_mask, False, 256, 1024, m
            ),
            f"{mode} fitness (256,1024)",
        )

    # (c): loop-kernel tile sweep (score block capped at 8 MB VMEM)
    tiles = [(256, 2048), (256, 4096), (512, 1024), (512, 2048),
             (1024, 1024), (1024, 2048), (512, 4096)]
    if quick:
        tiles = tiles[:3]
    if "--no-tiles" in sys.argv:
        tiles = []
    for tq, tt in tiles:
        try:
            results[f"tiles_{tq}x{tt}_thr"] = timed(
                lambda q, a=tq, c=tt: nn_variant(
                    q, q_mask, t_xyz, t_mask, True, a, c, "prod"
                ),
                f"prod thr=1m ({tq},{tt})",
            )
            results[f"tiles_{tq}x{tt}_fit"] = timed(
                lambda q, a=tq, c=tt: nn_variant(
                    q, q_mask, t_xyz, t_mask, False, a, c, "prod"
                ),
                f"prod fitness ({tq},{tt})",
            )
        except Exception as e:  # VMEM exhaustion etc — record and move on
            print(json.dumps({
                "variant": f"prod ({tq},{tt})",
                "error": f"{type(e).__name__}: {str(e)[:200]}",
            }), flush=True)

    print(json.dumps({"summary": {
        k: round(v, 3) for k, v in sorted(results.items(), key=lambda kv: kv[1])
    }}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
