"""Two-stage top-part registration + whole-cloud ablation drivers.

References: batch_top_part_registration
(/root/reference/BatchTopPartRegistration.cpp:311-541), top_part_registration
(/root/reference/TopPartRegistration.cpp:256-455, minus the viewer), and
batch_whole_registration (/root/reference/BatchWholeRegistration.cpp:311-418).

TPU design: per pair, top-part extraction + voxel + normals run as one jitted
program; the two coarse yaw guesses {θ, θ+180°} run as a single vmapped ICP
(the reference runs them sequentially, :439-457); the fine stage is one more
jitted ICP on the voxel-downsampled full clouds.  Fixed capacities make every
pair reuse the same compiled programs.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from pctpu.cloud import Cloud
from pctpu.config import RegistrationConfig
from pctpu.geom.se3 import yaw_rotation_4x4
from pctpu.io.pcd import load_cloud_pcd
from pctpu.io.poses import _ostream_float  # C++ ostream<<float emulation
from pctpu.ops.icp import icp_point_to_plane, icp_point_to_point
from pctpu.ops.normals2d import normals_2d
from pctpu.ops.topflatten import extract_top_and_flatten
from pctpu.ops.voxel import voxel_downsample
from pctpu.runtime.profiler import StageTimer
from pctpu.utils import logging as log


@dataclasses.dataclass
class MatchResult:
    """One row of match_result.txt
    (/root/reference/BatchTopPartRegistration.cpp:250-272)."""

    query_idx: int
    match_idx: int
    angle_guess: float


def load_match_results(path: str) -> list[MatchResult]:
    matches = []
    with open(path) as f:
        for line in f:
            tok = line.split()
            if not tok:
                continue
            matches.append(MatchResult(int(tok[0]), int(tok[1]), float(tok[2])))
    return matches


@dataclasses.dataclass
class PairReport:
    query_idx: int
    match_idx: int
    success: bool
    fitness_coarse: float
    fitness_fine: float
    diff_xy: float
    diff_yaw: float
    transform_fine: np.ndarray


def _prepare_flat_inline(cloud: Cloud, flat_cap: int, leaf: float, radius: float):
    """top+flatten → voxel → 2-D normals, compacted into flat_cap slots."""
    xyz, mask, _ = extract_top_and_flatten(cloud)
    xyz = xyz[:flat_cap]
    mask = mask[:flat_cap]
    ds_xyz, ds_mask, _ = voxel_downsample(xyz, mask, leaf)
    normals, _, normal_ok = normals_2d(ds_xyz, ds_mask, radius=radius)
    return ds_xyz, ds_mask, normals, normal_ok


_prepare_flat = jax.jit(
    _prepare_flat_inline, static_argnames=("flat_cap", "leaf", "radius")
)


@functools.partial(jax.jit, static_argnames=("leaf",))
def _voxel_full(cloud: Cloud, leaf: float):
    return voxel_downsample(cloud.xyz, cloud.valid_mask(), leaf)


def _coarse_two_guesses(src, src_mask, tgt, tgt_mask, tgt_normals, normal_ok,
                        guesses, cfg: RegistrationConfig):
    """Both yaw guesses as one vmapped point-to-plane ICP
    (guess and guess+180°, /root/reference/BatchTopPartRegistration.cpp:416-425)."""

    def run(guess):
        return icp_point_to_plane(
            src, src_mask, tgt, tgt_mask, tgt_normals, normal_ok, guess, cfg.coarse
        )

    return jax.vmap(run)(guesses)


def _guess_pair(angle_guess_deg: float) -> jnp.ndarray:
    g1 = yaw_rotation_4x4(angle_guess_deg / 180.0 * math.pi).astype(np.float32)
    g2 = yaw_rotation_4x4((angle_guess_deg + 180.0) / 180.0 * math.pi).astype(np.float32)
    return jnp.stack([jnp.asarray(g1), jnp.asarray(g2)])


@functools.partial(jax.jit, static_argnames=("cfg", "flat_cap"))
def _register_pair_fused(
    cloud_1: Cloud, cloud_2: Cloud, guesses: jnp.ndarray,
    cfg: RegistrationConfig, flat_cap: int,
):
    """The whole two-stage pipeline as one program: prepare → coarse ×2 →
    best-of-two → voxel full clouds → fine.  One dispatch per pair instead of
    four (host↔device roundtrips dominate otherwise)."""
    src, src_mask, _, _ = _prepare_flat_inline(
        cloud_1, flat_cap, cfg.voxel_leaf, cfg.normal_radius
    )
    tgt, tgt_mask, tgt_normals, normal_ok = _prepare_flat_inline(
        cloud_2, flat_cap, cfg.voxel_leaf, cfg.normal_radius
    )
    coarse = _coarse_two_guesses(
        src, src_mask, tgt, tgt_mask, tgt_normals, normal_ok, guesses, cfg
    )
    # tie picks the second guess, like the C++ ternary (:464)
    best_i = jnp.where(coarse.fitness[0] < coarse.fitness[1], 0, 1)
    best = jax.tree.map(lambda a: a[best_i], coarse)

    s_xyz, s_mask, _ = voxel_downsample(cloud_1.xyz, cloud_1.valid_mask(), cfg.voxel_leaf)
    t_xyz, t_mask, _ = voxel_downsample(cloud_2.xyz, cloud_2.valid_mask(), cfg.voxel_leaf)
    fine = icp_point_to_point(s_xyz, s_mask, t_xyz, t_mask, best.transform, cfg.fine)
    return best, fine


@functools.partial(jax.jit, static_argnames=("cfg", "flat_cap"))
def _register_pairs_vmapped(
    clouds_1: Cloud, clouds_2: Cloud, guesses: jnp.ndarray,
    cfg: RegistrationConfig, flat_cap: int,
):
    """Several pairs as one dispatch: Cloud fields carry a leading pair axis,
    guesses is (n_pairs, 2, 4, 4)."""

    def one(c1, c2, g):
        return _register_pair_fused(c1, c2, g, cfg, flat_cap)

    return jax.vmap(one, in_axes=(0, 0, 0))(clouds_1, clouds_2, guesses)


def register_pairs(
    pairs: list[tuple[Cloud, Cloud, float]],
    cfg: RegistrationConfig = RegistrationConfig(),
    flat_cap: int = 32768,
):
    """Batch several (cloud_1, cloud_2, yaw_guess_deg) pairs into one jitted
    dispatch.  Returns a list of (best coarse, fine) numpy IcpResults in
    input order.  All clouds must share one capacity."""
    import jax.numpy as _jnp

    c1 = jax.tree.map(lambda *xs: _jnp.stack(xs), *[p[0] for p in pairs])
    c2 = jax.tree.map(lambda *xs: _jnp.stack(xs), *[p[1] for p in pairs])
    guesses = _jnp.stack([_guess_pair(p[2]) for p in pairs])
    best, fine = _register_pairs_vmapped(c1, c2, guesses, cfg, flat_cap)
    best = jax.tree.map(np.asarray, jax.device_get(best))
    fine = jax.tree.map(np.asarray, jax.device_get(fine))
    out = []
    for i in range(len(pairs)):
        out.append(
            (
                jax.tree.map(lambda a: a[i], best),
                jax.tree.map(lambda a: a[i], fine),
            )
        )
    return out


def register_pair(
    cloud_1: Cloud,
    cloud_2: Cloud,
    angle_guess_deg: float,
    cfg: RegistrationConfig = RegistrationConfig(),
    flat_cap: int = 32768,
    timer: StageTimer | None = None,
) -> tuple[object, object]:
    """Returns (best coarse IcpResult, fine IcpResult or None)."""
    timer = timer or StageTimer()
    if not cfg.use_refinement:
        with timer.stage("coarse"):
            src, src_mask, _, _ = _prepare_flat(
                cloud_1, flat_cap, cfg.voxel_leaf, cfg.normal_radius
            )
            tgt, tgt_mask, tgt_normals, normal_ok = _prepare_flat(
                cloud_2, flat_cap, cfg.voxel_leaf, cfg.normal_radius
            )
            results = _coarse_two_guesses(
                src, src_mask, tgt, tgt_mask, tgt_normals, normal_ok,
                _guess_pair(angle_guess_deg), cfg,
            )
            best_i = 0 if float(results.fitness[0]) < float(results.fitness[1]) else 1
            best = jax.tree.map(lambda a: a[best_i], results)
            _ = float(best.fitness)
        return best, None

    with timer.stage("coarse+fine"):
        best, fine = _register_pair_fused(
            cloud_1, cloud_2, _guess_pair(angle_guess_deg), cfg, flat_cap
        )
        # force results to the host so the timer covers real execution
        best = jax.tree.map(np.asarray, jax.device_get(best))
        fine = jax.tree.map(np.asarray, jax.device_get(fine))
    # split this pair's fused wall time across the reference's two report lines
    dt = timer.totals_ms.pop("coarse+fine", 0.0)
    timer.counts.pop("coarse+fine", None)
    timer.totals_ms["coarse"] += dt / 2
    timer.totals_ms["fine"] += dt / 2
    return best, fine


def _rotmat_to_euler_f32(r: np.ndarray) -> np.ndarray:
    """float32 euler extraction
    (/root/reference/BatchTopPartRegistration.cpp:290-309)."""
    r = np.asarray(r, np.float32)
    sy = np.sqrt(r[0, 0] * r[0, 0] + r[1, 0] * r[1, 0])
    if sy >= 1e-6:
        return np.array(
            [np.arctan2(r[2, 1], r[2, 2]), np.arctan2(-r[2, 0], sy), np.arctan2(r[1, 0], r[0, 0])],
            np.float32,
        )
    return np.array(
        [np.arctan2(-r[1, 2], r[1, 1]), np.arctan2(-r[2, 0], sy), 0.0], np.float32
    )


def run_batch_top_part_registration(
    match_results_filename: str,
    point_cloud_dir: str,
    cfg: RegistrationConfig = RegistrationConfig(),
    report_path: str = "./icp_precision_report.txt",
    capacity: int | None = None,
    flat_cap: int = 32768,
    pair_batch: int = 1,
) -> list[PairReport]:
    """The batch evaluator.  Returns per-pair reports; writes the precision
    report and prints the reference-style summary.

    ``pair_batch > 1`` runs that many pairs as one vmapped device dispatch
    (requires an explicit ``capacity`` so all clouds share one shape)."""
    matches = load_match_results(match_results_filename)
    timer = StageTimer()
    reports: list[PairReport] = []
    count_success = 0
    count_failure = 0
    if pair_batch > 1 and capacity is None:
        raise ValueError("pair_batch > 1 requires an explicit cloud capacity")

    def result_stream():
        """Yield (match, best, fine) — sequentially or pair-batched."""
        if pair_batch <= 1:
            for m in matches:
                c1 = load_cloud_pcd(
                    os.path.join(point_cloud_dir, f"{m.query_idx:06d}.pcd"), capacity
                )
                c2 = load_cloud_pcd(
                    os.path.join(point_cloud_dir, f"{m.match_idx:06d}.pcd"), capacity
                )
                best, fine = register_pair(
                    c1, c2, m.angle_guess, cfg, flat_cap=flat_cap, timer=timer
                )
                yield m, best, fine
            return
        for start in range(0, len(matches), pair_batch):
            chunk = matches[start : start + pair_batch]
            # a short tail repeats its last pair to keep the compiled shape
            padded = chunk + [chunk[-1]] * (pair_batch - len(chunk))
            pairs = [
                (
                    load_cloud_pcd(
                        os.path.join(point_cloud_dir, f"{m.query_idx:06d}.pcd"),
                        capacity,
                    ),
                    load_cloud_pcd(
                        os.path.join(point_cloud_dir, f"{m.match_idx:06d}.pcd"),
                        capacity,
                    ),
                    m.angle_guess,
                )
                for m in padded
            ]
            with timer.stage("coarse+fine", items=len(chunk)):
                results = register_pairs(pairs, cfg, flat_cap=flat_cap)
            dt = timer.totals_ms.pop("coarse+fine", 0.0)
            timer.counts.pop("coarse+fine", None)
            timer.totals_ms["coarse"] += dt / 2
            timer.totals_ms["fine"] += dt / 2
            for m, (best, fine) in zip(chunk, results):
                yield m, best, fine

    with open(report_path, "w") as report:
        for m, best, fine in result_stream():
            log.green(f"Processing match: {m.query_idx} and {m.match_idx}")
            if fine is None:  # use_refinement=False: coarse only, no report
                reports.append(
                    PairReport(m.query_idx, m.match_idx, False,
                               float(best.fitness), np.nan, np.nan, np.nan,
                               np.asarray(best.transform))
                )
                continue
            t_coarse = np.asarray(best.transform)
            t_fine = np.asarray(fine.transform)
            fit_fine = float(fine.fitness)
            log.info(
                f"is icp converged: {bool(fine.converged)}, fitness score: {fit_fine}"
            )

            if fit_fine > cfg.failure_fitness:
                log.red("3D ICP Failed. ")
                count_failure += 1
                reports.append(
                    PairReport(m.query_idx, m.match_idx, False, float(best.fitness),
                               fit_fine, np.nan, np.nan, t_fine)
                )
                continue

            diff_x = np.float32(t_fine[0, 3]) - np.float32(t_coarse[0, 3])
            diff_y = np.float32(t_fine[1, 3]) - np.float32(t_coarse[1, 3])
            diff_xy = float(np.sqrt(diff_x * diff_x + diff_y * diff_y))
            rela_rot = np.linalg.inv(t_fine[:3, :3].astype(np.float32)) @ t_coarse[
                :3, :3
            ].astype(np.float32)
            diff_yaw = float(_rotmat_to_euler_f32(rela_rot)[2]) / math.pi * 180.0
            if diff_yaw > 180.0:
                diff_yaw -= 360.0
            if diff_yaw < -180.0:
                diff_yaw += 360.0
            log.info(f"diff_xy: {diff_xy}, diff_yaw: {diff_yaw}")
            report.write(f"{_ostream_float(diff_xy)} {_ostream_float(diff_yaw)}\n")
            count_success += 1
            reports.append(
                PairReport(m.query_idx, m.match_idx, True, float(best.fitness),
                           fit_fine, diff_xy, diff_yaw, t_fine)
            )

    n = max(len(matches), 1)
    log.green(f"[TIME] Avg Tiempo for 1st Stage (coarse): {timer.totals_ms['coarse'] / n}")
    log.green(f"[TIME] Avg Tiempo for 2nd Stage (fine): {timer.totals_ms['fine'] / n}")
    total = count_success + count_failure
    sr = count_success / total if total else float("nan")
    log.info(
        f"count_success: {count_success}, count_failure: {count_failure}, SR: {sr}. "
    )
    return reports


def run_batch_whole_registration(
    match_results_filename: str,
    point_cloud_dir: str,
    cfg: RegistrationConfig | None = None,
    report_path: str = "./icp_precision_report_3d_icp_directly.txt",
    capacity: int | None = None,
) -> tuple[int, int]:
    """Ablation: direct 3-D ICP from the yaw guess on whole downsampled
    clouds (/root/reference/BatchWholeRegistration.cpp:311-418).  The report
    file is created but — like the reference — never written to; only the
    success/failure counts are reported.  Returns (success, failure)."""
    from pctpu.config import WHOLE_ICP

    if cfg is None:
        cfg = RegistrationConfig(fine=WHOLE_ICP)
    matches = load_match_results(match_results_filename)
    timer = StageTimer()
    count_success = 0
    count_failure = 0
    open(report_path, "w").close()

    for m in matches:
        log.green(f"Processing match: {m.query_idx} and {m.match_idx}")
        c1 = load_cloud_pcd(os.path.join(point_cloud_dir, f"{m.query_idx:06d}.pcd"), capacity)
        c2 = load_cloud_pcd(os.path.join(point_cloud_dir, f"{m.match_idx:06d}.pcd"), capacity)
        with timer.stage("fine"):
            guess = jnp.asarray(
                yaw_rotation_4x4(m.angle_guess / 180.0 * math.pi).astype(np.float32)
            )
            s_xyz, s_mask, _ = _voxel_full(c1, cfg.voxel_leaf)
            t_xyz, t_mask, _ = _voxel_full(c2, cfg.voxel_leaf)
            fine = icp_point_to_point(s_xyz, s_mask, t_xyz, t_mask, guess, cfg.fine)
            fit = float(fine.fitness)
        log.info(f"is icp converged: {bool(fine.converged)}, fitness score: {fit}")
        if fit > cfg.failure_fitness:
            log.red("3D ICP Failed. ")
            count_failure += 1
        else:
            log.green("3D ICP Passed. ")
            count_success += 1

    n = max(len(matches), 1)
    log.green(f"[TIME] Avg Tiempo for 2nd Stage (fine): {timer.totals_ms['fine'] / n}")
    total = count_success + count_failure
    sr = count_success / total if total else float("nan")
    log.info(
        f"count_success: {count_success}, count_failure: {count_failure}, SR: {sr}. "
    )
    return count_success, count_failure
