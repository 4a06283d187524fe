"""Differential tests: ops/icp.py vs the plain-loop PCL oracle (ref_impl).

Per-iteration transform + MSE agreement, both epsilon exits, the
<3-correspondence abort, and fitness — the same rigor as the ground/BEV
differential suite (VERDICT round 1, missing item 1)."""

import numpy as np
import pytest

from pctpu.config import IcpConfig
from pctpu.ops.icp import icp_point_to_point, icp_trace

from . import ref_impl


def scene(seed, n_src=60, n_tgt=90, yaw_deg=8.0, shift=(0.4, -0.3, 0.1),
          noise=0.03):
    """A structured scene (3 walls + scatter) with a known rigid offset.

    ``noise`` keeps the converged MSE well above the 1e-12 absolute-MSE exit,
    which is a knife edge between the f32 op and the f64 oracle on perfectly
    matching clouds."""
    rng = np.random.default_rng(seed)
    pts = []
    for k in range(3):
        n = n_tgt // 3
        u = rng.uniform(-5, 5, n)
        if k == 0:
            pts.append(np.stack([u, np.full(n, 4.0) + rng.normal(0, 0.02, n),
                                 rng.uniform(0, 2, n)], 1))
        elif k == 1:
            pts.append(np.stack([np.full(n, -4.0) + rng.normal(0, 0.02, n), u,
                                 rng.uniform(0, 2, n)], 1))
        else:
            pts.append(np.stack([u, u * 0.5 + rng.normal(0, 0.05, n),
                                 rng.uniform(0, 1, n)], 1))
    tgt = np.concatenate(pts).astype(np.float32)
    th = np.radians(yaw_deg)
    rot = np.array([[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0],
                    [0, 0, 1]], np.float32)
    src = (tgt[rng.permutation(n_tgt)[:n_src]] - np.asarray(shift, np.float32)) @ rot
    src = src + rng.normal(0, noise, src.shape)
    return src.astype(np.float32), tgt


def run_both(src, tgt, guess, cfg: IcpConfig, tgt_normals=None, normal_ok=None):
    smask = np.ones(len(src), bool)
    tmask = np.ones(len(tgt), bool)
    if tgt_normals is None:
        res, trace = icp_trace(src, smask, tgt, tmask, guess, cfg)
    else:
        res, trace = icp_trace(
            src, smask, tgt, tmask, guess, cfg,
            tgt_normals=np.asarray(tgt_normals, np.float32),
            normal_mask=np.asarray(normal_ok, bool),
        )
    ref = ref_impl.icp_ref(
        src, tgt, guess,
        cfg.max_correspondence_distance, cfg.max_iterations,
        cfg.transformation_epsilon, cfg.euclidean_fitness_epsilon,
        tgt_normals=tgt_normals, normal_ok=normal_ok,
    )
    return res, {k: np.asarray(v) for k, v in trace.items()}, ref


def assert_traces_match(trace, ref, atol_t=5e-4, rtol_mse=5e-4,
                        check_mse=True, atol_mse=0.0):
    """``atol_mse`` exists because the op's per-iteration MSE averages the NN
    kernel's score-domain d² (|t|² − 2q·t + |q|², absolute error up to
    ~8·max|p|²·2⁻²³) while the oracle's d² is exact — for scenes whose
    converged MSE is small, a pure relative tolerance under-allows that
    documented window (first seen at fuzz seed 800072)."""
    ref_steps = ref["trace"]
    L = len(ref_steps)
    done = np.asarray(trace["done"])
    jax_L = int(np.argmax(done)) + 1 if done.any() else len(done)
    assert jax_L == L, f"iteration counts differ: jax {jax_L} vs oracle {L}"
    for i, (t_ref, mse_ref, ncorr) in enumerate(ref_steps):
        np.testing.assert_allclose(
            np.asarray(trace["transform"])[i], t_ref, atol=atol_t, rtol=0,
            err_msg=f"iteration {i} transform",
        )
        if check_mse and np.isfinite(mse_ref):
            np.testing.assert_allclose(
                float(np.asarray(trace["mse"])[i]), mse_ref, rtol=rtol_mse,
                atol=atol_mse, err_msg=f"iteration {i} mse",
            )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_point_to_point_per_iteration(seed):
    src, tgt = scene(seed)
    guess = np.eye(4, dtype=np.float32)
    cfg = IcpConfig(max_correspondence_distance=4.0, max_iterations=8)
    res, trace, ref = run_both(src, tgt, guess, cfg)
    assert_traces_match(trace, ref)
    assert bool(res.converged) == ref["converged"]
    np.testing.assert_allclose(float(res.fitness), ref["fitness"], rtol=1e-3, atol=1e-7)


def test_point_to_point_fine_config():
    """The reference's fine stage: maxCorr 1 m, ε_t 1e-6, fitness ε 0.01
    (/root/reference/BatchTopPartRegistration.cpp:223-226)."""
    src, tgt = scene(3, yaw_deg=2.0, shift=(0.15, 0.1, 0.0))
    guess = np.eye(4, dtype=np.float32)
    cfg = IcpConfig(
        max_correspondence_distance=1.0, max_iterations=100,
        transformation_epsilon=1e-6, euclidean_fitness_epsilon=0.01,
    )
    res, trace, ref = run_both(src, tgt, guess, cfg)
    assert len(ref["trace"]) < 100  # epsilon exit actually fires
    assert_traces_match(trace, ref)
    assert bool(res.converged) == ref["converged"] is True


def test_transformation_epsilon_exit():
    src, tgt = scene(4, yaw_deg=0.5, shift=(0.05, 0.0, 0.0))
    guess = np.eye(4, dtype=np.float32)
    cfg = IcpConfig(
        max_correspondence_distance=4.0, max_iterations=50,
        transformation_epsilon=1e-4,
    )
    res, trace, ref = run_both(src, tgt, guess, cfg)
    assert len(ref["trace"]) < 50
    assert_traces_match(trace, ref)
    assert bool(res.converged) is True


def test_relative_mse_exit():
    src, tgt = scene(5)
    guess = np.eye(4, dtype=np.float32)
    cfg = IcpConfig(
        max_correspondence_distance=4.0, max_iterations=50,
        euclidean_fitness_epsilon=0.5,
    )
    res, trace, ref = run_both(src, tgt, guess, cfg)
    assert len(ref["trace"]) == 2  # big rel-MSE epsilon exits on iteration 2
    assert_traces_match(trace, ref)


def test_too_few_correspondences_abort():
    src, tgt = scene(6)
    src = src + np.float32(500.0)  # far away: nothing within maxCorr
    guess = np.eye(4, dtype=np.float32)
    cfg = IcpConfig(max_correspondence_distance=0.5, max_iterations=10)
    res, trace, ref = run_both(src, tgt, guess, cfg)
    assert len(ref["trace"]) == 1 and ref["converged"] is False
    assert_traces_match(trace, ref, check_mse=False)
    assert bool(res.converged) is False
    np.testing.assert_array_equal(np.asarray(res.transform), guess)


@pytest.mark.parametrize("seed", [0, 1])
def test_point_to_plane_per_iteration(seed):
    """Coarse-stage semantics: point-to-plane LLS on z=0 clouds with 2-D
    normals; some targets have undefined normals (excluded, documented
    divergence shared by op and oracle)."""
    rng = np.random.default_rng(seed + 10)
    n = 90
    u = rng.uniform(-6, 6, n)
    wall = rng.integers(0, 2, n)
    x = np.where(wall == 0, u, -4.0 + rng.normal(0, 0.01, n))
    y = np.where(wall == 0, 4.0 + rng.normal(0, 0.01, n), u)
    tgt = np.stack([x, y, np.zeros(n)], 1).astype(np.float32)
    nrm = np.where(
        wall[:, None] == 0,
        np.array([[0.0, 1.0, 0.0]], np.float32),
        np.array([[1.0, 0.0, 0.0]], np.float32),
    ).astype(np.float32)
    ok = rng.random(n) > 0.1
    th = np.radians(5.0)
    rot = np.array([[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0],
                    [0, 0, 1]], np.float32)
    src = (tgt[rng.permutation(n)[:60]] - np.float32([0.3, -0.2, 0.0])) @ rot
    src = (src + rng.normal(0, 0.02, src.shape) * np.float32([1, 1, 0])).astype(
        np.float32
    )
    guess = np.eye(4, dtype=np.float32)
    # 4 iterations: past that the MSE plateaus and the 1e-12 absolute-MSE
    # exit becomes an f32-vs-f64 knife edge between op and oracle
    cfg = IcpConfig(max_correspondence_distance=10.0, max_iterations=4,
                    point_to_plane=True)
    res, trace, ref = run_both(src, tgt, guess, cfg, tgt_normals=nrm, normal_ok=ok)
    assert_traces_match(trace, ref, atol_t=2e-3, rtol_mse=2e-3)
    assert bool(res.converged) == ref["converged"]
    np.testing.assert_allclose(float(res.fitness), ref["fitness"], rtol=2e-3, atol=1e-7)


@pytest.mark.slow
def test_point_to_point_fuzz_sweep():
    """Seed sweep of the per-iteration differential, with a knife-edge
    filter: a seed only asserts when the (f64) oracle's iteration count and
    convergence flag are stable under a 1e-6 input perturbation — otherwise
    the f32-op-vs-f64-oracle comparison is legitimately undefined (the exact
    epsilon-exit iteration sits on a rounding boundary).  Requires that a
    healthy majority of seeds actually assert, so the filter can't hollow
    the test out."""
    asserted = skipped = 0
    for seed in range(100, 140):
        yaw = 3.0 + (seed % 7) * 2.5
        shift = (0.2 + 0.05 * (seed % 5), -0.25 + 0.1 * (seed % 3), 0.05)
        src, tgt = scene(seed, yaw_deg=yaw, shift=shift)
        guess = np.eye(4, dtype=np.float32)
        cfg = IcpConfig(max_correspondence_distance=4.0, max_iterations=8)

        ref_a = ref_impl.icp_ref(
            src, tgt, guess, cfg.max_correspondence_distance,
            cfg.max_iterations, cfg.transformation_epsilon,
            cfg.euclidean_fitness_epsilon,
        )
        ref_b = ref_impl.icp_ref(
            src + np.float32(1e-6), tgt, guess,
            cfg.max_correspondence_distance, cfg.max_iterations,
            cfg.transformation_epsilon, cfg.euclidean_fitness_epsilon,
        )
        if (len(ref_a["trace"]) != len(ref_b["trace"])
                or ref_a["converged"] != ref_b["converged"]):
            skipped += 1
            continue
        # plateau filter: once consecutive oracle MSEs differ by less than
        # f32 MSE resolution, the 1e-12 absolute-MSE exit becomes an
        # f32-op-vs-f64-oracle knife edge (see the hand-tuned tests above)
        mses = [m for _, m, _ in ref_a["trace"] if np.isfinite(m)]
        if any(abs(b - a) < 1e-7 * max(b, 1e-9)
               for a, b in zip(mses, mses[1:])):
            skipped += 1
            continue

        res, trace, ref = run_both(src, tgt, guess, cfg)
        assert_traces_match(trace, ref, atol_t=1e-3, rtol_mse=1e-3)
        assert bool(res.converged) == ref["converged"], seed
        np.testing.assert_allclose(
            float(res.fitness), ref["fitness"], rtol=2e-3, atol=1e-7,
            err_msg=f"seed {seed}",
        )
        asserted += 1
        if asserted >= 15:
            break
    assert asserted >= 10, (asserted, skipped)


def _plane_scene(seed, yaw_deg, shift):
    """Two-wall z=0 scene with known normals (coarse-stage shape)."""
    rng = np.random.default_rng(seed)
    n = 90
    u = rng.uniform(-6, 6, n)
    wall = rng.integers(0, 2, n)
    x = np.where(wall == 0, u, -4.0 + rng.normal(0, 0.01, n))
    y = np.where(wall == 0, 4.0 + rng.normal(0, 0.01, n), u)
    tgt = np.stack([x, y, np.zeros(n)], 1).astype(np.float32)
    nrm = np.where(
        wall[:, None] == 0,
        np.array([[0.0, 1.0, 0.0]], np.float32),
        np.array([[1.0, 0.0, 0.0]], np.float32),
    ).astype(np.float32)
    ok = rng.random(n) > 0.1
    th = np.radians(yaw_deg)
    rot = np.array([[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0],
                    [0, 0, 1]], np.float32)
    src = (tgt[rng.permutation(n)[:60]] - np.asarray(shift, np.float32)) @ rot
    src = (src + rng.normal(0, 0.02, src.shape) * np.float32([1, 1, 0])).astype(
        np.float32
    )
    return src, tgt, nrm, ok


@pytest.mark.slow
def test_point_to_plane_fuzz_sweep():
    """The coarse-stage LLS path under the same filtered seed sweep."""
    asserted = skipped = 0
    for seed in range(200, 240):
        yaw = 2.0 + (seed % 6) * 1.5
        shift = (0.15 + 0.05 * (seed % 4), -0.2 + 0.08 * (seed % 3), 0.0)
        src, tgt, nrm, ok = _plane_scene(seed, yaw, shift)
        guess = np.eye(4, dtype=np.float32)
        cfg = IcpConfig(max_correspondence_distance=10.0, max_iterations=4,
                        point_to_plane=True)

        def oracle(s):
            return ref_impl.icp_ref(
                s, tgt, guess, cfg.max_correspondence_distance,
                cfg.max_iterations, cfg.transformation_epsilon,
                cfg.euclidean_fitness_epsilon, tgt_normals=nrm, normal_ok=ok,
            )

        ref_a = oracle(src)
        ref_b = oracle(src + np.float32(1e-6))
        if (len(ref_a["trace"]) != len(ref_b["trace"])
                or ref_a["converged"] != ref_b["converged"]):
            skipped += 1
            continue
        mses = [m for _, m, _ in ref_a["trace"] if np.isfinite(m)]
        if any(abs(b - a) < 1e-7 * max(b, 1e-9)
               for a, b in zip(mses, mses[1:])):
            skipped += 1
            continue

        res, trace, ref = run_both(src, tgt, guess, cfg, tgt_normals=nrm,
                                   normal_ok=ok)
        assert_traces_match(trace, ref, atol_t=3e-3, rtol_mse=3e-3)
        assert bool(res.converged) == ref["converged"], seed
        asserted += 1
        if asserted >= 12:
            break
    assert asserted >= 8, (asserted, skipped)


def test_trace_matches_production_icp():
    """icp_trace and the production while_loop icp return identical results."""
    src, tgt = scene(7)
    smask = np.ones(len(src), bool)
    tmask = np.ones(len(tgt), bool)
    guess = np.eye(4, dtype=np.float32)
    cfg = IcpConfig(max_correspondence_distance=4.0, max_iterations=8)
    res_t, _ = icp_trace(src, smask, tgt, tmask, guess, cfg)
    res_p = icp_point_to_point(src, smask, tgt, tmask, guess, cfg)
    np.testing.assert_array_equal(np.asarray(res_t.transform), np.asarray(res_p.transform))
    assert float(res_t.fitness) == float(res_p.fitness)
    assert bool(res_t.converged) == bool(res_p.converged)


def test_max_iterations_zero_do_while():
    """PCL's do-while performs one pass even with max_iterations=0 and
    reports converged via the iterations criterion; op and oracle agree."""
    src, tgt = scene(9)
    guess = np.eye(4, dtype=np.float32)
    cfg = IcpConfig(max_correspondence_distance=4.0, max_iterations=0)
    res, trace, ref = run_both(src, tgt, guess, cfg)
    assert len(ref["trace"]) == 1 and ref["converged"] is True
    assert bool(res.converged) is True
    # the single-iteration transform differs from the guess (one estimation)
    assert not np.allclose(np.asarray(res.transform), guess)
    assert_traces_match(trace, ref)


def test_campaign_seed_800479_plateau_filter():
    """Fuzz campaign seed 800479 (point mode): the oracle's it7→it8 MSE
    plateau is 4.3e-10 ≈ 2 f32 ulps, so the f32 stack's consecutive MSEs can
    round EQUAL and trip the 1e-12 absolute exit one iteration early — a
    measurement knife edge, not a semantic bug.  The sweep's plateau filter
    must catch it (margin ≥ 5e-7 relative, a few f32 ulps)."""
    seed = 800479
    yaw = 2.0 + (seed % 11) * 1.7
    shift = (0.2 + 0.04 * (seed % 6), -0.25 + 0.09 * (seed % 4),
             0.05 * (seed % 3))
    src, tgt = scene(seed, yaw_deg=yaw, shift=shift)
    ref = ref_impl.icp_ref(src, tgt, np.eye(4, dtype=np.float32), 4.0, 8,
                           0.0, -np.inf)
    mses = [m for _, m, _ in ref["trace"] if np.isfinite(m)]
    assert any(abs(b - a) < 5e-7 * max(b, 1e-9)
               for a, b in zip(mses, mses[1:])), (
        "the knife-edge plateau disappeared — pin a different seed"
    )


def test_campaign_seed_800072_score_window():
    """Fuzz campaign seed 800072 (plane mode): iteration-1 MSE differs from
    the oracle by 9.2e-6 absolute — inside the NN kernel's documented
    score-domain d² window (8·max|p|²·2⁻²³ ≈ 4.9e-5 here) but 8% over a pure
    3e-3 relative tolerance at this scene's small MSE.  The trace assert
    must allow the window as an absolute term."""
    seed = 800072
    yaw = 1.5 + (seed % 7) * 1.3
    shift = (0.1 + 0.05 * (seed % 5), -0.15 + 0.07 * (seed % 4), 0.0)
    src, tgt, nrm, ok = _plane_scene(seed, yaw, shift)
    cfg = IcpConfig(max_correspondence_distance=10.0, max_iterations=4,
                    point_to_plane=True)
    res, trace, ref = run_both(src, tgt, np.eye(4, dtype=np.float32), cfg,
                               tgt_normals=nrm, normal_ok=ok)
    win = 8.0 * float(np.max(np.sum(tgt * tgt, axis=1))) * 2.0**-23
    assert_traces_match(trace, ref, atol_t=3e-3, rtol_mse=3e-3, atol_mse=win)
    assert bool(res.converged) == ref["converged"]
