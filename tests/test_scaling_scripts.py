"""Smoke coverage for the packaged evidence harnesses:

* scripts/run_scaling_bench.py — the multi-chip scaling measurement (small
  geometry on the suite's 8 virtual CPU devices: mesh construction, the
  in-scan measurement path, the byte-identity cross-check, and the
  registration scaling leg);
* scripts/fuzz_campaign.py — one tiny fresh-seed sweep end-to-end (regime
  loop, tolerance-vs-bitexact diffing, prep-op oracles, exit status).

These scripts are run standalone for hours on real campaigns; the suite pins
their plumbing so refactors of the ops/pipeline APIs they drive can't silently
break them.
"""

import subprocess
import sys

import pytest


@pytest.mark.slow
def test_measure_sharded_small_two_devices():
    from scripts.run_scaling_bench import measure_sharded

    out = measure_sharded(2, "tolerance", check_identity=True, small=True)
    assert out["devices"] == 2
    assert out["clouds_per_sec"] > 0
    assert out["outputs_byte_identical_to_single_device"] is True
    assert "ERROR" not in out


@pytest.mark.slow
def test_measure_registration_sharded_small():
    from scripts.run_scaling_bench import measure_registration_sharded

    out = measure_registration_sharded(2, small=True)
    assert out["registration_pairs_per_sec"] > 0
    assert out["pair_batch"] == 4


@pytest.mark.slow
def test_fuzz_campaign_one_case_subprocess():
    # subprocess: the script owns its jax platform config; --cases 1 walks
    # every regime once plus the prep-op oracles
    r = subprocess.run(
        [sys.executable, "-m", "scripts.fuzz_campaign", "--start", "555000",
         "--cases", "1"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "failures=0" in r.stdout


@pytest.mark.slow
def test_fuzz_campaign_native_leg_inprocess():
    # in-process (shares the suite's jit cache); 4 cases per regime walk the
    # pctpu-vs-C++ byte diff, the every-4th triple comparison with the Python
    # oracle, and the float-BEV/top-flatten native legs
    from scripts.fuzz_campaign import run_native_sweep

    assert run_native_sweep(557000, 4) == 0


@pytest.mark.slow
def test_fuzz_campaign_twostage_leg_inprocess():
    # in-process (shares the suite's jit cache — the subprocess leg would pay
    # a cold CPU compile of the registration stages); one asserted case walks
    # scene gen -> knife-edge filter -> production run -> cross-stack asserts
    from scripts.fuzz_campaign import run_twostage_sweep

    assert run_twostage_sweep(556000, 1) == 0
