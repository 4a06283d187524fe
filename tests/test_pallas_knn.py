"""Pallas fused-NN kernel: interpret-mode correctness (real-TPU runs are
exercised by bench.py / the driver)."""

import numpy as np
import pytest

from pctpu.ops.pallas_knn import PALLAS_AVAILABLE, pallas_nn_1

pytestmark = pytest.mark.skipif(not PALLAS_AVAILABLE, reason="pallas unavailable")


@pytest.mark.slow
def test_pallas_nn_matches_bruteforce_interpret():
    rng = np.random.default_rng(0)
    q = rng.uniform(-10, 10, (200, 3)).astype(np.float32)
    t = rng.uniform(-10, 10, (600, 3)).astype(np.float32)
    qm = np.ones(200, bool)
    tm = np.ones(600, bool)
    tm[550:] = False
    idx, d2 = pallas_nn_1(q, qm, t, tm, tq=128, tt=256, interpret=True)
    full = ((q[:, None] - t[None]) ** 2).sum(-1)
    full[:, ~tm] = np.inf
    np.testing.assert_array_equal(np.asarray(idx), full.argmin(1))
    np.testing.assert_allclose(np.asarray(d2), full.min(1), rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_pallas_nn_masked_queries_interpret():
    rng = np.random.default_rng(1)
    q = rng.uniform(-5, 5, (130, 3)).astype(np.float32)
    t = rng.uniform(-5, 5, (300, 3)).astype(np.float32)
    qm = np.ones(130, bool)
    qm[100:] = False
    idx, d2 = pallas_nn_1(q, qm, t, np.ones(300, bool), tq=128, tt=256, interpret=True)
    assert np.all(np.isinf(np.asarray(d2)[100:]))
