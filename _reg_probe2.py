import time, numpy as np, jax, jax.numpy as jnp
# 1) kernel correctness+speed on chip
from pctpu.ops.pallas_knn import pallas_nn_1_pruned, spatial_sort
from pctpu.ops.knn import nn_1
rng = np.random.default_rng(7)
n = 49152
pts = rng.uniform(-70, 70, (n, 3)).astype(np.float32)
pts[:, 2] = rng.uniform(-2, 8, n).astype(np.float32)
tgt = (pts + rng.normal(0, 0.02, (n, 3))).astype(np.float32)
q, qm, _ = spatial_sort(jnp.asarray(pts), jnp.ones(n, bool))
t, tm, _ = spatial_sort(jnp.asarray(tgt), jnp.ones(n, bool))
q = jax.device_put(q); t = jax.device_put(t)
i_ref, d_ref = jax.device_get(jax.jit(nn_1)(q, qm, t, tm))
i2, d2 = jax.device_get(jax.jit(lambda a,b,c,d: pallas_nn_1_pruned(a,b,c,d,max_distance=1.0))(q, qm, t, tm))
sel = d_ref <= 1.0
print("thr swaps:", int(np.sum((i2 != i_ref) & sel)), flush=True)
def timeit(f):
    @jax.jit
    def run(q, off):
        def body(carry, r):
            i, d = f(q * (1.0 + 1e-9 * (r + off)))
            return carry + jnp.sum(i), None
        tot, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(20, dtype=jnp.float32))
        return tot
    int(run(q, jnp.float32(0.)))
    t0 = time.perf_counter()
    int(run(q, jnp.float32(100.)))
    return (time.perf_counter() - t0) / 20 * 1000
i_ref_d = jax.device_put(jnp.asarray(i_ref)); d_ref_d = jax.device_put(jnp.asarray(d_ref))
print("thr: %.2f ms" % timeit(lambda qq: pallas_nn_1_pruned(qq, qm, t, tm, max_distance=1.0)), flush=True)
print("fit: %.2f ms" % timeit(lambda qq: pallas_nn_1_pruned(qq, qm, t, tm)), flush=True)
print("thr+seed: %.2f ms" % timeit(lambda qq: pallas_nn_1_pruned(qq, qm, t, tm, max_distance=1.0, seed_idx=i_ref_d, seed_d2=d_ref_d)), flush=True)
print("fit+seed: %.2f ms" % timeit(lambda qq: pallas_nn_1_pruned(qq, qm, t, tm, seed_idx=i_ref_d, seed_d2=d_ref_d)), flush=True)
# 2) end-to-end registration both modes (exercises vmap path)
import bench
for seed in (False, True):
    pps = bench.measure_registration(seed_nn=seed)
    print(f"seed_nn={seed}: {pps:.2f} pairs/s", flush=True)
