import time
import bench
for seed in (False, True):
    pps = bench.measure_registration(seed_nn=seed)
    print(f"seed_nn={seed}: {pps:.2f} pairs/s", flush=True)
