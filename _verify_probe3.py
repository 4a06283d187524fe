import time, sys
t0=time.time()
import bench
import numpy as np
# instrument: wrap stages with prints
orig = bench.verify_on_device
def timed():
    r = orig()
    return r
t=time.time()
print("start verify", flush=True)
print(timed(), round(time.time()-t,1), "s", flush=True)
