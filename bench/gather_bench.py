"""Microbenchmark: random-gather throughput on the TPU, the classify
kernel's dominant cost. Informs the probe-path design:

- rows/s vs table size (VMEM-resident small tables vs HBM giants)
- random vs sorted indices (HBM locality)
- row width 4/8/16 bytes (gather granularity)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *args, n=5):
    jax.device_get(f(*args))
    ts = []
    for _ in range(n):
        t0 = time.time()
        jax.device_get(f(*args))
        ts.append(time.time() - t0)
    return min(ts)


def main():
    N = 1 << 22  # probes
    rng = np.random.default_rng(0)

    gather = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum())

    print("probes per call:", N, flush=True)
    floor = timeit(jax.jit(lambda i: i.sum()), jax.device_put(np.zeros(N, np.int32)))
    print(f"dispatch floor: {floor*1000:.1f} ms", flush=True)

    for log_rows, name in [(16, "256KB"), (20, "4MB"), (24, "64MB"), (28, "1GB")]:
        rows = 1 << log_rows
        tab = jax.device_put(np.zeros(rows, np.uint32))
        idx = jax.device_put(
            rng.integers(0, rows, size=N, dtype=np.int64).astype(np.int32)
        )
        dt = timeit(gather, tab, idx)
        print(
            f"table {name:>6} random : {dt*1000:7.1f} ms  "
            f"{N/max(dt-floor,1e-9)/1e6:8.1f} M rows/s",
            flush=True,
        )
        sidx = jax.device_put(np.sort(np.asarray(idx)))
        dt = timeit(gather, tab, sidx)
        print(
            f"table {name:>6} sorted : {dt*1000:7.1f} ms  "
            f"{N/max(dt-floor,1e-9)/1e6:8.1f} M rows/s",
            flush=True,
        )

    # row width at fixed 1GB-class table
    for width in [2, 4, 8]:
        rows = (1 << 28) // width
        tab = jax.device_put(np.zeros((rows, width), np.uint32))
        idx = jax.device_put(
            rng.integers(0, rows, size=N, dtype=np.int64).astype(np.int32)
        )
        g2 = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum())
        dt = timeit(g2, tab, idx)
        print(
            f"1GB table, {4*width}B rows: {dt*1000:7.1f} ms  "
            f"{N/max(dt-floor,1e-9)/1e6:8.1f} M rows/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
