"""Microbench: flat device sorts + building blocks for probe dedup.

Small gene panels (shark's primary use case) probe each distinct k-mer
many times per batch (bench workload: 5.77M windows over ~742k distinct
positions). Since XLA's gather is ISSUE-limited, gathering only first
occurrences could cut probe cost ~8x — IF the flat sorts needed to group
duplicates (sort by position, compact firsts, unsort) are cheap enough.
This prices those blocks at batch scale.

Usage: python bench/sort_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = 65536 * 88  # windows per 64k batch at L104


def log(m):
    print(f"[sort] {m}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    # ~742k distinct 33-bit positions, each repeated ~8x (bench profile)
    distinct = rng.integers(0, 1 << 33, size=742_000, dtype=np.uint64)
    picks = rng.integers(0, distinct.size, size=N)
    pos = distinct[picks]
    pos_lo = jax.device_put(pos.astype(np.uint32), dev)
    pos_hi = jax.device_put((pos >> 32).astype(np.uint32), dev)
    payload = jax.device_put(np.arange(N, dtype=np.uint32), dev)
    table = jax.device_put(
        rng.integers(0, 1 << 30, size=(1 << 19, 2, 8), dtype=np.uint32), dev
    )

    def timeit(name, f, *args, reps=4):
        g = jax.jit(f)
        np.asarray(g(*args))  # compile+warm
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            np.asarray(g(*args))
            best = min(best, time.time() - t0)
        log(f"{name:<42} {best * 1000:7.1f} ms")
        return best

    timeit("noop (fetch floor, scalar)", lambda x: x.sum(), payload)
    timeit("flat sort u32 [5.77M]", lambda x: jnp.sort(x).sum(), pos_lo)
    timeit(
        "lax.sort 1key+1payload [5.77M]",
        lambda k, p: lax.sort((k, p), num_keys=1)[1].sum(),
        pos_lo,
        payload,
    )
    timeit(
        "lax.sort 2keys+1payload [5.77M]",
        lambda h, l, p: lax.sort((h, l, p), num_keys=2)[2].sum(),
        pos_hi,
        pos_lo,
        payload,
    )
    timeit(
        "argsort u32 [5.77M]",
        lambda x: jnp.argsort(x).astype(jnp.uint32).sum(),
        pos_lo,
    )
    # gather at 1/8 density (the dedup payoff): 742k rows of 64B
    idx_small = jax.device_put(
        rng.integers(0, 1 << 19, size=742_000).astype(np.int32), dev
    )
    timeit(
        "bucket gather 742k x 64B",
        lambda i: jnp.take(table, i, axis=0).astype(jnp.uint32).sum(),
        idx_small,
    )
    idx_full = jax.device_put(
        rng.integers(0, 1 << 19, size=N).astype(np.int32), dev
    )
    timeit(
        "bucket gather 5.77M x 64B (control)",
        lambda i: jnp.take(table, i, axis=0).astype(jnp.uint32).sum(),
        idx_full,
    )
    # segmented bookkeeping after a sorted gather: first-occurrence flags
    # + unique-rank prefix sum (the glue either side of the small gather)
    def propagate(k, v):
        isf = jnp.concatenate([jnp.ones((1,), jnp.bool_), k[1:] != k[:-1]])
        seg = jnp.cumsum(isf.astype(jnp.int32))
        return (seg.astype(jnp.uint32) + v).sum()

    timeit("is_first + cumsum [5.77M]", propagate, pos_lo, payload)


if __name__ == "__main__":
    main()
