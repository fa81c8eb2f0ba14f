"""Sub-stage profile of the probe FRONT END (unpack -> canonical k-mers
-> XXH64 -> mod-size), which costs ~25 ms/batch on every kernel (19% of
the xl kernel, 16% of classic, 21% of homolog; bench/profile_xl.py).

Stages are cumulative jits on the real txome batch; the deltas say where
a cut would matter before touching the bit-exactness-critical code.

Usage: python bench/profile_front.py
Needs the cached workload from bench/transcriptome_bench.py.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(ROOT, "bench", ".cache", "txome")
B, L, K = 65536, 104, 17


def log(m):
    print(f"[front] {m}", file=sys.stderr, flush=True)


def main():
    fastq = os.path.join(CACHE, "reads50000_500000.fq")
    if not os.path.exists(fastq):
        log("run bench/transcriptome_bench.py once to generate the workload")
        return

    from shark_tpu.classify.step import _mod_size, unpack_codes
    from shark_tpu.io.native import NativeStream
    from shark_tpu.ops.kmers import INVALID, canonical_kmers_jax
    from shark_tpu.ops.xxh64 import xxh64_u64

    ns = NativeStream(fastq, "", B, L, 0, packed=True)
    nb = ns.next_batch()
    packed, vmask = nb[0].copy(), nb[1].copy()
    ns.close()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    pk = jax.device_put(packed, dev)
    vm = jax.device_put(vmask, dev)
    size_bits = 1 << 33

    def f_unpack(pk, vm):
        return unpack_codes(pk, vm)

    def f_canon(pk, vm):
        codes = unpack_codes(pk, vm)
        canon, win_valid = canonical_kmers_jax(codes, K)
        s = K - 1  # windows that can exist, as bloom_positions slices
        return canon[0][:, s:], canon[1][:, s:], win_valid[:, s:]

    def f_hash(pk, vm):
        a, b, wv = f_canon(pk, vm)
        h = xxh64_u64((a, b))
        return h[0], h[1], wv

    def f_mod(pk, vm):
        a, b, wv = f_hash(pk, vm)
        idx_hi, idx_lo = _mod_size((a, b), size_bits)
        return idx_hi, idx_lo, wv

    def f_len(pk, vm):
        codes = unpack_codes(pk, vm)
        return jnp.sum((codes < INVALID).astype(jnp.int32), axis=1)

    stages = {
        "u unpack": jax.jit(
            lambda pk, vm: f_unpack(pk, vm).astype(jnp.uint32).sum()
        ),
        "c +canonical": jax.jit(
            lambda pk, vm: sum(
                x.astype(jnp.uint32).sum() for x in f_canon(pk, vm)
            )
        ),
        "h +xxh64": jax.jit(
            lambda pk, vm: sum(
                x.astype(jnp.uint32).sum() for x in f_hash(pk, vm)
            )
        ),
        "m +mod_size (=front)": jax.jit(
            lambda pk, vm: sum(
                x.astype(jnp.uint32).sum() for x in f_mod(pk, vm)
            )
        ),
        "l length only": jax.jit(
            lambda pk, vm: f_len(pk, vm).astype(jnp.uint32).sum()
        ),
    }

    def timeit(f, reps=3):
        np.asarray(f(pk, vm))
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            np.asarray(f(pk, vm))
            best = min(best, time.time() - t0)
        return best

    for name, fn in stages.items():
        dt = timeit(fn)
        log(f"{name:<22} {dt * 1000:8.1f} ms")


if __name__ == "__main__":
    main()
