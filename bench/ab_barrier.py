"""A/B: does an optimization_barrier around the bucket-gather's flat
index/output stop XLA from folding the reshape back into a batched gather?

Isolated gathers with a 1-D index run ~158M rows/s on v5e vs ~125M for the
same gather inside the production kernel (docs/PERF.md). bench/ab_flatfront
showed a fully-flat FRONT END doesn't help — XLA refolds. This test pins
the flat shape with lax.optimization_barrier on (i) the flattened index,
(ii) the gathered rows, (iii) both, and compares against the production
take_rows, for the production table layout and the entry8 alternative.

Usage: python bench/ab_barrier.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(ROOT, "bench", ".cache")
B, L, K, C = 65536, 104, 17, 0.6


def log(m):
    print(f"[barrier] {m}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from shark_tpu.classify.hashed import build_hashed_index
    from shark_tpu.classify.step import StaticMeta, _mod_size
    from shark_tpu.config import SharkConfig
    from shark_tpu.io.native import NativeStream
    from shark_tpu.ops.kmers import canonical_kmers_jax
    from shark_tpu.ops.xxh64 import xxh64_u64
    from shark_tpu.pipeline import load_or_build_index
    from shark_tpu.utils.timers import PhaseTimer

    fasta = os.path.join(CACHE, "genes.fa")
    fastq = os.path.join(CACHE, "reads.fq")
    if not os.path.exists(fastq):
        log("run bench.py once to generate the workload")
        return
    cfg = SharkConfig(fasta_path=fasta, sample1_path=fastq, k=K, c=C, bf_gb=1)
    idx_dir = os.path.join(CACHE, "index.d")
    if os.path.isdir(idx_dir):
        cfg.load_index = idx_dir
    index = load_or_build_index(cfg, PhaseTimer())
    meta = StaticMeta.for_index(index, L)

    ns = NativeStream(fastq, "", B, L, 0, packed=True)
    packed, vmask, slot, n = ns.next_batch()
    packed, vmask = packed.copy(), vmask.copy()
    ns.close()

    dev = jax.devices()[0]
    pk = jax.device_put(packed, dev)
    vm = jax.device_put(vmask, dev)

    variants = {}
    prod = build_hashed_index(index)
    if prod is not None:
        variants["prod(e16=%s lgB%d s%d)" % (
            prod[2].entry16, prod[2].lgB, prod[2].slots)] = prod
    e8 = build_hashed_index(index, allow16=False)
    if e8 is not None and (prod is None or prod[2].entry16):
        variants["entry8 lgB%d" % e8[2].lgB] = e8

    from shark_tpu.classify.step import unpack_codes

    def make_front(table_d, hmeta, mode):
        lgB = hmeta.lgB

        def take(tab, idx):
            flat_idx = idx.reshape(-1)
            if mode in ("idx", "both"):
                flat_idx = jax.lax.optimization_barrier(flat_idx)
            flat = jnp.take(tab, flat_idx, axis=0)
            if mode in ("out", "both"):
                flat = jax.lax.optimization_barrier(flat)
            return flat.reshape(idx.shape + tab.shape[1:])

        def front(pk, vm):
            codes = unpack_codes(pk, vm)
            canon, win_valid = canonical_kmers_jax(codes, K)
            s = K - 1
            canon = (canon[0][:, s:], canon[1][:, s:])
            win_valid = win_valid[:, s:]
            h = xxh64_u64(canon)
            idx_hi, idx_lo = _mod_size(h, meta.size_bits)
            bucket = (idx_lo & jnp.uint32((1 << lgB) - 1)).astype(jnp.int32)
            rest = (idx_lo >> lgB) | (idx_hi << (32 - lgB))
            row = take(table_d, bucket)
            if hmeta.entry16:
                meta_l = row >> 16
                pay_l = row & jnp.uint32(0xFFFF)
                lane_tag = meta_l >> 14
                m = (
                    ((meta_l & jnp.uint32(0x3FFF)) == rest[..., None])
                    & (lane_tag != 0)
                    & win_valid[..., None]
                )
                tagv = jnp.max(jnp.where(m, lane_tag, 0), axis=-1)
                payv = jnp.sum(jnp.where(m, pay_l, 0), axis=-1)
            else:
                w0 = row[..., 0, :]
                w1 = row[..., 1, :]
                lane_tag = w0 >> 30
                m = (
                    ((w0 & jnp.uint32(0x3FFFFFFF)) == rest[..., None])
                    & (lane_tag != 0)
                    & win_valid[..., None]
                )
                tagv = jnp.sum(jnp.where(m, lane_tag, 0), axis=-1)
                payv = jnp.sum(jnp.where(m, w1, 0), axis=-1)
            return tagv.astype(jnp.uint32).sum() + payv.sum()

        return jax.jit(front)

    def timeit(f, *args, reps=4):
        np.asarray(f(*args))
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            np.asarray(f(*args))
            best = min(best, time.time() - t0)
        return best

    n_rows = B * (L - K + 1)
    for name, (table, stash, hmeta) in variants.items():
        tab_d = jax.device_put(table, dev)
        log(f"--- {name}: table {table.nbytes >> 20} MB ---")
        # isolated-gather ceiling on this table, same row count
        rng = np.random.default_rng(7)
        flat = jax.device_put(
            rng.integers(0, table.shape[0], size=n_rows).astype(np.int32),
            dev,
        )
        iso = jax.jit(
            lambda t, i: jnp.take(t, i, axis=0).astype(jnp.uint32).sum()
        )
        dt = timeit(iso, tab_d, flat)
        log(f"  isolated flat gather: {dt*1e3:7.1f} ms ({n_rows/dt/1e6:.0f}M rows/s)")
        for mode in ("none", "idx", "out", "both"):
            f = make_front(tab_d, hmeta, mode)
            dt = timeit(f, pk, vm)
            log(f"  front barrier={mode:<4}: {dt*1e3:7.1f} ms ({n_rows/dt/1e6:.0f}M rows/s)")


if __name__ == "__main__":
    main()
