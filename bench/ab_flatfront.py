"""A/B: does keeping the hashed front-end FLAT ([B*Ls] everywhere until
the keys stage) make the bucket gather run at the standalone-flat rate?

bench/gather_gap.py measured flat-index gathers ~20% faster than 2-D
(37 vs 47ms at production shape), but routing production gathers through
a reshape (take_rows) changed nothing in-kernel (bench/ab_packed.py) —
hypothesis: XLA's simplifier folds reshape+gather+reshape back into one
batched gather. Here the match, stash, and key synthesis all consume the
FLAT form, so there is no immediate reshape to fold.

Usage: python bench/ab_flatfront.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(ROOT, "bench", ".cache")
B, L = 65536, 104


def log(m):
    print(f"[ff] {m}", file=sys.stderr, flush=True)


def main():
    import bench as bench_mod

    fasta, fastq, *_ = bench_mod.gen_workload()
    from shark_tpu.classify import hashed as H
    from shark_tpu.classify.step import (
        StaticMeta,
        _mod_size,
        emit_threshold_table,
        finish_from_keys,
        unpack_codes,
    )
    from shark_tpu.config import SharkConfig
    from shark_tpu.io.native import NativeStream
    from shark_tpu.ops.kmers import canonical_kmers_jax
    from shark_tpu.ops.xxh64 import xxh64_u64
    from shark_tpu.pipeline import load_or_build_index
    from shark_tpu.utils.timers import PhaseTimer

    cfg = SharkConfig(fasta_path=fasta, sample1_path=fastq, k=17, c=0.6)
    idx_dir = os.path.join(CACHE, "index.d")
    cfg.load_index = idx_dir if os.path.isdir(idx_dir) else ""
    index = load_or_build_index(cfg, PhaseTimer())
    meta = StaticMeta.for_index(index, L)
    table, stash, hmeta = H.build_hashed_index(index)
    log(f"layout: {hmeta}")
    k, lgB = meta.k, hmeta.lgB

    ns = NativeStream(fastq, "", B, L, 0, packed=True)
    packed, vmask, slot, n = ns.next_batch()
    packed, vmask = packed.copy(), vmask.copy()
    ns.close()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    tp = jax.device_put(table, dev)
    stash_d = jax.device_put(stash, dev)
    thresh = jax.device_put(emit_threshold_table(0.6, L), dev)
    pk = jax.device_put(packed, dev)
    vm = jax.device_put(vmask, dev)
    dix = H.HashedDeviceIndex(
        table=tp,
        stash=stash_d,
        rows3=jax.device_put(np.zeros((1, 2), np.uint16), dev),
        ext_mat=None,
    )

    def prod(pk, vm):
        return H.classify_kernel_hashed_packed(
            dix, thresh, pk, vm, meta=meta, hmeta=hmeta, max_winners=16
        )

    S = hmeta.slots

    def flatfront(pk, vm):
        codes = unpack_codes(pk, vm)
        canon, win_valid = canonical_kmers_jax(codes, k)
        s = min(k - 1, L - 1)
        canon = (canon[0][:, s:], canon[1][:, s:])
        win_valid = win_valid[:, s:]
        h = xxh64_u64(canon)
        idx_hi, idx_lo = _mod_size(h, meta.size_bits)
        length = jnp.sum((codes < 4).astype(jnp.int32), axis=1)
        Ls = win_valid.shape[1]

        # FLAT from here
        lo_f = idx_lo.reshape(-1)
        hi_f = idx_hi.reshape(-1)
        valid_f = win_valid.reshape(-1)
        bucket = (lo_f & jnp.uint32((1 << lgB) - 1)).astype(jnp.int32)
        rest = (lo_f >> lgB) | (hi_f << (32 - lgB))
        row = jnp.take(tp, bucket, axis=0)  # [N, S]
        meta_l = row >> 16
        pay_l = row & jnp.uint32(0xFFFF)
        lane_tag = meta_l >> 14
        m = (
            ((meta_l & jnp.uint32(0x3FFF)) == rest[..., None])
            & (lane_tag != 0)
            & valid_f[..., None]
        )
        iota = jnp.arange(S, dtype=jnp.uint32)
        fs = jnp.min(jnp.where(m, iota, S), axis=-1, keepdims=True)
        p0 = jnp.sum(jnp.where(m & (iota == fs), pay_l, 0), axis=-1)
        p1 = jnp.sum(jnp.where(m & (iota > fs), pay_l, 0), axis=-1)
        tagv = jnp.max(jnp.where(m, lane_tag, 0), axis=-1)
        payv = p0 | (p1 << 16)
        st = dix.stash
        sm = (
            (lo_f[..., None] == st[:, 0][None, :])
            & (hi_f[..., None] == st[:, 1][None, :])
            & valid_f[..., None]
        )
        tagv = tagv + jnp.sum(jnp.where(sm, st[:, 2][None, :], 0), axis=-1)
        payv = payv + jnp.sum(jnp.where(sm, st[:, 3][None, :], 0), axis=-1)

        off = L - Ls
        pos_bits = meta.pos_bits
        pos_f = jnp.tile(
            (jnp.arange(Ls, dtype=jnp.uint32) + off), (B,)
        ).reshape(-1)
        sentinel = jnp.uint32(meta.n_genes << pos_bits)
        k0 = jnp.where(
            (tagv == H.TAG_D1) | (tagv == H.TAG_D2),
            ((payv & 0xFFFF) << pos_bits) | pos_f,
            sentinel,
        )
        k1 = jnp.where(
            tagv == H.TAG_D2, ((payv >> 16) << pos_bits) | pos_f, sentinel
        )
        key_mat = jnp.concatenate(
            [k0.reshape(B, Ls), k1.reshape(B, Ls)], axis=1
        )
        return finish_from_keys(
            key_mat,
            length,
            thresh,
            jnp.zeros((B,), jnp.bool_),
            meta=meta,
            max_winners=16,
            L=L,
        )

    fns = {
        "production": jax.jit(lambda pk, vm: prod(pk, vm)[0]),
        "flat-front": jax.jit(lambda pk, vm: flatfront(pk, vm)[0]),
    }
    ref = None
    for name, fn in fns.items():
        got = np.asarray(fn(pk, vm))
        if ref is None:
            ref = got
        else:
            assert np.array_equal(ref, got), f"{name} verdicts differ"
        best = 1e9
        for _ in range(4):
            t0 = time.time()
            np.asarray(fn(pk, vm))
            best = min(best, time.time() - t0)
        log(f"{name} {best * 1000:7.1f} ms/batch")


if __name__ == "__main__":
    main()
