"""Stage-by-stage profile of the hashed probe kernel + layout variants.

The A/B (bench/kernel_ab.py) measured the hashed kernel at 178 ms/batch vs
a ~90 ms component projection. Candidate sinks: the strided lane slices
w0 = row[..., 0::2] (cross-lane relayout), minor-dim-8/16 elementwise
tiling, and the synthetic [B, Ls, D+1] gene-row materialization. Each
stage below adds one piece; variants swap the table layout (interleaved
[n,16] vs planar [n,2,8]) and the reduction input (synthetic gm vs direct
keys).

Usage: python bench/profile_hashed.py
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
    print(f"[prof] {m}", file=sys.stderr, flush=True)


def main():
    sys.path.insert(0, ROOT)
    import bench as bench_mod

    fasta, fastq, *_ = bench_mod.gen_workload()
    from shark_tpu.classify.hashed import build_hashed_index
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
    cfg.save_index = "" if cfg.load_index else idx_dir
    index = load_or_build_index(cfg, PhaseTimer())
    meta = StaticMeta.for_index(index, L)
    table_p0, stash, hmeta = build_hashed_index(index)  # planar [n, 2, 8]
    table_i = np.ascontiguousarray(
        table_p0.transpose(0, 2, 1).reshape(-1, 16)
    )  # interleaved [n, 16] variant
    lgB = hmeta.lgB
    k = meta.k

    ns = NativeStream(fastq, "", B, L, 0, packed=True)
    packed, vmask, slot, n = ns.next_batch()
    packed, vmask = packed.copy(), vmask.copy()
    ns.close()

    import jax
    import jax.numpy as jnp

    table_p = table_p0  # planar [n, 2, 8]: w0 plane then w1 plane
    dev = jax.devices()[0]
    ti = jax.device_put(table_i, dev)
    tp = jax.device_put(table_p, dev)
    stash_d = jax.device_put(stash, dev)
    thresh = jax.device_put(emit_threshold_table(0.6, L), dev)
    pk = jax.device_put(packed, dev)
    vm = jax.device_put(vmask, dev)

    def base(pk, vm):
        codes = unpack_codes(pk, vm)
        canon, win_valid = canonical_kmers_jax(codes, k)
        s = min(k - 1, L - 1)
        canon = (canon[0][:, s:], canon[1][:, s:])
        win_valid = win_valid[:, s:]
        h = xxh64_u64(canon)
        idx_hi, idx_lo = _mod_size(h, meta.size_bits)
        bucket = (idx_lo & jnp.uint32((1 << lgB) - 1)).astype(jnp.int32)
        rest = (idx_lo >> lgB) | (idx_hi << (32 - lgB))
        length = jnp.sum((codes < 4).astype(jnp.int32), axis=1)
        return bucket, rest, idx_lo, idx_hi, win_valid, length

    def match_i(t, bucket, rest, win_valid):
        row = jnp.take(t, bucket, axis=0)  # [B, Ls, 16]
        w0 = row[..., 0::2]
        w1 = row[..., 1::2]
        tag = w0 >> 30
        m = (
            ((w0 & jnp.uint32(0x3FFFFFFF)) == rest[..., None])
            & (tag != 0)
            & win_valid[..., None]
        )
        tagv = jnp.sum(jnp.where(m, tag, 0), axis=-1)
        payv = jnp.sum(jnp.where(m, w1, 0), axis=-1)
        return tagv, payv

    def match_p(t, bucket, rest, win_valid):
        row = jnp.take(t, bucket, axis=0)  # [B, Ls, 2, 8]
        w0 = row[..., 0, :]
        w1 = row[..., 1, :]
        tag = w0 >> 30
        m = (
            ((w0 & jnp.uint32(0x3FFFFFFF)) == rest[..., None])
            & (tag != 0)
            & win_valid[..., None]
        )
        tagv = jnp.sum(jnp.where(m, tag, 0), axis=-1)
        payv = jnp.sum(jnp.where(m, w1, 0), axis=-1)
        return tagv, payv

    def add_stash(tagv, payv, idx_lo, idx_hi, win_valid):
        st = stash_d
        sm = (
            (idx_lo[..., None] == st[:, 0][None, None, :])
            & (idx_hi[..., None] == st[:, 1][None, None, :])
            & win_valid[..., None]
        )
        tagv = tagv + jnp.sum(jnp.where(sm, st[:, 2][None, None, :], 0), -1)
        payv = payv + jnp.sum(jnp.where(sm, st[:, 3][None, None, :], 0), -1)
        return tagv, payv

    def keys_direct(tagv, payv, length):
        Ls = tagv.shape[1]
        pos = jnp.broadcast_to(
            (jnp.arange(Ls, dtype=jnp.uint32) + (L - Ls))[None, :], tagv.shape
        )
        G = meta.n_genes
        pb = meta.pos_bits
        sentinel = jnp.uint32(G << pb)
        k0 = jnp.where(
            tagv > 0, ((payv & 0xFFFF) << pb) | pos, sentinel
        )
        k1 = jnp.where(tagv == 2, ((payv >> 16) << pb) | pos, sentinel)
        key_mat = jnp.concatenate([k0, k1], axis=1)
        return finish_from_keys(
            key_mat,
            length,
            thresh,
            jnp.zeros((B,), jnp.bool_),
            meta=meta,
            max_winners=16,
            L=L,
        )

    stages = {}
    stages["s0 base (unpack+hash+mod)"] = jax.jit(
        lambda pk, vm: base(pk, vm)[1].astype(jnp.uint32).sum()
    )
    stages["s1i +gather interleaved"] = jax.jit(
        lambda pk, vm: (
            lambda b: jnp.take(ti, b[0], axis=0).astype(jnp.uint32).sum()
        )(base(pk, vm))
    )
    stages["s2i +match interleaved"] = jax.jit(
        lambda pk, vm: (
            lambda b: sum(
                x.astype(jnp.uint32).sum()
                for x in match_i(ti, b[0], b[1], b[4])
            )
        )(base(pk, vm))
    )
    stages["s2p +match planar"] = jax.jit(
        lambda pk, vm: (
            lambda b: sum(
                x.astype(jnp.uint32).sum()
                for x in match_p(tp, b[0], b[1], b[4])
            )
        )(base(pk, vm))
    )
    stages["s3p +stash"] = jax.jit(
        lambda pk, vm: (
            lambda b: sum(
                x.astype(jnp.uint32).sum()
                for x in add_stash(
                    *match_p(tp, b[0], b[1], b[4]), b[2], b[3], b[4]
                )
            )
        )(base(pk, vm))
    )

    def full_direct(pk, vm):
        b = base(pk, vm)
        tagv, payv = match_p(tp, b[0], b[1], b[4])
        tagv, payv = add_stash(tagv, payv, b[2], b[3], b[4])
        out = keys_direct(tagv, payv, b[5])
        return out[0].sum()

    stages["s4p full direct-keys planar"] = jax.jit(full_direct)

    # library kernel (gm-synth, interleaved) for reference
    from shark_tpu.classify.hashed import (
        HashedDeviceIndex,
        classify_kernel_hashed_packed,
    )

    dix = HashedDeviceIndex(
        table=tp,
        stash=stash_d,
        rows3=jax.device_put(np.zeros((1, 2), np.uint16), dev),
        ext_mat=None,
    )
    stages["s5 library kernel (gm synth)"] = jax.jit(
        lambda pk, vm: classify_kernel_hashed_packed(
            dix, thresh, pk, vm, meta=meta, hmeta=hmeta, max_winners=16
        )[0].sum()
    )

    def timeit(f, n=4):
        np.asarray(f(pk, vm))
        best = 1e9
        for _ in range(n):
            t0 = time.time()
            np.asarray(f(pk, vm))
            best = min(best, time.time() - t0)
        return best

    for name, f in stages.items():
        dt = timeit(f)
        log(f"{name:<34} {dt * 1000:7.1f} ms")


if __name__ == "__main__":
    main()
