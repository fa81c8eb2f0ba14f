"""Stage profile of the hashed kernel's degree>=3 ROW path on a
family-heavy index (the homolog bench workload: every core k-mer has
degree 8, so the lax.cond row branch fires every batch).

The unique-winner bench kernel runs ~80 ms/batch; the homolog bench runs
~400+ ms/batch. Candidates: the [B,Ls,D+1] u16 gene-row gather (minor
dim 9 tiling), keys_from_gm synthesis, the 12x-wider finish sort, the
extract_pairs stream. Each stage adds one piece.

Usage: python bench/profile_rowpath.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
B, L = 65536, 104


def log(m):
    print(f"[row] {m}", file=sys.stderr, flush=True)


K, C = 17, 0.6
CACHE = os.path.join(ROOT, "bench", ".cache", "homolog")


def main():
    sys.path.insert(0, ROOT)
    fasta = os.path.join(CACHE, "genes.fa")
    fastq = os.path.join(CACHE, "reads500000.fq")
    if not os.path.exists(fastq):
        log("run bench/homolog_bench.py once to generate the workload")
        return

    from shark_tpu.classify.hashed import build_hashed_index
    from shark_tpu.classify.step import (
        StaticMeta,
        _mod_size,
        build_rows3,
        emit_threshold_table,
        extract_pairs,
        finish_from_keys,
        keys_from_gm,
        unpack_codes,
    )
    from shark_tpu.config import SharkConfig
    from shark_tpu.io.native import NativeStream
    from shark_tpu.ops.kmers import canonical_kmers_jax
    from shark_tpu.ops.xxh64 import xxh64_u64
    from shark_tpu.pipeline import load_or_build_index
    from shark_tpu.utils.timers import PhaseTimer

    cfg = SharkConfig(
        fasta_path=fasta, sample1_path=fastq, k=K, c=C, bf_gb=1
    )
    index = load_or_build_index(cfg, PhaseTimer())
    meta = StaticMeta.for_index(index, L)
    log(f"geometry D={meta.degree} ext_w={meta.ext_w}")
    table, stash, hmeta = build_hashed_index(index)
    gene_mat, ext_mat = build_rows3(index)
    k = meta.k
    lgB = hmeta.lgB

    ns = NativeStream(fastq, "", B, L, 0, packed=True)
    packed, vmask, slot, n = ns.next_batch()
    packed, vmask = packed.copy(), vmask.copy()
    ns.close()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    tp = jax.device_put(table, dev)
    stash_d = jax.device_put(stash, dev)
    gm_d = jax.device_put(gene_mat, dev)
    thresh = jax.device_put(emit_threshold_table(C, L), dev)
    pk = jax.device_put(packed, dev)
    vm = jax.device_put(vmask, dev)
    D = meta.degree3

    def front(pk, vm):
        codes = unpack_codes(pk, vm)
        canon, win_valid = canonical_kmers_jax(codes, k)
        s = min(k - 1, L - 1)
        canon = (canon[0][:, s:], canon[1][:, s:])
        win_valid = win_valid[:, s:]
        h = xxh64_u64(canon)
        idx_hi, idx_lo = _mod_size(h, meta.size_bits)
        length = jnp.sum((codes < 4).astype(jnp.int32), axis=1)
        bucket = (idx_lo & jnp.uint32((1 << lgB) - 1)).astype(jnp.int32)
        rest = (idx_lo >> lgB) | (idx_hi << (32 - lgB))
        row = jnp.take(tp, bucket, axis=0)
        if hmeta.entry16:
            meta_l = row >> 16
            pay_l = row & jnp.uint32(0xFFFF)
            lane_tag = meta_l >> 14
            m = (
                ((meta_l & jnp.uint32(0x3FFF)) == rest[..., None])
                & (lane_tag != 0)
                & win_valid[..., None]
            )
            iota8 = jnp.arange(hmeta.slots, dtype=jnp.uint32)
            fs = jnp.min(
                jnp.where(m, iota8, hmeta.slots), axis=-1, keepdims=True
            )
            p0 = jnp.sum(jnp.where(m & (iota8 == fs), pay_l, 0), axis=-1)
            p1 = jnp.sum(jnp.where(m & (iota8 > fs), pay_l, 0), axis=-1)
            tagv = jnp.max(jnp.where(m, lane_tag, 0), axis=-1)
            payv = p0 | (p1 << 16)
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
        return tagv, payv, length

    Ls = L - k + 1
    off = L - Ls
    pos_bits = meta.pos_bits
    sentinel = jnp.uint32(meta.n_genes << pos_bits)

    def direct_keys(tagv, payv):
        pos_u32 = jnp.broadcast_to(
            (jnp.arange(Ls, dtype=jnp.uint32) + off)[None, :], (B, Ls)
        )
        k0 = jnp.where(
            (tagv == 1) | (tagv == 2),
            ((payv & 0xFFFF) << pos_bits) | pos_u32,
            sentinel,
        )
        k1 = jnp.where(
            tagv == 2, ((payv >> 16) << pos_bits) | pos_u32, sentinel
        )
        return [k0, k1]

    def row_keys(tagv, payv):
        is_row = tagv == 3
        row_idx = jnp.where(is_row, payv, 0).astype(jnp.int32)
        gm = jnp.take(gm_d, row_idx, axis=0)
        ks, ovf = keys_from_gm(
            gm,
            is_row,
            meta=meta,
            L=L,
            off=off,
            ext_mat=None,
            geometry=(meta.degree3, meta.ext3_w),
        )
        return list(ks), ovf

    stages = {}
    stages["s0 front (gather+match)"] = jax.jit(
        lambda pk, vm: sum(x.astype(jnp.uint32).sum() for x in front(pk, vm))
    )
    stages["s1 +gm gather only"] = jax.jit(
        lambda pk, vm: (
            lambda t: jnp.take(
                gm_d,
                jnp.where(t[0] == 3, t[1], 0).astype(jnp.int32),
                axis=0,
            )
            .astype(jnp.uint32)
            .sum()
        )(front(pk, vm))
    )
    stages["s2 +row keys"] = jax.jit(
        lambda pk, vm: (
            lambda t: sum(
                x.astype(jnp.uint32).sum() for x in row_keys(t[0], t[1])[0]
            )
        )(front(pk, vm))
    )

    def full(pk, vm):
        tagv, payv, length = front(pk, vm)
        keys = direct_keys(tagv, payv)
        rk, ovf = row_keys(tagv, payv)
        keys[0] = jnp.minimum(keys[0], rk[0])
        keys[1] = jnp.minimum(keys[1], rk[1])
        keys.extend(rk[2:])
        key_mat = jnp.concatenate(keys, axis=1)
        out = finish_from_keys(
            key_mat, length, thresh, ovf, meta=meta, max_winners=16, L=L
        )
        return out[0].sum()

    stages["s3 full (sort width %d)" % (max(D, 2) * Ls)] = jax.jit(full)

    def timeit(f, reps=4):
        np.asarray(f(pk, vm))
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            np.asarray(f(pk, vm))
            best = min(best, time.time() - t0)
        return best

    for name, f in stages.items():
        dt = timeit(f)
        log(f"{name:<30} {dt * 1000:7.1f} ms")

    # the production kernel + extract_pairs stream, for reference
    from shark_tpu.classify.step import Classifier

    clf = Classifier(index, max_winners=16, c=C, probe="hashed")
    r = clf.call_packed(packed, vmask)
    np.asarray(r[0])
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        r = clf.call_packed(packed, vmask)
        np.asarray(r[0])
        best = min(best, time.time() - t0)
    log(f"production kernel              {best * 1000:7.1f} ms")
    p = np.asarray(extract_pairs(r[0], r[1], 1 << 19))
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        np.asarray(extract_pairs(r[0], r[1], 1 << 19))
        best = min(best, time.time() - t0)
    log(f"extract_pairs(2^19) fetch      {best * 1000:7.1f} ms")


if __name__ == "__main__":
    main()
