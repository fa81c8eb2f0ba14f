"""Sub-stage profile of the homolog GROUP-path finish: where do the
~91 ms of true device compute go (116.5 ms/batch minus the ~25 ms
dispatch floor, bench/ab_fixcap.py + bench/profile_front.py)?

Cumulative jits on the real homolog batch against the production panel
index: probe front -> +group splits -> +key build -> +sorted finish ->
full production kernel. The deltas attribute probe gather vs key
synthesis vs the sort/scan finish vs the impure-fix sub-batch.

Usage: python bench/profile_group_finish.py
Needs the cached workload from bench/homolog_bench.py.
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(ROOT, "bench", ".cache", "homolog")
B, L, K, C = 65536, 104, 17, 0.6


def log(m):
    print(f"[gfin] {m}", file=sys.stderr, flush=True)


def main():
    fastq = os.path.join(CACHE, "reads500000.fq")
    if not os.path.exists(fastq):
        log("run bench/homolog_bench.py once to generate the workload")
        return

    from shark_tpu.classify.step import (
        TAG_D1,
        TAG_D2,
        TAG_ROW,
        Classifier,
        StaticMeta,
        bloom_positions,
        emit_threshold_table,
        finish_from_keys,
        take_rows,
        unpack_codes,
    )
    from shark_tpu.config import SharkConfig
    from shark_tpu.io.native import NativeStream
    from shark_tpu.pipeline import load_or_build_index
    from shark_tpu.utils.timers import PhaseTimer

    cfg = SharkConfig(
        fasta_path=os.path.join(CACHE, "genes.fa"), sample1_path=fastq,
        k=K, c=C, bf_gb=1, batch_size=B, max_read_len=L,
    )
    index = load_or_build_index(cfg, PhaseTimer())
    clf = Classifier(index, max_winners=16, c=C, probe="hashed")
    log(f"probe: {clf.probe} lgB={clf._hmeta.lgB} slots={clf._hmeta.slots}")
    meta = StaticMeta.for_index(index, L)
    hmeta, dix = clf._hmeta, clf.dix
    rb = meta.rows_bits

    ns = NativeStream(fastq, "", B, L, 0, packed=True)
    nb = ns.next_batch()
    packed, vmask = nb[0].copy(), nb[1].copy()
    ns.close()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    pk = jax.device_put(packed, dev)
    vm = jax.device_put(vmask, dev)
    thresh = jax.device_put(emit_threshold_table(C, L), dev)

    def front(pk, vm):
        codes = unpack_codes(pk, vm)
        idx_hi, idx_lo, win_valid = bloom_positions(codes, meta)
        length = jnp.sum((codes < 4).astype(jnp.int32), axis=1)
        lgB = hmeta.lgB
        bucket = (idx_lo & jnp.uint32((1 << lgB) - 1)).astype(jnp.int32)
        rest = (idx_lo >> lgB) | (idx_hi << (32 - lgB))
        row = take_rows(dix.table, bucket)
        if hmeta.entry16:
            meta_l = row >> 16
            pay_l = row & jnp.uint32(0xFFFF)
            lane_tag = meta_l >> 14
            m = (
                ((meta_l & jnp.uint32(0x3FFF)) == rest[..., None])
                & (lane_tag != 0)
                & win_valid[..., None]
            )
            iota = jnp.arange(hmeta.slots, dtype=jnp.uint32)
            fs = jnp.min(
                jnp.where(m, iota, hmeta.slots), axis=-1, keepdims=True
            )
            p0 = jnp.sum(jnp.where(m & (iota == fs), pay_l, 0), axis=-1)
            p1 = jnp.sum(jnp.where(m & (iota > fs), pay_l, 0), axis=-1)
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
        st = dix.stash
        sm = (
            (idx_lo[..., None] == st[:, 0][None, None, :])
            & (idx_hi[..., None] == st[:, 1][None, None, :])
            & win_valid[..., None]
        )
        tagv = tagv + jnp.sum(jnp.where(sm, st[:, 2], 0), axis=-1)
        payv = payv + jnp.sum(jnp.where(sm, st[:, 3], 0), axis=-1)
        return tagv, payv, length

    def splits(tagv, payv):
        is_row = tagv == TAG_ROW
        gidv = (payv >> rb).astype(jnp.int32)
        any_direct = jnp.any((tagv == TAG_D1) | (tagv == TAG_D2), axis=1)
        any_row = jnp.any(is_row, axis=1)
        gmax = jnp.max(jnp.where(is_row, gidv, -1), axis=1)
        gmin = jnp.min(
            jnp.where(is_row, gidv, jnp.int32(0x7FFFFFFF)), axis=1
        )
        pure = any_row & ~any_direct & (gmax == gmin)
        need_fix = any_row & ~pure
        return is_row, pure, need_fix, gmax

    def group_keys(tagv, payv, is_row):
        Ls = tagv.shape[1]
        off = L - Ls
        pos_bits = meta.pos_bits
        pos_u32 = jnp.broadcast_to(
            (jnp.arange(Ls, dtype=jnp.uint32) + off)[None, :],
            (B, Ls),
        )
        pseudo = jnp.uint32(meta.n_genes)
        sent2 = jnp.uint32((meta.n_genes + 1) << pos_bits)
        direct1 = (tagv == TAG_D1) | (tagv == TAG_D2)
        kd0 = jnp.where(
            direct1, ((payv & 0xFFFF) << pos_bits) | pos_u32, sent2
        )
        kd1 = jnp.where(
            tagv == TAG_D2, ((payv >> 16) << pos_bits) | pos_u32, sent2
        )
        kg = jnp.where(is_row, (pseudo << pos_bits) | pos_u32, sent2)
        return jnp.concatenate([jnp.minimum(kd0, kg), kd1], axis=1)

    stages = {}
    stages["g0 probe front"] = jax.jit(
        lambda pk, vm: sum(
            x.astype(jnp.uint32).sum() for x in front(pk, vm)
        )
    )
    stages["g1 +group splits"] = jax.jit(
        lambda pk, vm: (
            lambda f: sum(
                x.astype(jnp.uint32).sum()
                for x in splits(f[0], f[1])
            )
        )(front(pk, vm))
    )

    def k2(pk, vm):
        tagv, payv, length = front(pk, vm)
        is_row, pure, need_fix, gmax = splits(tagv, payv)
        keys = group_keys(tagv, payv, is_row)
        return keys.astype(jnp.uint32).sum()

    stages["g2 +key build"] = jax.jit(k2)

    def k3(pk, vm):
        tagv, payv, length = front(pk, vm)
        is_row, pure, need_fix, gmax = splits(tagv, payv)
        keys = group_keys(tagv, payv, is_row)
        meta2 = dataclasses.replace(meta, n_genes=meta.n_genes + 1)
        packed_, winners, best_cov, _ = finish_from_keys(
            keys, length, thresh,
            jnp.zeros((B,), jnp.bool_),
            meta=meta2, max_winners=16, L=L,
        )
        return (
            packed_.sum() + winners.sum() + best_cov.sum()
        )

    stages["g3 +sorted finish"] = jax.jit(k3)

    # full production kernel via the classifier's own packed entry point
    def timeit_packed():
        r = clf.call_packed(pk, vm)
        np.asarray(r[0])
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            r = clf.call_packed(pk, vm)
            np.asarray(r[0])
            best = min(best, time.time() - t0)
        return best

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
        log(f"{name:<20} {dt * 1000:8.1f} ms")
    dt = timeit_packed()
    log(f"{'g4 full production':<20} {dt * 1000:8.1f} ms")


if __name__ == "__main__":
    main()
