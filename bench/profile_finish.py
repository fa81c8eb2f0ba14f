"""Finish-block profile + optimization candidates on the PRODUCTION
(entry16) hashed path, headline bench index (no deg>=3 rows).

Stages add pieces; lettered variants change one thing each:
  f0  front+match (tag/payload)           — the gather wall
  f1  +k0/k1 keys +sort(2*Ls)
  f2  +coverage scans
  f3  full production finish
  a1  k0-only finish (width Ls)           — LOWER BOUND, wrong results
  a2  tag2 windows compacted to cap=8 via need_pos sort (exact when
      <=8 tag2 windows/read; the batch-level cond fallback would keep
      exactness in production)
  a3  winner compaction via top_k instead of the second full sort
  a4  cov/hits fused into ONE packed cumsum/cummax pair
  a5  full finish on Ls=84 (true 100bp window count vs padded 88)

Usage: python bench/profile_finish.py
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
    print(f"[finish] {m}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from shark_tpu.classify.hashed import build_hashed_index
    from shark_tpu.classify.step import (
        PACK_EMIT_SHIFT,
        PACK_NW_BITS,
        PACK_NW_SHIFT,
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

    fasta = os.path.join(CACHE, "genes.fa")
    fastq = os.path.join(CACHE, "reads.fq")
    cfg = SharkConfig(fasta_path=fasta, sample1_path=fastq, k=K, c=C, bf_gb=1)
    idx_dir = os.path.join(CACHE, "index.d")
    if os.path.isdir(idx_dir):
        cfg.load_index = idx_dir
    index = load_or_build_index(cfg, PhaseTimer())
    meta = StaticMeta.for_index(index, L)
    table, stash, hmeta = build_hashed_index(index)
    assert hmeta.entry16
    lgB = hmeta.lgB

    ns = NativeStream(fastq, "", B, L, 0, packed=True)
    packed, vmask, slot, n = ns.next_batch()
    packed, vmask = packed.copy(), vmask.copy()
    ns.close()

    dev = jax.devices()[0]
    tab = jax.device_put(table, dev)
    stash_d = jax.device_put(stash, dev)
    thresh = jax.device_put(emit_threshold_table(C, L), dev)
    pk = jax.device_put(packed, dev)
    vm = jax.device_put(vmask, dev)

    pos_bits = meta.pos_bits
    G = meta.n_genes
    W = 16

    def front(pk, vm, ls=None):
        codes = unpack_codes(pk, vm)
        canon, win_valid = canonical_kmers_jax(codes, K)
        s = K - 1
        canon = (canon[0][:, s:], canon[1][:, s:])
        win_valid = win_valid[:, s:]
        if ls is not None:
            canon = (canon[0][:, :ls], canon[1][:, :ls])
            win_valid = win_valid[:, :ls]
        h = xxh64_u64(canon)
        idx_hi, idx_lo = _mod_size(h, meta.size_bits)
        bucket = (idx_lo & jnp.uint32((1 << lgB) - 1)).astype(jnp.int32)
        rest = (idx_lo >> lgB) | (idx_hi << (32 - lgB))
        row = jnp.take(tab, bucket.reshape(-1), axis=0).reshape(
            bucket.shape + (tab.shape[1],)
        )
        meta_l = row >> 16
        pay_l = row & jnp.uint32(0xFFFF)
        lane_tag = meta_l >> 14
        m = (
            ((meta_l & jnp.uint32(0x3FFF)) == rest[..., None])
            & (lane_tag != 0)
            & win_valid[..., None]
        )
        iota8 = jnp.arange(hmeta.slots, dtype=jnp.uint32)
        fs = jnp.min(jnp.where(m, iota8, hmeta.slots), axis=-1, keepdims=True)
        p0 = jnp.sum(jnp.where(m & (iota8 == fs), pay_l, 0), axis=-1)
        p1 = jnp.sum(jnp.where(m & (iota8 > fs), pay_l, 0), axis=-1)
        tagv = jnp.max(jnp.where(m, lane_tag, 0), axis=-1)
        payv = p0 | (p1 << 16)
        st = stash_d
        sm = (
            (idx_lo[..., None] == st[:, 0][None, None, :])
            & (idx_hi[..., None] == st[:, 1][None, None, :])
            & win_valid[..., None]
        )
        tagv = tagv + jnp.sum(jnp.where(sm, st[:, 2][None, None, :], 0), -1)
        payv = payv + jnp.sum(jnp.where(sm, st[:, 3][None, None, :], 0), -1)
        length = jnp.sum((codes < 4).astype(jnp.int32), axis=1)
        return tagv, payv, length

    def mk_keys(tagv, payv, k0_only=False, cap2=0):
        Ls = tagv.shape[1]
        off = L - Ls
        pos_u32 = jnp.broadcast_to(
            (jnp.arange(Ls, dtype=jnp.uint32) + off)[None, :], (B, Ls)
        )
        sentinel = jnp.uint32(G << pos_bits)
        if cap2:
            # lane 0: tag1 only; tag>=2 windows compacted to cap2 columns
            k0 = jnp.where(
                tagv == 1, ((payv & 0xFFFF) << pos_bits) | pos_u32, sentinel
            )
            needy = tagv >= 2
            pos_i32 = pos_u32.astype(jnp.int32)
            need_pos = jnp.where(needy, pos_i32, L)
            sneed = jnp.sort(need_pos, axis=1)[:, :cap2]
            svalid = sneed < L
            sneed_c = jnp.minimum(sneed, L - 1)
            scol = jnp.maximum(sneed_c - off, 0)
            ctag = jnp.where(
                svalid, jnp.take_along_axis(tagv, scol, axis=1), 0
            )
            cpay = jnp.take_along_axis(payv, scol, axis=1)
            spos = sneed_c.astype(jnp.uint32)
            c0 = jnp.where(
                ctag >= 2, ((cpay & 0xFFFF) << pos_bits) | spos, sentinel
            )
            c1 = jnp.where(
                ctag == 2, ((cpay >> 16) << pos_bits) | spos, sentinel
            )
            return jnp.concatenate([k0, c0, c1], axis=1)
        k0 = jnp.where(
            (tagv == 1) | (tagv == 2),
            ((payv & 0xFFFF) << pos_bits) | pos_u32,
            sentinel,
        )
        if k0_only:
            return k0
        k1 = jnp.where(
            tagv == 2, ((payv >> 16) << pos_bits) | pos_u32, sentinel
        )
        return jnp.concatenate([k0, k1], axis=1)

    def scans(key_mat):
        skey = jnp.sort(key_mat, axis=1)
        gene = (skey >> pos_bits).astype(jnp.int32)
        pos = (skey & ((1 << pos_bits) - 1)).astype(jnp.int32)
        valid = gene < G
        prev_gene = jnp.pad(gene[:, :-1], ((0, 0), (1, 0)), constant_values=-1)
        prev_pos = jnp.pad(pos[:, :-1], ((0, 0), (1, 0)), constant_values=0)
        next_gene = jnp.pad(gene[:, 1:], ((0, 0), (0, 1)), constant_values=-2)
        seg_start = valid & (gene != prev_gene)
        seg_end = valid & (gene != next_gene)
        contrib = jnp.where(
            valid,
            jnp.where(seg_start, K, jnp.minimum(K, pos - prev_pos)),
            0,
        ).astype(jnp.int32)
        ones = valid.astype(jnp.int32)
        return skey, gene, seg_start, seg_end, contrib, ones

    def finish_fused(key_mat, length, topk=False, fused=True):
        """Variant finish: packed single cumsum (a4) and/or top_k winner
        select (a3)."""
        skey, gene, seg_start, seg_end, contrib, ones = scans(key_mat)
        M = jnp.int32(L + 1)
        if fused:
            HB = 9  # hits per segment <= key width < 512
            packed_c = (contrib << HB) | ones
            csum = jnp.cumsum(packed_c, axis=1)
            base = jax.lax.cummax(
                jnp.where(seg_start, csum - packed_c, 0), axis=1
            )
            both = csum - base
            cov = both >> HB
            hits = both & ((1 << HB) - 1)
        else:
            csum = jnp.cumsum(contrib, axis=1)
            hsum = jnp.cumsum(ones, axis=1)
            base_c = jax.lax.cummax(
                jnp.where(seg_start, csum - contrib, 0), axis=1
            )
            base_h = jax.lax.cummax(
                jnp.where(seg_start, hsum - ones, 0), axis=1
            )
            cov = csum - base_c
            hits = hsum - base_h
        combined = jnp.where(seg_end, cov * M + hits, 0)
        best = jnp.max(combined, axis=1)
        winner = seg_end & (combined == best[:, None]) & (best[:, None] > 0)
        n_winners = jnp.sum(winner.astype(jnp.int32), axis=1)
        if topk:
            inv = jnp.where(winner, jnp.int32(0x7FFFFFFF) - gene, 0)
            tv, _ = jax.lax.top_k(inv, W)
            winners = jnp.where(tv > 0, jnp.int32(0x7FFFFFFF) - tv, -1)
        else:
            wkey = jnp.where(
                winner, gene.astype(jnp.uint32), jnp.uint32(0xFFFFFFFF)
            )
            swin = jnp.sort(wkey, axis=1)[:, :W]
            winners = jnp.where(
                swin != jnp.uint32(0xFFFFFFFF), swin.astype(jnp.int32), -1
            )
        best_cov = best // M
        emit = best_cov >= jnp.take(thresh, length, mode="clip")
        nw_sat = jnp.minimum(n_winners, (1 << PACK_NW_BITS) - 1)
        packed_v = (
            jnp.maximum(winners[:, 0], 0)
            | (nw_sat << PACK_NW_SHIFT)
            | (emit.astype(jnp.int32) << PACK_EMIT_SHIFT)
        )
        return packed_v, winners

    zero_ovf = jnp.zeros((B,), jnp.bool_)

    def prod_finish(key_mat, length):
        return finish_from_keys(
            key_mat, length, thresh, zero_ovf,
            meta=meta, max_winners=W, L=L,
        )

    stages = {}
    stages["f0 front+match"] = jax.jit(
        lambda pk, vm: (lambda t: t[0].sum() + t[1].sum())(front(pk, vm))
    )
    stages["f1 +keys+sort"] = jax.jit(
        lambda pk, vm: (
            lambda t: jnp.sort(mk_keys(t[0], t[1]), axis=1).sum()
        )(front(pk, vm))
    )
    stages["f2 +scans"] = jax.jit(
        lambda pk, vm: (
            lambda t: sum(
                x.astype(jnp.uint32).sum()
                for x in scans(mk_keys(t[0], t[1]))[3:]
            )
        )(front(pk, vm))
    )
    stages["f3 full production"] = jax.jit(
        lambda pk, vm: (
            lambda t: prod_finish(mk_keys(t[0], t[1]), t[2])[0].sum()
        )(front(pk, vm))
    )
    stages["a1 k0-only (bound)"] = jax.jit(
        lambda pk, vm: (
            lambda t: prod_finish(
                mk_keys(t[0], t[1], k0_only=True), t[2]
            )[0].sum()
        )(front(pk, vm))
    )
    stages["a2 tag2-compact cap8"] = jax.jit(
        lambda pk, vm: (
            lambda t: prod_finish(mk_keys(t[0], t[1], cap2=8), t[2])[0].sum()
        )(front(pk, vm))
    )
    stages["a3 top_k winners"] = jax.jit(
        lambda pk, vm: (
            lambda t: finish_fused(
                mk_keys(t[0], t[1]), t[2], topk=True, fused=False
            )[0].sum()
        )(front(pk, vm))
    )
    stages["a4 fused cumsum"] = jax.jit(
        lambda pk, vm: (
            lambda t: finish_fused(
                mk_keys(t[0], t[1]), t[2], topk=False, fused=True
            )[0].sum()
        )(front(pk, vm))
    )
    stages["a34 fused+topk"] = jax.jit(
        lambda pk, vm: (
            lambda t: finish_fused(
                mk_keys(t[0], t[1]), t[2], topk=True, fused=True
            )[0].sum()
        )(front(pk, vm))
    )
    stages["a5 Ls=84 full"] = jax.jit(
        lambda pk, vm: (
            lambda t: prod_finish(mk_keys(t[0], t[1]), t[2])[0].sum()
        )(front(pk, vm, ls=84))
    )
    stages["a25 compact+Ls84"] = jax.jit(
        lambda pk, vm: (
            lambda t: prod_finish(mk_keys(t[0], t[1], cap2=8), t[2])[0].sum()
        )(front(pk, vm, ls=84))
    )

    def timeit(f, reps=4):
        np.asarray(f(pk, vm))
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            np.asarray(f(pk, vm))
            best = min(best, time.time() - t0)
        return best

    # correctness spot-check of variants vs production on this batch
    t = jax.jit(front)(pk, vm)
    ref = np.asarray(prod_finish(mk_keys(t[0], t[1]), t[2])[0])
    for nm, fn in (
        ("a2", lambda: prod_finish(mk_keys(t[0], t[1], cap2=8), t[2])[0]),
        ("a3", lambda: finish_fused(mk_keys(t[0], t[1]), t[2], topk=True, fused=False)[0]),
        ("a4", lambda: finish_fused(mk_keys(t[0], t[1]), t[2], fused=True)[0]),
    ):
        got = np.asarray(jax.jit(fn)())
        # a3/a4 variants don't set OVF bit; compare low bits only
        mask = (1 << 22) - 1
        same = np.array_equal(got & mask, ref & mask)
        log(f"verdict equality {nm}: {same}")

    for name, f in stages.items():
        dt = timeit(f)
        log(f"{name:<24} {dt * 1000:7.1f} ms")


if __name__ == "__main__":
    main()
