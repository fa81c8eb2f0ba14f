"""A/B: entry16 buckets with 4 or 6 slots (8/12 MB tables) + a LARGE
stash vs the production 8-slot/16 MB layout.

The cost model says fewer gathered elements per row should win, but
in-kernel measurements have contradicted it in both directions
(16u16->8u32 repack won 20%; entry16-8MB vs entry8-34MB tied). Smaller
buckets overflow more: at lgB19 the 4-slot layout spills ~700 entries,
so the stash broadcast-compare grows from 32 to ~1024 lanes. This
measures the full front (gather + match + stash) for each.

Usage: python bench/ab_slots.py
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
    print(f"[slots] {m}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from shark_tpu.classify.hashed import (
        _pack_table,
        _pad_stash,
        _set_bit_positions,
        build_hashed_index,
    )
    from shark_tpu.classify.step import (
        TAG_D1,
        TAG_D2,
        TAG_ROW,
        StaticMeta,
        _mod_size,
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

    # production layout for reference
    t8, s8, h8 = build_hashed_index(index)
    assert h8.entry16 and h8.slots == 8
    lgB = h8.lgB

    # rebuild raw entry inputs (mirrors build_hashed_index's preamble)
    pos = _set_bit_positions(index)
    deg = np.diff(index.offsets).astype(np.int64)
    off = index.offsets[:-1].astype(np.int64)
    gene_ids = np.asarray(index.gene_ids)
    first_gene = gene_ids[np.minimum(off, gene_ids.size - 1)].astype(np.uint32)
    tag = np.where(deg == 1, TAG_D1, np.where(deg == 2, TAG_D2, TAG_ROW))
    payload = first_gene.copy()
    d2 = deg == 2
    if d2.any():
        payload[d2] |= gene_ids[off[d2] + 1].astype(np.uint32) << 16
    d3 = deg >= 3
    if d3.any():
        payload[d3] = np.arange(int(d3.sum()), dtype=np.uint32)
    need16 = np.where(deg == 1, 1, 2).astype(np.int64)

    variants = {"s8 (prod)": (t8, s8)}
    for slots in (6, 4):
        built = _pack_table(pos, tag, payload, need16, lgB, True, slots)
        if built is None:
            log(f"s{slots}: pack failed")
            continue
        table, stash_rows = built
        log(f"s{slots}: table {table.nbytes >> 20} MB, spills {stash_rows.shape[0]}")
        variants[f"s{slots}"] = (table, _pad_stash(stash_rows))

    ns = NativeStream(fastq, "", B, L, 0, packed=True)
    packed, vmask, slot, n = ns.next_batch()
    packed, vmask = packed.copy(), vmask.copy()
    ns.close()

    dev = jax.devices()[0]
    pk = jax.device_put(packed, dev)
    vm = jax.device_put(vmask, dev)

    def make_front(tab, stash, slots):
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
            iota = jnp.arange(slots, dtype=jnp.uint32)
            fs = jnp.min(jnp.where(m, iota, slots), axis=-1, keepdims=True)
            p0 = jnp.sum(jnp.where(m & (iota == fs), pay_l, 0), axis=-1)
            p1 = jnp.sum(jnp.where(m & (iota > fs), pay_l, 0), axis=-1)
            tagv = jnp.max(jnp.where(m, lane_tag, 0), axis=-1)
            payv = p0 | (p1 << 16)
            st = stash
            sm = (
                (idx_lo[..., None] == st[:, 0][None, None, :])
                & (idx_hi[..., None] == st[:, 1][None, None, :])
                & win_valid[..., None]
            )
            tagv = tagv + jnp.sum(jnp.where(sm, st[:, 2][None, None, :], 0), -1)
            payv = payv + jnp.sum(jnp.where(sm, st[:, 3][None, None, :], 0), -1)
            return tagv.astype(jnp.uint32).sum() + payv.sum()

        return jax.jit(front)

    def timeit(f, reps=4):
        np.asarray(f(pk, vm))
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            np.asarray(f(pk, vm))
            best = min(best, time.time() - t0)
        return best

    ref_val = None
    for name, (table, stash) in variants.items():
        tab_d = jax.device_put(table, dev)
        st_d = jax.device_put(stash, dev)
        slots = table.shape[1]
        f = make_front(tab_d, st_d, slots)
        val = int(np.asarray(f(pk, vm)))
        if ref_val is None:
            ref_val = val
        dt = timeit(f)
        log(
            f"{name:<10} stash {stash.shape[0]:>5}: {dt*1e3:7.1f} ms"
            f"  (front values {'match' if val == ref_val else 'DIFFER'})"
        )


if __name__ == "__main__":
    main()
