"""Per-batch PURE/IMPURE split of the homolog workload's group fast path
(CPU backend — the split is data-dependent, not hardware-dependent).

The group fast path (classify/step.py finish_from_tags) scores a read as
one pseudo-gene when ALL its hits are deg>=3 rows with ONE common group
id; reads with mixed row+direct hits (or multiple group ids) re-score
through a compacted FIX_CAP sub-batch of the recursive heavy finish.
VERDICT r3 task 8 asks what fraction of each batch is pure vs impure —
the impure sub-batch (a second full finish at FIX_CAP width) and the
pair-stream traffic are the candidates for the remaining homolog gap.

Usage: python bench/homolog_split.py [n_batches=8]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(ROOT, "bench", ".cache", "homolog")
B, L, K, C = 65536, 104, 17, 0.6


def log(m):
    print(f"[split] {m}", file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    fastq = os.path.join(CACHE, "reads500000.fq")
    fasta = os.path.join(CACHE, "genes.fa")
    if not os.path.exists(fastq):
        log("run bench/homolog_bench.py once to generate the workload")
        return

    from shark_tpu.classify.step import (
        TAG_D1,
        TAG_D2,
        TAG_ROW,
        Classifier,
        StaticMeta,
    )
    from shark_tpu.config import SharkConfig
    from shark_tpu.io.native import NativeStream
    from shark_tpu.pipeline import load_or_build_index
    from shark_tpu.utils.timers import PhaseTimer

    cfg = SharkConfig(
        fasta_path=fasta, sample1_path=fastq, k=K, c=C, bf_gb=1,
        batch_size=B, max_read_len=L,
    )
    index = load_or_build_index(cfg, PhaseTimer())
    clf = Classifier(index, max_winners=16, c=C)
    log(f"probe path: {clf.probe}")
    meta = StaticMeta.for_index(index, L)
    rb = meta.rows_bits

    # Mirror the kernel's probe front end up to (tagv, payv), then compute
    # the group-branch splits exactly as finish_from_tags does.
    if clf.probe in ("hashed", "xl"):
        from shark_tpu.classify.hashed import classify_kernel_hashed  # noqa
        # reuse the classifier's own probe front: call the private helper
        # via a jitted closure over its device index
        from shark_tpu.classify import hashed as H

        hmeta = clf._hmeta
        dix = clf.dix

        def tags(codes):
            from shark_tpu.classify.step import bloom_positions, take_rows

            idx_hi, idx_lo, win_valid = bloom_positions(codes, meta)
            lgB = hmeta.lgB
            bucket = (idx_lo & jnp.uint32((1 << lgB) - 1)).astype(jnp.int32)
            rest = (idx_lo >> lgB) | (idx_hi << (32 - lgB))
            row = take_rows(dix.table, bucket)
            if hmeta.entry16:
                meta_l = row >> 16
                pay_l = row & jnp.uint32(0xFFFF)
                lane_tag = meta_l >> 14
                mask = jnp.uint32(
                    (1 << (13 if hmeta.xl else 14)) - 1
                )
                m = (
                    ((meta_l & mask) == rest[..., None])
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
            tagv = tagv + jnp.sum(
                jnp.where(sm, st[:, 2][None, None, :], 0), axis=-1
            )
            payv = payv + jnp.sum(
                jnp.where(sm, st[:, 3][None, None, :], 0), axis=-1
            )
            return tagv, payv
    else:
        from shark_tpu.classify.step import hash_positions, probe_tags

        dix = clf.dix

        def tags(codes):
            word_idx, bit_off, win_valid = hash_positions(codes, meta)
            return probe_tags(dix, word_idx, bit_off, win_valid)

    @jax.jit
    def split(codes):
        tagv, payv = tags(codes)
        is_row = tagv == TAG_ROW
        gidv = (payv >> rb).astype(jnp.int32) if rb else jnp.zeros_like(tagv)
        any_direct = jnp.any((tagv == TAG_D1) | (tagv == TAG_D2), axis=1)
        any_row = jnp.any(is_row, axis=1)
        gmax = jnp.max(jnp.where(is_row, gidv, -1), axis=1)
        gmin = jnp.min(jnp.where(is_row, gidv, jnp.int32(0x7FFFFFFF)), axis=1)
        pure = any_row & ~any_direct & (gmax == gmin)
        need_fix = any_row & ~pure
        n_row_w = jnp.sum(is_row.astype(jnp.int32))
        n_d_w = jnp.sum(
            ((tagv == TAG_D1) | (tagv == TAG_D2)).astype(jnp.int32)
        )
        return (
            jnp.sum(pure.astype(jnp.int32)),
            jnp.sum(need_fix.astype(jnp.int32)),
            jnp.sum((any_direct & ~any_row).astype(jnp.int32)),
            jnp.sum((~any_direct & ~any_row).astype(jnp.int32)),
            n_row_w,
            n_d_w,
        )

    FIX_CAP = min(B, max(64, B // 16))
    ns = NativeStream(fastq, "", B, L, 0)
    tot = np.zeros(6, np.int64)
    b = 0
    while b < n_batches:
        nb = ns.next_batch()
        if nb is None:
            break
        codes, slot, n = nb
        out = [int(np.asarray(x)) for x in split(jnp.asarray(codes))]
        ns.release(slot)
        log(
            f"batch {b}: pure={out[0]} impure={out[1]} "
            f"(FIX_CAP={FIX_CAP} {'OK' if out[1] <= FIX_CAP else 'FULL'}) "
            f"direct_only={out[2]} empty={out[3]} row_w={out[4]} "
            f"direct_w={out[5]}"
        )
        tot += out
        b += 1
    ns.close()
    log(
        f"TOTAL over {b} batches: pure={tot[0]} impure={tot[1]} "
        f"direct_only={tot[2]} empty={tot[3]} "
        f"row_windows={tot[4]} direct_windows={tot[5]}"
    )


if __name__ == "__main__":
    main()
