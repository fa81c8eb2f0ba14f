"""In-session A/B of hashed-table bucket counts (table size vs gather rate).

Measured gather rates fall with table size (64B rows: 16/32/64 MB =
231/197/158M rows/s, bench/hash_gather_bench.py), so a fuller, smaller
table should win as long as the spill stash stays tiny. This times the
full packed hashed kernel at every buildable lgB on the bench index.

Usage: python bench/ab_lgb.py [n_batches=4] [reps=3]
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
    print(f"[lgb] {m}", file=sys.stderr, flush=True)


def _build_pinned(HH, index, lgB):
    """build_hashed_index with the bucket count pinned to 2**lgB."""
    n_set = index.n_set_bits
    pos = HH._set_bit_positions(index)
    deg = np.diff(index.offsets).astype(np.int64)
    off = index.offsets[:-1].astype(np.int64)
    gene_ids = np.asarray(index.gene_ids)
    first_gene = gene_ids[np.minimum(off, gene_ids.size - 1)].astype(np.uint32)
    tag = np.where(
        deg == 1, HH.TAG_D1, np.where(deg == 2, HH.TAG_D2, HH.TAG_ROW)
    )
    payload = first_gene.copy()
    d2 = deg == 2
    if d2.any():
        payload[d2] |= gene_ids[off[d2] + 1].astype(np.uint32) << 16
    d3 = deg >= 3
    if d3.any():
        payload[d3] = np.flatnonzero(d3).astype(np.uint32)
    n_buckets = 1 << lgB
    bucket = (pos & np.uint64(n_buckets - 1)).astype(np.int64)
    order = np.argsort(bucket, kind="stable")
    bucket_s = bucket[order]
    pos_s = pos[order]
    tag_s = tag[order].astype(np.uint32)
    pay_s = payload[order]
    _, starts, counts = np.unique(
        bucket_s, return_index=True, return_counts=True
    )
    slot = np.arange(n_set, dtype=np.int64) - np.repeat(starts, counts)
    in_table = slot < HH.BUCKET_SLOTS
    spill = np.flatnonzero(~in_table)
    table = np.zeros((n_buckets, 2, HH.BUCKET_SLOTS), dtype=np.uint32)
    rest = (pos_s >> np.uint64(lgB)).astype(np.uint32)
    tb = bucket_s[in_table]
    ts = slot[in_table]
    table[tb, 0, ts] = (tag_s[in_table] << 30) | rest[in_table]
    table[tb, 1, ts] = pay_s[in_table]
    stash = np.empty((spill.size, 4), dtype=np.uint32)
    stash[:, 0] = (pos_s[spill] & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    stash[:, 1] = (pos_s[spill] >> np.uint64(32)).astype(np.uint32)
    stash[:, 2] = tag_s[spill]
    stash[:, 3] = pay_s[spill]
    return (
        table,
        HH._pad_stash(stash),
        HH.HashedMeta(lgB=lgB, has_rows=bool(d3.any())),
    )


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    sys.path.insert(0, ROOT)
    import bench as bench_mod

    fasta, fastq, *_ = bench_mod.gen_workload()
    import shark_tpu.classify.hashed as H
    from shark_tpu.classify.step import Classifier
    from shark_tpu.config import SharkConfig
    from shark_tpu.io.native import NativeStream
    from shark_tpu.pipeline import load_or_build_index
    from shark_tpu.utils.timers import PhaseTimer

    cfg = SharkConfig(fasta_path=fasta, sample1_path=fastq, k=17, c=0.6)
    idx_dir = os.path.join(CACHE, "index.d")
    cfg.load_index = idx_dir if os.path.isdir(idx_dir) else ""
    cfg.save_index = "" if cfg.load_index else idx_dir
    index = load_or_build_index(cfg, PhaseTimer())
    log(f"index: n_set={index.n_set_bits}")

    ns = NativeStream(fastq, "", B, L, 0, packed=True)
    bs = []
    for _ in range(n_batches):
        packed, vmask, slot, n = ns.next_batch()
        bs.append((packed.copy(), vmask.copy()))
        ns.release(slot)
    ns.close()

    pos = H._set_bit_positions(index)
    lgB_def = min(
        max(6, int(np.ceil(np.log2(index.n_set_bits)))),
        int(np.log2(H.MAX_BUCKETS)),
    )
    candidates = []
    for lgB in range(max(6, lgB_def - 3), lgB_def + 1):
        counts = np.bincount(
            (pos & np.uint64((1 << lgB) - 1)).astype(np.int64),
            minlength=1 << lgB,
        )
        spill = int((counts - H.BUCKET_SLOTS).clip(min=0).sum())
        log(f"lgB={lgB}: table {(1 << lgB) * 64 / 1e6:.0f}MB spill {spill}")
        if spill <= H.STASH_CAP:
            candidates.append(lgB)

    times = {}
    orig_build = H.build_hashed_index
    for lgB in candidates:
        H.build_hashed_index = (
            lambda ix, prefer_small=True, _lg=lgB: _build_pinned(H, ix, _lg)
        )
        try:
            clf = Classifier(index, max_winners=16, c=0.6, probe="hashed")
        finally:
            H.build_hashed_index = orig_build
        t0 = time.time()
        ref = np.asarray(clf.call_packed(*bs[0])[0])
        log(f"lgB={lgB}: warm {time.time() - t0:.1f}s")
        best = None
        for _ in range(reps):
            t0 = time.time()
            outs = [clf.call_packed(*b) for b in bs]
            for o in outs:
                np.asarray(o[0])
            dt = (time.time() - t0) / len(bs)
            best = dt if best is None or dt < best else best
        times[lgB] = best
        log(
            f"lgB={lgB}: {best * 1000:.1f} ms/batch  "
            f"{B / best / 1e3:.0f}k reads/s"
        )

    base = times[max(times)]
    for lgB, t in sorted(times.items()):
        log(f"lgB={lgB}: speedup vs natural {base / t:.3f}x")


if __name__ == "__main__":
    main()
