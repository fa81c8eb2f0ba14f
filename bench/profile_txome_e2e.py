"""Serial per-stage profile of the TRANSCRIPTOME end-to-end path.

The xl kernel measures ~131 ms/batch (bench/profile_xl.py) but the e2e
txome bench runs ~180-190 ms/batch — this breaks the production loop
into its pieces (parse, dispatch, packed-verdict fetch, _winner_pairs,
native emit) by running it SERIALLY so every stage is separately
attributable, then runs the real overlapped run_pipeline in the same
session. Mirrors bench/profile_homolog_e2e.py at 50k-gene scale.

Usage: python bench/profile_txome_e2e.py
Needs the cached workload from bench/transcriptome_bench.py.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(ROOT, "bench", ".cache", "txome")
B, L, K, C = 65536, 104, 17, 0.6


def log(m):
    print(f"[te2e] {m}", file=sys.stderr, flush=True)


def main():
    fastq = os.path.join(CACHE, "reads50000_500000.fq")
    if not os.path.exists(fastq):
        log("run bench/transcriptome_bench.py once to generate the workload")
        return

    from shark_tpu.classify.step import Classifier
    from shark_tpu.config import SharkConfig
    from shark_tpu.io.native import NativeStream
    from shark_tpu.pipeline import (
        _winner_pairs,
        load_or_build_index,
        run_pipeline,
    )
    from shark_tpu.utils.timers import PhaseTimer

    cfg = SharkConfig(
        fasta_path=os.path.join(CACHE, "genes50000.fa"),
        sample1_path=fastq,
        out1_path=os.path.join(CACHE, "out.fq"),
        ssv_path=os.path.join(CACHE, "out.ssv"),
        k=K, c=C, bf_gb=1, batch_size=B, max_read_len=L, max_winners=16,
        load_index=os.path.join(CACHE, "index50000.d"),
    )
    index = load_or_build_index(cfg, PhaseTimer())
    clf = Classifier(index, max_winners=16, c=C)
    log(f"probe: {clf.probe}")

    # warm every jit path with one real batch
    ns0 = NativeStream(fastq, "", B, L, 0, packed=True)
    pk0, vm0, slot, n = ns0.next_batch()
    r = clf.call_packed(pk0, vm0)
    pk_np = np.asarray(r[0])
    _winner_pairs(
        cfg, index, r, n, (pk0, vm0), 16, packed_np=pk_np,
        groups=clf.groups,
    )
    ns0.release(slot)
    ns0.close()

    t = {"parse": 0.0, "dispatch": 0.0, "fetch_packed": 0.0,
         "winner_pairs": 0.0, "emit": 0.0}
    ns = NativeStream(fastq, "", B, L, 0, packed=True)
    ns.set_output(1, os.path.join(CACHE, "out.ssv"),
                  os.path.join(CACHE, "out.fq"), "")
    ns.register_genes(index.gene_names)
    nb_count = 0
    t_all = time.time()
    while True:
        t0 = time.time()
        nb = ns.next_batch()
        t["parse"] += time.time() - t0
        if nb is None:
            break
        pk, vm, slot, n = nb
        t0 = time.time()
        r = clf.call_packed(pk, vm)
        t["dispatch"] += time.time() - t0
        t0 = time.time()
        pk_np = np.asarray(r[0])[:n]
        t["fetch_packed"] += time.time() - t0
        t0 = time.time()
        ri, gi = _winner_pairs(
            cfg, index, r, n, (pk, vm), 16, packed_np=pk_np,
            groups=clf.groups,
        )
        t["winner_pairs"] += time.time() - t0
        t0 = time.time()
        ns.emit(slot, ri, gi)
        t["emit"] += time.time() - t0
        nb_count += 1
    total = time.time() - t_all
    ns.close()
    for k_, v in t.items():
        log(f"{k_:<14} {v:7.2f} s total  {v / nb_count * 1000:7.1f} ms/batch")
    log(f"serial total   {total:7.2f} s ({nb_count} batches, "
        f"{500000 / total:,.0f} reads/s)")

    for p in range(2):
        stats = run_pipeline(cfg, classifier=clf)
        log(f"run_pipeline pass {p}: classify_s={stats['classify_s']:.2f} "
            f"({stats['n_reads'] / stats['classify_s']:,.0f} reads/s)")


if __name__ == "__main__":
    main()
