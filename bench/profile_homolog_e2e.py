"""Serial per-stage profile of the homolog END-TO-END path.

The kernel measures 193 ms/batch (bench/ab_homolog_cond.py) but the e2e
homolog bench runs ~945 ms/batch — this breaks the drain into its pieces
(packed-verdict fetch, extract_pairs dispatch+fetch, _winner_pairs numpy,
native emit) by running the production loop SERIALLY (no drain thread) so
every stage is separately attributable, then runs the real run_pipeline
for the overlapped number in the same session.

Usage: python bench/profile_homolog_e2e.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
B, L = 65536, 104
K, C = 17, 0.6
CACHE = os.path.join(ROOT, "bench", ".cache", "homolog")


def log(m):
    print(f"[he2e] {m}", file=sys.stderr, flush=True)


def main():
    fasta = os.path.join(CACHE, "genes.fa")
    fastq = os.path.join(CACHE, "reads500000.fq")
    if not os.path.exists(fastq):
        log("run bench/homolog_bench.py once to generate the workload")
        return

    from shark_tpu.classify.step import Classifier
    from shark_tpu.config import SharkConfig
    from shark_tpu.io.native import NativeStream
    from shark_tpu.pipeline import _winner_pairs, load_or_build_index, run_pipeline
    from shark_tpu.utils.timers import PhaseTimer

    cfg = SharkConfig(
        fasta_path=fasta,
        sample1_path=fastq,
        out1_path=os.path.join(CACHE, "out.fq"),
        ssv_path=os.path.join(CACHE, "out.ssv"),
        k=K, c=C, bf_gb=1,
        batch_size=B, max_read_len=L, max_winners=16,
    )
    index = load_or_build_index(cfg, PhaseTimer())
    clf = Classifier(index, max_winners=16, c=C, probe="hashed")

    # warm every jit path with one real batch
    ns0 = NativeStream(fastq, "", B, L, 0, packed=True)
    pk0, vm0, slot, n = ns0.next_batch()
    r = clf.call_packed(pk0, vm0)
    pk_np = np.asarray(r[0])
    _winner_pairs(cfg, index, r, n, None, 16, packed_np=pk_np, groups=clf.groups)
    ns0.release(slot)
    ns0.close()

    # serial pass over the whole sample
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
            cfg, index, r, n, (pk, vm), 16, packed_np=pk_np, groups=clf.groups
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

    # the real overlapped pipeline, same session
    for p in range(2):
        stats = run_pipeline(cfg, classifier=clf)
        log(f"run_pipeline pass {p}: classify_s={stats['classify_s']:.2f} "
            f"({stats['n_reads'] / stats['classify_s']:,.0f} reads/s)")


if __name__ == "__main__":
    main()
