"""Device A/B of the group fast path's impure sub-batch width (FIX_DIV)
on the homolog workload.

bench/homolog_split.py measured ~230 impure reads/batch at B=65536 —
~18x below the FIX_DIV=16 cap (4096) — so the recursive heavy finish
re-scores a sub-batch mostly made of padding. This times the production
packed kernel at several widths in one session (each is its own compile;
verdicts must be identical).

Usage: python bench/ab_fixcap.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(ROOT, "bench", ".cache", "homolog")
B, L, K, C = 65536, 104, 17, 0.6


def log(m):
    print(f"[fix] {m}", file=sys.stderr, flush=True)


def main():
    fastq = os.path.join(CACHE, "reads500000.fq")
    if not os.path.exists(fastq):
        log("run bench/homolog_bench.py once to generate the workload")
        return

    from shark_tpu.classify import step as S
    from shark_tpu.config import SharkConfig
    from shark_tpu.io.native import NativeStream
    from shark_tpu.pipeline import load_or_build_index
    from shark_tpu.utils.timers import PhaseTimer

    cfg = SharkConfig(
        fasta_path=os.path.join(CACHE, "genes.fa"), sample1_path=fastq,
        k=K, c=C, bf_gb=1, batch_size=B, max_read_len=L,
    )
    index = load_or_build_index(cfg, PhaseTimer())

    ns = NativeStream(fastq, "", B, L, 0, packed=True)
    pk, vm, slot, n = ns.next_batch()
    pk, vm = pk.copy(), vm.copy()
    ns.close()

    outs = {}
    for div in (16, 64, 256):
        S.FIX_DIV = div
        clf = S.Classifier(index, max_winners=16, c=C, probe="hashed")
        r = clf.call_packed(pk, vm)
        np.asarray(r[0])  # compile + settle
        best = 1e9
        for _ in range(4):
            t0 = time.time()
            r = clf.call_packed(pk, vm)
            got = np.asarray(r[0])
            best = min(best, time.time() - t0)
        outs[div] = got
        log(f"FIX_DIV={div:<4} cap={max(64, B // div):<5} "
            f"{best * 1000:7.1f} ms/batch  {B / best / 1e3:6.0f}k reads/s")
    S.FIX_DIV = 16
    for div, got in outs.items():
        same = bool((got == outs[16]).all())
        log(f"verdicts[{div}] == verdicts[16]: {same}")
        assert same


if __name__ == "__main__":
    main()
