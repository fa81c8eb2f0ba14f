"""A/B: the deg>=3 batch-level compaction cond on the homolog workload.

The compaction cond (step.py ROW_COMPACT_MIN_D) was added for the txome
index (rare deg>=3 windows); homolog batches always exceed ROW_CAP and
take the full branch, so in theory it's a wash there. The driver bench
measured homolog ~4x slower than the number recorded before the cond
landed — this A/B isolates whether the nested cond itself is the cost.

A = production kernel (nested cond active when degree3 >= 8)
B = ROW_COMPACT_MIN_D monkeypatched huge (single any-rows cond, the
    pre-aef0577 structure)

Usage: python bench/ab_homolog_cond.py
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
    print(f"[abcond] {m}", file=sys.stderr, flush=True)


def main():
    fasta = os.path.join(CACHE, "genes.fa")
    fastq = os.path.join(CACHE, "reads500000.fq")
    if not os.path.exists(fastq):
        log("run bench/homolog_bench.py once to generate the workload")
        return

    from shark_tpu.classify import step
    from shark_tpu.config import SharkConfig
    from shark_tpu.io.native import NativeStream
    from shark_tpu.pipeline import load_or_build_index
    from shark_tpu.utils.timers import PhaseTimer

    cfg = SharkConfig(fasta_path=fasta, sample1_path=fastq, k=K, c=C, bf_gb=1)
    index = load_or_build_index(cfg, PhaseTimer())

    ns = NativeStream(fastq, "", B, L, 0, packed=True)
    packed, vmask, slot, n = ns.next_batch()
    packed, vmask = packed.copy(), vmask.copy()
    ns.close()

    def timeit(clf, reps=5):
        r = clf.call_packed(packed, vmask)
        np.asarray(r[0])  # compile + settle
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            r = clf.call_packed(packed, vmask)
            v = np.asarray(r[0])
            best = min(best, time.time() - t0)
        return best, v

    saved = step.ROW_COMPACT_MIN_D
    results = {}
    for name, min_d in [("A nested cond (prod)", saved), ("B no compact cond", 1 << 30)]:
        step.ROW_COMPACT_MIN_D = min_d
        clf = step.Classifier(index, max_winners=16, c=C, probe="hashed")
        dt, v = timeit(clf)
        results[name] = (dt, v)
        log(f"{name:<24} {dt * 1000:7.1f} ms/batch")
    step.ROW_COMPACT_MIN_D = saved
    (ta, va), (tb, vb) = results.values()
    assert np.array_equal(va, vb), "verdict mismatch between A and B!"
    log(f"verdicts identical; B/A speed ratio {ta / tb:.2f}x")


if __name__ == "__main__":
    main()
