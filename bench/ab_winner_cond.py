"""NEGATIVE RESULT (2026-08-18, in-session): a batch-level cond that skips
the winner-compaction sort on tie-free batches measured a WASH —
single-end 100.7 ms/batch with the cond vs 99.7 without (0.990x), homolog
192.4 vs 193.4 (1.005x), verdicts identical on both. XLA evidently
overlaps/fuses the [B, 176] winner sort well enough that removing it buys
nothing, while the cond adds its own overhead. The production kernel
keeps the unconditional sort (classify/step.py finish_from_keys); the
tried variant replaced it with a per-row min-reduce under
`lax.cond(jnp.any(n_winners > 1), ...)`.

This script now just times the production kernel on both cached
workloads, for re-checking the baseline this A/B was judged against.

Usage: python bench/ab_winner_cond.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
B, L = 65536, 104
K, C = 17, 0.6


def log(m):
    print(f"[abwc] {m}", file=sys.stderr, flush=True)


def load_batch(fastq):
    from shark_tpu.io.native import NativeStream

    ns = NativeStream(fastq, "", B, L, 0, packed=True)
    packed, vmask, slot, n = ns.next_batch()
    packed, vmask = packed.copy(), vmask.copy()
    ns.close()
    return packed, vmask


def timeit(clf, packed, vmask, reps=5):
    r = clf.call_packed(packed, vmask)
    np.asarray(r[0])
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        r = clf.call_packed(packed, vmask)
        np.asarray(r[0])
        best = min(best, time.time() - t0)
    return best


def main():
    from shark_tpu.classify import step
    from shark_tpu.config import SharkConfig
    from shark_tpu.pipeline import load_or_build_index
    from shark_tpu.utils.timers import PhaseTimer

    cases = {
        "single-end": (
            os.path.join(ROOT, "bench", ".cache", "genes.fa"),
            os.path.join(ROOT, "bench", ".cache", "reads.fq"),
        ),
        "homolog": (
            os.path.join(ROOT, "bench", ".cache", "homolog", "genes.fa"),
            os.path.join(ROOT, "bench", ".cache", "homolog", "reads500000.fq"),
        ),
    }
    for name, (fasta, fastq) in cases.items():
        if not os.path.exists(fastq):
            log(f"{name}: workload missing, run bench.py once; skipping")
            continue
        cfg = SharkConfig(
            fasta_path=fasta, sample1_path=fastq, k=K, c=C, bf_gb=1
        )
        idx_dir = (
            os.path.join(ROOT, "bench", ".cache", "index.d")
            if name == "single-end"
            else ""
        )
        if idx_dir and os.path.isdir(idx_dir):
            cfg.load_index = idx_dir
        index = load_or_build_index(cfg, PhaseTimer())
        packed, vmask = load_batch(fastq)
        clf = step.Classifier(index, max_winners=16, c=C, probe="hashed")
        dt = timeit(clf, packed, vmask)
        log(f"{name:<10} production {dt * 1000:7.1f} ms/batch")


if __name__ == "__main__":
    main()
