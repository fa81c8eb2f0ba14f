"""Stage 2 of the homolog slowdown hunt: OVERLAPPED pipeline before/after
the single-end stage, with thread + live-device-buffer diagnostics, and a
gc/del attempt between.

Serial per-stage costs are ~unchanged by contamination
(repro_homolog_slow.py) but run_pipeline degrades 208k -> 122k; this
isolates whether lingering threads, live device buffers, or allocator
state explain the overlapped-only loss.

Usage: python bench/repro_homolog_slow2.py
"""

import gc
import os
import sys
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(ROOT, "bench", ".cache", "homolog")


def log(m):
    print(f"[repro2] {m}", file=sys.stderr, flush=True)


def diag(tag):
    import jax

    live = jax.live_arrays()
    total_mb = sum(a.nbytes for a in live) / 1e6
    log(f"{tag}: threads={[t.name for t in threading.enumerate()]}")
    log(f"{tag}: live device arrays={len(live)} ({total_mb:.0f} MB)")


def homolog_overlapped(tag, cfg, clf, passes=2):
    from shark_tpu.pipeline import run_pipeline

    best = None
    for p in range(passes):
        stats = run_pipeline(cfg, classifier=clf)
        v = stats["n_reads"] / stats["classify_s"]
        log(f"homolog[{tag}] pass {p}: {v:,.0f} reads/s "
            f"(classify {stats['classify_s']:.2f}s)")
        best = max(best or 0, v)
    return best


def main():
    from shark_tpu.classify.step import Classifier
    from shark_tpu.config import SharkConfig
    from shark_tpu.pipeline import load_or_build_index
    from shark_tpu.utils.timers import PhaseTimer

    cfg = SharkConfig(
        fasta_path=os.path.join(CACHE, "genes.fa"),
        sample1_path=os.path.join(CACHE, "reads500000.fq"),
        out1_path=os.path.join(CACHE, "out.fq"),
        ssv_path=os.path.join(CACHE, "out.ssv"),
        k=17, c=0.6, bf_gb=1,
        batch_size=65536, max_read_len=104, max_winners=16,
    )
    index = load_or_build_index(cfg, PhaseTimer())
    clf = Classifier(index, max_winners=16, c=0.6, probe="hashed")

    diag("start")
    homolog_overlapped("before", cfg, clf, passes=3)
    diag("post-before")

    import bench as bench_mod

    fasta, fastq, _, _, _ = bench_mod.gen_workload()
    ours = bench_mod.run_tpu(fasta, fastq)
    log(f"single-end stage: {ours['n_reads'] / ours['classify_s']:,.0f} reads/s")
    diag("post-single (no gc)")

    homolog_overlapped("after", cfg, clf, passes=2)

    gc.collect()
    diag("post-gc")
    homolog_overlapped("after-gc", cfg, clf, passes=2)


if __name__ == "__main__":
    main()
