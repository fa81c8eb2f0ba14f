"""In-session A/B: one 65536-read kernel vs TWO independent 32768-read
streams inside one jit (VERDICT r1 item 1(d): "split each batch into 2
streams so one stream's sort/scan tail hides the other's gather").

On this TPU generation XLA executes fusions sequentially on the core, so
the only way two streams could win is if the scheduler overlaps one
stream's gather DMA with the other's VPU sort/scan work. The trace
(docs/PERF.md) already shows copy-start/copy-done double-buffering around
the bucket gather, so the expectation is parity at best minus the
superlinear-B sweet-spot effect (bench/ab_batch.py: B=32768 halves pay
two dispatch/tail costs).

Usage: python bench/ab_twostream.py [n_batches=4] [reps=3]
Prints ms/batch for the production single-stream kernel and the
two-stream variant, plus a verdict-equality check.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(ROOT, "bench", ".cache")
B, L = 65536, 104


def log(m):
    print(f"[ab2s] {m}", file=sys.stderr, flush=True)


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    sys.path.insert(0, ROOT)
    import bench as bench_mod

    fasta, fastq, *_ = bench_mod.gen_workload()
    import jax

    from shark_tpu.classify.hashed import classify_kernel_hashed_packed
    from shark_tpu.classify.step import (
        Classifier,
        StaticMeta,
        emit_threshold_table,
    )
    from shark_tpu.config import SharkConfig
    from shark_tpu.io.native import NativeStream
    from shark_tpu.pipeline import load_or_build_index
    from shark_tpu.utils.timers import PhaseTimer

    cfg = SharkConfig(
        fasta_path=fasta, sample1_path=fastq, k=17, c=0.6, bf_gb=1
    )
    idx_dir = os.path.join(CACHE, "index.d")
    if os.path.isdir(idx_dir):
        cfg.load_index = idx_dir
    else:
        cfg.save_index = idx_dir
    index = load_or_build_index(cfg, PhaseTimer())

    ns = NativeStream(fastq, "", B, L, 0, packed=True)
    batches = []
    for _ in range(n_batches):
        packed, vmask, slot, n = ns.next_batch()
        batches.append((packed.copy(), vmask.copy()))
        ns.release(slot)
    ns.close()

    clf = Classifier(index, max_winners=16, c=0.6, probe="hashed")
    meta = StaticMeta.for_index(index, L)
    kern = functools.partial(
        classify_kernel_hashed_packed,
        meta=meta,
        hmeta=clf._hmeta,
        max_winners=16,
    )

    @jax.jit
    def two_stream(dix, thresh, p1, v1, p2, v2):
        # two independent half-batch dataflows in ONE program: XLA is free
        # to interleave stream 1's finish (VPU sorts/scans) with stream 2's
        # bucket gather if the hardware/scheduler can overlap them
        return kern(dix, thresh, p1, v1), kern(dix, thresh, p2, v2)

    thresh = jax.device_put(emit_threshold_table(0.6, L), clf._dev)
    H = B // 2

    # warm both variants (first call pays the axon session init)
    t0 = time.time()
    np.asarray(clf.call_packed(*batches[0])[0])
    log(f"single-stream warm {time.time() - t0:.1f}s")
    p, v = batches[0]
    t0 = time.time()
    r1, r2 = two_stream(clf.dix, thresh, p[:H], v[:H], p[H:], v[H:])
    np.asarray(r1[0]), np.asarray(r2[0])
    log(f"two-stream warm (compile) {time.time() - t0:.1f}s")

    # verdict equality: the kernel is row-independent, so the stacked
    # half-batch packed verdicts must equal the full batch's
    full = np.asarray(clf.call_packed(p, v)[0])
    halves = np.concatenate([np.asarray(r1[0]), np.asarray(r2[0])])
    assert np.array_equal(full, halves), "two-stream verdicts diverge"
    log("verdicts identical")

    def timed(tag, fn):
        best = None
        for _ in range(reps):
            t0 = time.time()
            outs = [fn(pb, vb) for pb, vb in batches]
            for o in outs:
                np.asarray(o)
            dt = (time.time() - t0) / len(batches)
            best = dt if best is None or dt < best else best
        log(f"{tag}: {best * 1000:.1f} ms/batch  {B / best / 1e3:.0f}k reads/s")
        return best

    t_one = timed("single-stream", lambda pb, vb: clf.call_packed(pb, vb)[0])

    def run_two(pb, vb):
        a, b2 = two_stream(
            clf.dix, thresh, pb[:H], vb[:H], pb[H:], vb[H:]
        )
        return a[0]  # fetching one output forces the whole program

    t_two = timed("two-stream  ", run_two)
    log(f"two-stream vs single: {t_one / t_two:.3f}x")


if __name__ == "__main__":
    main()
