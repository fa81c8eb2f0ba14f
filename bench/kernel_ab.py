"""In-session A/B of the production kernels on the real bench index.

Times, per 65536-read batch on one chip (fetch-based, same session so the
numbers are comparable — cross-session tunnel variance is +-40%):

  classic two-gather kernel   L=128 (round-1 configuration)
  classic two-gather kernel   L=104 (tight padding: 88 windows vs 112)
  hashed one-gather kernel    L=104

Usage: python bench/kernel_ab.py [n_batches=4] [reps=3]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(ROOT, "bench", ".cache")


def log(m):
    print(f"[ab] {m}", file=sys.stderr, flush=True)


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    B = 65536

    sys.path.insert(0, ROOT)
    import bench as bench_mod

    fasta, fastq, *_ = bench_mod.gen_workload()
    from shark_tpu.classify.step import Classifier
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
    log(f"index: n_set={index.n_set_bits} max_deg={index.max_degree}")

    batches = {}
    for L in (128, 104):
        ns = NativeStream(fastq, "", B, L, 0, packed=True)
        bs = []
        for _ in range(n_batches):
            packed, vmask, slot, n = ns.next_batch()
            bs.append((packed.copy(), vmask.copy()))
            ns.release(slot)
        ns.close()
        batches[L] = bs

    def timed(clf, L, tag):
        bs = batches[L]
        # warm (first call in the process pays the axon session init)
        t0 = time.time()
        np.asarray(clf.call_packed(*bs[0])[0])
        log(f"{tag}: warm {time.time() - t0:.1f}s")
        best = None
        for _ in range(reps):
            t0 = time.time()
            outs = [clf.call_packed(*b) for b in bs]
            for o in outs:
                np.asarray(o[0])
            dt = (time.time() - t0) / len(bs)
            best = dt if best is None or dt < best else best
        rs = B / best
        log(f"{tag}: {best * 1000:.1f} ms/batch  {rs / 1e3:.0f}k reads/s")
        return best

    # hashed first: its device tables are ~64MB, so results appear early
    # even on a slow tunnel day; the classic path's 2 GiB bf_rank h2d and
    # its compile come after
    t0 = time.time()
    hashed = Classifier(index, max_winners=16, c=0.6, probe="hashed")
    log(f"hashed device_put {time.time() - t0:.1f}s")
    h104 = timed(hashed, 104, "hashed  L104")
    t0 = time.time()
    classic = Classifier(index, max_winners=16, c=0.6, probe="classic")
    log(f"classic device_put {time.time() - t0:.1f}s")
    t104 = timed(classic, 104, "classic L104")
    t128 = timed(classic, 128, "classic L128")
    log(
        f"speedups vs classic L128: tightL {t128 / t104:.2f}x, "
        f"hashed {t128 / h104:.2f}x"
    )


if __name__ == "__main__":
    main()
