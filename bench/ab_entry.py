"""In-session A/B: 4-byte-entry (32B bucket) vs 8-byte-entry (64B bucket)
hashed table layouts on the bench index.

Usage: python bench/ab_entry.py [n_batches=4] [reps=3]
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
    print(f"[ent] {m}", file=sys.stderr, flush=True)


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
    cfg.load_index = os.path.join(CACHE, "index.d")
    index = load_or_build_index(cfg, PhaseTimer())

    ns = NativeStream(fastq, "", B, L, 0, packed=True)
    bs = []
    for _ in range(n_batches):
        packed, vmask, slot, n = ns.next_batch()
        bs.append((packed.copy(), vmask.copy()))
        ns.release(slot)
    ns.close()

    orig = H.build_hashed_index
    results = {}
    refs = {}
    for name, a16 in (("entry16", True), ("entry8 ", False)):
        H.build_hashed_index = (
            lambda ix, prefer_small=True, _a=a16: orig(ix, allow16=_a)
        )
        try:
            clf = Classifier(index, max_winners=16, c=0.6, probe="hashed")
        finally:
            H.build_hashed_index = orig
        hm = clf._hmeta
        log(
            f"{name}: lgB={hm.lgB} table="
            f"{np.asarray(clf.dix.table).nbytes / 1e6:.0f}MB"
        )
        t0 = time.time()
        refs[name] = np.asarray(clf.call_packed(*bs[0])[0])
        log(f"{name}: warm {time.time() - t0:.1f}s")
        best = None
        for _ in range(reps):
            t0 = time.time()
            outs = [clf.call_packed(*b) for b in bs]
            for o in outs:
                np.asarray(o[0])
            dt = (time.time() - t0) / len(bs)
            best = dt if best is None or dt < best else best
        results[name] = best
        log(
            f"{name}: {best * 1000:.1f} ms/batch  "
            f"{B / best / 1e3:.0f}k reads/s"
        )
    a, b = refs["entry16"], refs["entry8 "]
    log(f"verdicts identical: {np.array_equal(a, b)}")
    log(
        f"entry16 speedup vs entry8: "
        f"{results['entry8 '] / results['entry16']:.3f}x"
    )


if __name__ == "__main__":
    main()
