"""A/B: impure-fix sub-batch width (FIX_DIV) under force_full_rows.

r4 measured FIX_DIV cap 256 at 202.9 ms vs 1024's 115.8 ("narrow
sub-batch sorts schedule badly") — but that was WITH the recursion's cond
machinery. With force_full_rows (bench/ab_subfix.py) the conds are gone;
re-test whether a demand-sized cap (homolog demand ~230-245/batch,
bench/homolog_split.py + this round's re-measure) now wins.

Usage: python bench/ab_fixdiv.py [reps=7]
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
    print(f"[fixdiv] {m}", file=sys.stderr, flush=True)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    fastq = os.path.join(CACHE, "reads500000.fq")
    if not os.path.exists(fastq):
        log("run bench/homolog_bench.py once to generate the workload")
        return

    from shark_tpu.classify import step as step_mod
    from shark_tpu.classify.step import Classifier
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
    nb = ns.next_batch()
    packed, vmask = nb[0].copy(), nb[1].copy()
    ns.close()

    import jax

    dev = jax.devices()[0]
    pk = jax.device_put(packed, dev)
    vm = jax.device_put(vmask, dev)

    divs = (64, 128, 256)  # caps 1024, 512, 256
    variants = {}
    for d in divs:
        step_mod.FIX_DIV = d
        clf = Classifier(index, max_winners=16, c=C, probe="hashed")
        np.asarray(clf.call_packed(pk, vm)[0])
        variants[d] = clf
    step_mod.FIX_DIV = 64

    ref = [np.asarray(x) for x in variants[divs[0]].call_packed(pk, vm)]
    for d in divs[1:]:
        got = [np.asarray(x) for x in variants[d].call_packed(pk, vm)]
        for i, (a, b) in enumerate(zip(ref, got)):
            np.testing.assert_array_equal(a, b, err_msg=f"div {d} out {i}")
    log("verdict equality across caps: OK")

    times = {d: [] for d in divs}
    for r in range(reps):
        order = divs if r % 2 == 0 else tuple(reversed(divs))
        for d in order:
            clf = variants[d]
            t0 = time.perf_counter()
            res = clf.call_packed(pk, vm)
            np.asarray(res[0])
            times[d].append(time.perf_counter() - t0)
    for d, ts in times.items():
        ms = sorted(1000 * t for t in ts)
        log(f"FIX_DIV {d:>3} (cap {B // d:>4}): best {ms[0]:.1f} ms  "
            f"median {ms[len(ms) // 2]:.1f} ms  all {[round(x,1) for x in ms]}")


if __name__ == "__main__":
    main()
