"""A/B: group sub-batch recursion with vs without the row-cond machinery
(step._SUBFIX_FORCE_FULL) — the r5 attack on the ~16 ms impure-fix tail
(VERDICT r4 item 7). The sub-batch is only taken when impure row-hitting
reads exist, so the recursion's row-free cond and column-compaction cond
are pure fusion-boundary overhead there; force_full_rows jumps straight
to the full-width resolve (bit-exact fallback branch of those conds).

Alternating in-process timing on the real homolog batch, verdict-equality
checked. Usage: python bench/ab_subfix.py [reps=7]
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
    print(f"[subfix] {m}", file=sys.stderr, flush=True)


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

    variants = {}
    for name, flag in (("cond", False), ("full", True)):
        step_mod._SUBFIX_FORCE_FULL = flag
        clf = Classifier(index, max_winners=16, c=C, probe="hashed")
        np.asarray(clf.call_packed(pk, vm)[0])  # trace+compile under flag
        variants[name] = clf

    # verdict equality between the variants (full batch, all outputs)
    ref = [np.asarray(x) for x in variants["cond"].call_packed(pk, vm)]
    got = [np.asarray(x) for x in variants["full"].call_packed(pk, vm)]
    for i, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_array_equal(a, b, err_msg=f"output {i}")
    log("verdict equality: OK")

    times = {"cond": [], "full": []}
    for r in range(reps):
        for name in ("cond", "full") if r % 2 == 0 else ("full", "cond"):
            clf = variants[name]
            t0 = time.perf_counter()
            res = clf.call_packed(pk, vm)
            np.asarray(res[0])
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        ms = sorted(1000 * t for t in ts)
        log(f"{name:>5}: best {ms[0]:.1f} ms  median {ms[len(ms)//2]:.1f} ms"
            f"  all {[round(x, 1) for x in ms]}")
    log(f"speedup (best/best): "
        f"{min(times['cond']) / min(times['full']):.3f}x")


if __name__ == "__main__":
    main()
