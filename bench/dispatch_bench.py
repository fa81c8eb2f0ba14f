"""Isolate per-batch overheads: h2d transfer vs dispatch vs kernel.

e2e runs ~88 ms/batch while the device kernel profile sums to ~60 ms.
Candidates for the other ~28 ms: the 2.56 MB packed-input h2d (~23 ms at
the tunnel's ~110 MB/s), a dispatch round trip that serializes with
execution, or fetch not fully hidden. This times the production hashed
kernel with (a) device-resident inputs and (b) numpy inputs, back to
back, plus raw device_put cost — the differences localize the overhead.

Usage: python bench/dispatch_bench.py [n_batches=8]
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
    print(f"[disp] {m}", file=sys.stderr, flush=True)


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sys.path.insert(0, ROOT)
    import bench as bench_mod

    fasta, fastq, *_ = bench_mod.gen_workload()
    from shark_tpu.classify.step import Classifier
    from shark_tpu.config import SharkConfig
    from shark_tpu.io.native import NativeStream
    from shark_tpu.pipeline import load_or_build_index
    from shark_tpu.utils.timers import PhaseTimer

    cfg = SharkConfig(fasta_path=fasta, sample1_path=fastq, k=17, c=0.6)
    cfg.load_index = os.path.join(CACHE, "index.d")
    index = load_or_build_index(cfg, PhaseTimer())
    clf = Classifier(index, max_winners=16, c=0.6, probe="hashed")

    ns = NativeStream(fastq, "", B, L, 0, packed=True)
    host = []
    for _ in range(n_batches):
        packed, vmask, slot, n = ns.next_batch()
        host.append((packed.copy(), vmask.copy()))
        ns.release(slot)
    ns.close()

    import jax

    dev = jax.devices()[0]
    t0 = time.time()
    np.asarray(clf.call_packed(*host[0])[0])
    log(f"warm {time.time() - t0:.1f}s")

    # (a) device-resident inputs: dispatch N, fetch last only
    devb = [
        (jax.device_put(p, dev), jax.device_put(v, dev)) for p, v in host
    ]
    np.asarray(devb[-1][1])  # ensure transfers complete
    for tag, batches in (("dev-res", devb), ("numpy ", host)):
        best = None
        for _ in range(3):
            t0 = time.time()
            outs = [clf.call_packed(p, v) for p, v in batches]
            np.asarray(outs[-1][0])
            dt = (time.time() - t0) / len(batches)
            best = dt if best is None or dt < best else best
        log(f"{tag} inputs, fetch last only : {best * 1000:6.1f} ms/batch")
    # fetch every batch (the production shape)
    for tag, batches in (("dev-res", devb), ("numpy ", host)):
        best = None
        for _ in range(3):
            t0 = time.time()
            outs = [clf.call_packed(p, v) for p, v in batches]
            for o in outs:
                np.asarray(o[0])
            dt = (time.time() - t0) / len(batches)
            best = dt if best is None or dt < best else best
        log(f"{tag} inputs, fetch all       : {best * 1000:6.1f} ms/batch")

    # raw h2d cost of one packed batch
    best = None
    for _ in range(5):
        t0 = time.time()
        a = jax.device_put(host[0][0], dev)
        b = jax.device_put(host[0][1], dev)
        np.asarray(b[:1])
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    log(f"device_put 2.56MB packed batch  : {best * 1000:6.1f} ms")

    # pure dispatch floor: trivial jit on device-resident input
    tiny = jax.jit(lambda x: x.sum())
    xs = devb[0][1]
    np.asarray(tiny(xs))
    best = None
    for _ in range(3):
        t0 = time.time()
        outs = [tiny(xs) for _ in range(8)]
        np.asarray(outs[-1])
        dt = (time.time() - t0) / 8
        best = dt if best is None or dt < best else best
    log(f"trivial jit dispatch            : {best * 1000:6.1f} ms")


if __name__ == "__main__":
    main()
