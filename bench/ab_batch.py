"""In-session A/B of pipeline batch size on the single-end bench workload.

On the tunneled dev TPU each dispatched program pays a fixed ~28 ms round
trip that appears to serialize with device execution, so larger batches
amortize it. This runs the full end-to-end pipeline at several batch
sizes in one process/session.

Usage: python bench/ab_batch.py [sizes...]  (default 65536 131072 262144)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(f"[abB] {m}", file=sys.stderr, flush=True)


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [65536, 131072, 262144]
    ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, ROOT)
    import bench as bench_mod

    fasta, fastq, *_ = bench_mod.gen_workload()
    for B in sizes:
        stats = bench_mod.run_tpu(fasta, fastq, passes=2, batch_size=B)
        rs = stats["n_reads"] / stats["classify_s"]
        log(
            f"B={B}: {rs / 1e3:.0f}k reads/s "
            f"(classify_s={stats['classify_s']:.3f}, "
            f"assoc={stats['n_associations']})"
        )


if __name__ == "__main__":
    main()
