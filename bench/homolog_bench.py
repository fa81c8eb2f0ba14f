"""Homolog-heavy end-to-end bench: many multi-winner (tied) reads.

VERDICT r1 asked for proof that the multi-winner fetch no longer cliffs:
a tie-heavy 500k-read workload must run within ~10% of the unique-winner
bench. Workload: 500 genes in 62 families of 8 sharing a 300bp core;
half the reads come from family cores, so a large fraction of emitted
reads tie across all 8 members (winners crossing d2h per batch).

Usage: python bench/homolog_bench.py [n_reads=500000]
Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(ROOT, "bench", ".cache", "homolog")
K, C, BF_BITS = 17, 0.6, 1 << 33
GENE_LEN, READ_LEN, CORE = 1500, 100, 300


def log(m):
    print(f"[homolog] {m}", file=sys.stderr, flush=True)


def run(n_reads: int = 500_000) -> dict:
    os.makedirs(CACHE, exist_ok=True)
    fasta = os.path.join(CACHE, "genes.fa")
    fastq = os.path.join(CACHE, f"reads{n_reads}.fq")
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    rng = np.random.default_rng(4242)
    # completion stamp written LAST: a generation interrupted by bench.py's
    # SIGTERM handler (os._exit) must not leave a torn fastq that every
    # later run trusts
    stamp = os.path.join(CACHE, f"stamp_{n_reads}")
    if not os.path.exists(stamp):
        log("generating family workload ...")
        genes = []
        core_start = (GENE_LEN - CORE) // 2
        with open(fasta, "wb") as f:
            for g in range(500):
                if g % 8 == 0:
                    core = bases[rng.integers(0, 4, size=CORE)]
                left = bases[rng.integers(0, 4, size=core_start)]
                right = bases[
                    rng.integers(0, 4, size=GENE_LEN - core_start - CORE)
                ]
                seq = np.concatenate([left, core, right])
                genes.append(seq)
                f.write(b">G%04d\n" % g + seq.tobytes() + b"\n")
        qual = b"I" * READ_LEN
        with open(fastq, "wb") as f:
            for i in range(n_reads):
                gi = int(rng.integers(0, 500))
                if i % 2 == 0:  # core-only read: ties across the family
                    start = int(
                        rng.integers(core_start, core_start + CORE - READ_LEN)
                    )
                else:
                    start = int(rng.integers(0, core_start - READ_LEN))
                arr = genes[gi][start : start + READ_LEN]
                f.write(b"@r%07d\n" % i + arr.tobytes() + b"\n+\n" + qual + b"\n")
        open(stamp, "w").close()

    sys.path.insert(0, ROOT)
    import bench as bench_mod

    base = bench_mod.run_baseline(fasta, fastq, best_of=2, label="homolog")

    from shark_tpu.classify.step import Classifier
    from shark_tpu.config import SharkConfig
    from shark_tpu.pipeline import load_or_build_index, run_pipeline
    from shark_tpu.utils.timers import PhaseTimer

    cfg = SharkConfig(
        fasta_path=fasta,
        sample1_path=fastq,
        out1_path=os.path.join(CACHE, "out.fq"),
        ssv_path=os.path.join(CACHE, "out.ssv"),
        k=K,
        c=C,
        bf_gb=BF_BITS >> 33,
        batch_size=65536,
        max_read_len=104,
        max_winners=16,
    )
    index = load_or_build_index(cfg, PhaseTimer())
    clf = Classifier(index, max_winners=cfg.max_winners, c=cfg.c)
    log(f"probe path: {clf.probe}")
    best = None
    for p in range(2):
        stats = run_pipeline(cfg, classifier=clf)
        log(f"pass {p}: {stats}")
        if best is None or stats["classify_s"] < best["classify_s"]:
            best = stats
    v = best["n_reads"] / best["classify_s"]
    frac_multi = best["n_associations"] / max(1, best["n_reads_out"])
    log(f"assoc/read_out = {frac_multi:.2f} (ties per emitted read)")
    if best["n_associations"] != base["n_associations"]:
        # fatal, not a warning: an exactness violation must fail the
        # sub-bench (bench.py's guard keeps the primary artifact alive)
        raise RuntimeError(
            "homolog association mismatch vs CPU baseline: "
            f"{best['n_associations']} vs {base['n_associations']}"
        )
    out = {
        "metric": "homolog_reads_per_sec",
        "value": round(v, 1),
        "unit": "reads/s",
        # NOTE: the CPU baseline only COUNTS associations (no ssv
        # or FASTQ output), while the TPU side writes ~2.2M ssv
        # lines + 500k FASTQ records — vs_baseline is conservative
        "vs_baseline": round(v / base["reads_per_sec"], 3),
        "n_associations": best["n_associations"],
        "n_reads_out": best["n_reads_out"],
        "assoc_per_emitted_read": round(frac_multi, 2),
    }
    # weather-stable device-only signal (see bench.measure_device_only);
    # guarded: a diagnostic-metric failure must not discard the measured
    # primary value (bench.py's own artifact rule)
    try:
        dm = bench_mod.measure_device_only(
            clf, fastq, max_len=cfg.max_read_len, batch_size=cfg.batch_size
        )
        if dm is not None:
            out["device_ms"] = round(1000 * dm[0], 1)
            out["device_reads_per_sec"] = round(dm[1] / dm[0], 1)
    except Exception as e:  # noqa: BLE001 - diagnostic only
        log(f"WARNING: device-only measure failed: {e}")
    # this module's `import bench` is its own instance when bench.py runs
    # as __main__, so the spread must ride the result dict
    sp = bench_mod.baseline_spread("homolog")
    if sp is not None:
        out["baseline_spread"] = sp
    return out


def main():
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    print(json.dumps(run(n_reads)))


if __name__ == "__main__":
    main()
