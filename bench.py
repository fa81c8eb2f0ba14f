#!/usr/bin/env python
"""Benchmark: TPU classify throughput vs a CPU baseline of the reference
algorithm.

Workload: a synthetic gene panel (FASTA) + simulated reads (FASTQ), default
Bloom size (1 GiB of bits, the reference's -b 1), k=17, c=0.6 — the
reference's headline configuration (BASELINE.md). The baseline is
bench/baseline.cpp, an independent C++ implementation of the reference's
algorithm with a faster index layout, run with all host cores; the TPU side
is the full shark_tpu pipeline (host FASTQ parse + encode + device classify +
threshold + ssv write) timed end-to-end over its classify phase.

Prints ONE JSON line:
  {"metric": "reads_per_sec", "value": N, "unit": "reads/s", "vs_baseline": R}
"""

from __future__ import annotations

import io
import json
import os
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(ROOT, "bench", ".cache")

K = 17
C = 0.6
BF_BITS = 1 << 33  # reference default -b 1
N_GENES = 500
GENE_LEN = 1500
N_READS = 500_000
READ_LEN = 100


def log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def gen_workload():
    os.makedirs(CACHE, exist_ok=True)
    fasta = os.path.join(CACHE, "genes.fa")
    fastq = os.path.join(CACHE, "reads.fq")
    stamp = os.path.join(
        CACHE, f"stamp_{N_GENES}x{GENE_LEN}_{N_READS}x{READ_LEN}"
    )
    if os.path.exists(stamp):
        return fasta, fastq
    log("generating synthetic workload ...")
    rng = np.random.default_rng(12345)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    genes = []
    with open(fasta, "wb") as f:
        for g in range(N_GENES):
            seq = bases[rng.integers(0, 4, size=GENE_LEN)]
            genes.append(seq)
            f.write(b">GENE%05d\n" % g)
            f.write(seq.tobytes() + b"\n")
    qual = b"I" * READ_LEN
    err_bases = np.frombuffer(b"ACGTN", dtype=np.uint8)
    with open(fastq, "wb") as f:
        gidx = rng.integers(0, N_GENES, size=N_READS)
        starts = rng.integers(0, GENE_LEN - READ_LEN, size=N_READS)
        for i in range(N_READS):
            arr = genes[gidx[i]][starts[i] : starts[i] + READ_LEN].copy()
            mut = rng.random(READ_LEN) < 0.02
            nm = int(mut.sum())
            if nm:
                arr[mut] = err_bases[rng.integers(0, 5, size=nm)]
            f.write(b"@r%07d\n" % i)
            f.write(arr.tobytes() + b"\n+\n" + qual + b"\n")
    open(stamp, "w").close()
    return fasta, fastq


def build_baseline() -> str:
    exe = os.path.join(CACHE, "baseline")
    src = os.path.join(ROOT, "bench", "baseline.cpp")
    if os.path.exists(exe) and os.path.getmtime(exe) > os.path.getmtime(src):
        return exe
    os.makedirs(CACHE, exist_ok=True)
    log("compiling CPU baseline ...")
    subprocess.run(
        ["g++", "-O3", "-march=native", "-std=c++17", "-pthread",
         "-o", exe, src],
        check=True,
    )
    return exe


def run_baseline(fasta: str, fastq: str) -> dict:
    exe = build_baseline()
    threads = os.cpu_count() or 1
    log(f"running CPU baseline ({threads} threads, best of 3) ...")
    best = None
    for _ in range(3):
        out = subprocess.run(
            [exe, fasta, fastq, str(K), str(C), str(BF_BITS), str(threads)],
            check=True, capture_output=True, text=True,
        ).stdout
        res = json.loads(out.strip().splitlines()[-1])
        if best is None or res["reads_per_sec"] > best["reads_per_sec"]:
            best = res
    log(f"baseline: {best}")
    return best


def run_tpu(fasta: str, fastq: str) -> dict:
    from shark_tpu.config import SharkConfig
    from shark_tpu.pipeline import run_pipeline

    out1 = os.path.join(CACHE, "sharked.out.fq")
    cfg = SharkConfig(
        fasta_path=fasta,
        sample1_path=fastq,
        out1_path=out1,
        ssv_path=os.path.join(CACHE, "out.ssv"),
        k=K,
        c=C,
        bf_gb=BF_BITS >> 33,
        batch_size=65536,
        max_read_len=128,
    )
    idx_dir = os.path.join(CACHE, "index.d")
    if os.path.isdir(idx_dir):
        cfg.load_index = idx_dir
    else:
        cfg.save_index = idx_dir
    log("running shark_tpu pipeline (warm-up + timed) ...")
    stats = run_pipeline(cfg)
    log(f"shark_tpu: {stats}")
    return stats


def main() -> None:
    fasta, fastq = gen_workload()
    base = run_baseline(fasta, fastq)
    ours = run_tpu(fasta, fastq)
    value = ours["n_reads"] / ours["classify_s"]

    if ours["n_associations"] != base["n_associations"]:
        log(
            "WARNING: association count mismatch: "
            f"tpu={ours['n_associations']} baseline={base['n_associations']}"
        )

    vs = value / base["reads_per_sec"]
    print(json.dumps({
        "metric": "reads_per_sec",
        "value": round(value, 1),
        "unit": "reads/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
