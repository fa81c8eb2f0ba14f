"""Localize the homolog process-state slowdown seen in the full bench.py.

bench.py measures homolog ~3.5x slower after the single-end/paired/q10
stages ran in the same process; a clean process is fine. This prints a
PER-BATCH per-stage serial breakdown (parse / dispatch / fetch_packed /
extract_pairs / emit) for the homolog loop BEFORE and AFTER running the
single-end bench stage in-process, so the contaminated stage is directly
visible.

Usage: python bench/repro_homolog_slow.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
B, L = 65536, 104
CACHE = os.path.join(ROOT, "bench", ".cache", "homolog")


def log(m):
    print(f"[repro] {m}", file=sys.stderr, flush=True)


def serial_profile(tag, cfg, index, clf):
    from shark_tpu.io.native import NativeStream
    from shark_tpu.pipeline import _winner_pairs

    ns = NativeStream(cfg.sample1_path, "", B, L, 0, packed=True)
    ns.set_output(1, cfg.ssv_path, cfg.out1_path, "")
    ns.register_genes(index.gene_names)
    bi = 0
    t_all = time.time()
    while True:
        t0 = time.time()
        nb = ns.next_batch()
        t_parse = time.time() - t0
        if nb is None:
            break
        pk, vm, slot, n = nb
        t0 = time.time()
        r = clf.call_packed(pk, vm)
        t_disp = time.time() - t0
        t0 = time.time()
        pk_np = np.asarray(r[0])[:n]
        t_fetch = time.time() - t0
        t0 = time.time()
        ri, gi = _winner_pairs(
            cfg, index, r, n, (pk, vm), 16, packed_np=pk_np, groups=clf.groups
        )
        t_wp = time.time() - t0
        t0 = time.time()
        ns.emit(slot, ri, gi)
        t_emit = time.time() - t0
        log(
            f"{tag} b{bi}: parse {t_parse * 1000:6.1f} disp {t_disp * 1000:5.1f} "
            f"fetch {t_fetch * 1000:6.1f} wpairs {t_wp * 1000:7.1f} "
            f"emit {t_emit * 1000:6.1f} ms  (n={n}, nassoc={len(ri)})"
        )
        bi += 1
    total = time.time() - t_all
    ns.close()
    log(f"{tag} serial total {total:.2f}s ({500000 / total:,.0f} reads/s)")


def main():
    from shark_tpu.classify.step import Classifier
    from shark_tpu.config import SharkConfig
    from shark_tpu.pipeline import _winner_pairs, load_or_build_index
    from shark_tpu.utils.timers import PhaseTimer

    cfg = SharkConfig(
        fasta_path=os.path.join(CACHE, "genes.fa"),
        sample1_path=os.path.join(CACHE, "reads500000.fq"),
        out1_path=os.path.join(CACHE, "out.fq"),
        ssv_path=os.path.join(CACHE, "out.ssv"),
        k=17, c=0.6, bf_gb=1,
        batch_size=B, max_read_len=L, max_winners=16,
    )
    index = load_or_build_index(cfg, PhaseTimer())
    clf = Classifier(index, max_winners=16, c=0.6, probe="hashed")

    # warmup: compile kernel + extract_pairs caps on one real batch
    from shark_tpu.io.native import NativeStream

    ns0 = NativeStream(cfg.sample1_path, "", B, L, 0, packed=True)
    pk0, vm0, slot, n = ns0.next_batch()
    r = clf.call_packed(pk0, vm0)
    _winner_pairs(
        cfg, index, r, n, (pk0, vm0), 16, packed_np=np.asarray(r[0])[:n], groups=clf.groups
    )
    ns0.release(slot)
    ns0.close()

    serial_profile("before", cfg, index, clf)
    serial_profile("before2", cfg, index, clf)

    import bench as bench_mod

    fasta, fastq, _, _, _ = bench_mod.gen_workload()
    ours = bench_mod.run_tpu(fasta, fastq)
    log(f"single-end stage: {ours['n_reads'] / ours['classify_s']:,.0f} reads/s")

    serial_profile("after", cfg, index, clf)


if __name__ == "__main__":
    main()
