"""Stage profile of the CLASSIC kernel at transcriptome scale (50k genes,
D3=16) after the pay/rows3 redesign: the old all-degrees wide gene_mat
(2.3GB, 47M rows/s) is replaced by 8-byte tag/payload rows (100M rows/s at
any size, bench/txome_gather.py) plus a compacted deg>=3 row table gathered
under a batch-level cond. The r2 end-to-end bench ran ~2.1 s/batch (30.7k
reads/s) on the old layout.

Each stage adds one piece of the real kernel on the real index + batch;
plus extra gather-shape probes on a >64MB table.

Usage: python bench/profile_txome.py [n_genes]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(ROOT, "bench", ".cache", "txome")
B, L = 65536, 104


def log(m):
    print(f"[ptx] {m}", file=sys.stderr, flush=True)


def main():
    n_genes = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    fasta = os.path.join(CACHE, f"genes{n_genes}.fa")
    fastq = os.path.join(CACHE, f"reads{n_genes}_500000.fq")
    if not os.path.exists(fastq):
        log("run bench/transcriptome_bench.py once to generate the workload")
        return

    from shark_tpu.classify.step import (
        DeviceIndex,
        StaticMeta,
        build_device_index,
        emit_threshold_table,
        finish_from_tags,
        hash_positions,
        probe_rank,
        probe_tags,
        take_rows,
        unpack_codes,
    )
    from shark_tpu.config import SharkConfig
    from shark_tpu.io.native import NativeStream
    from shark_tpu.pipeline import load_or_build_index
    from shark_tpu.utils.timers import PhaseTimer

    idx_dir = os.path.join(CACHE, f"index{n_genes}.d")
    cfg = SharkConfig(
        fasta_path=fasta, sample1_path=fastq, k=17, c=0.6, bf_gb=1
    )
    cfg.load_index = idx_dir if os.path.isdir(idx_dir) else ""
    cfg.save_index = "" if cfg.load_index else idx_dir
    t0 = time.time()
    index = load_or_build_index(cfg, PhaseTimer())
    log(f"index ready in {time.time() - t0:.0f}s (n_set={index.n_set_bits})")
    meta = StaticMeta.for_index(index, L)
    log(f"geometry D={meta.degree}/{meta.ext_w} D3={meta.degree3}/{meta.ext3_w}")
    bf_rank, pay, rows3, ext_mat = build_device_index(index)
    log(
        f"bf_rank {bf_rank.nbytes / 1e9:.2f}GB, pay {pay.nbytes / 1e9:.2f}GB, "
        f"rows3 {rows3.nbytes / 1e6:.1f}MB"
    )

    ns = NativeStream(fastq, "", B, L, 0, packed=True)
    packed, vmask, slot, n = ns.next_batch()
    packed, vmask = packed.copy(), vmask.copy()
    ns.close()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    t0 = time.time()
    dix = DeviceIndex(
        bf_rank=jax.device_put(bf_rank, dev),
        pay=jax.device_put(pay, dev),
        rows3=jax.device_put(rows3, dev),
        ext_mat=jax.device_put(ext_mat, dev) if ext_mat is not None else None,
    )
    thresh = jax.device_put(emit_threshold_table(0.6, L), dev)
    pk = jax.device_put(packed, dev)
    vm = jax.device_put(vmask, dev)
    np.asarray(jnp.sum(dix.bf_rank[:2]))
    log(f"h2d {time.time() - t0:.0f}s")

    def front(pk, vm):
        codes = unpack_codes(pk, vm)
        word_idx, bit_off, win_valid = hash_positions(codes, meta)
        length = jnp.sum((codes < 4).astype(jnp.int32), axis=1)
        return word_idx, bit_off, win_valid, length

    # NOTE: dix must be an ARGUMENT of each jitted fn — a closure would be
    # captured as a multi-GB compile-time constant (and shipped to the
    # remote compile session on the tunneled backend)
    stages = {}
    stages["s0 front"] = jax.jit(
        lambda dix, pk, vm: front(pk, vm)[0].astype(jnp.uint32).sum()
    )
    stages["s1 +bf_rank gather"] = jax.jit(
        lambda dix, pk, vm: (
            lambda f: sum(
                x.astype(jnp.uint32).sum()
                for x in probe_rank(dix.bf_rank, f[0], f[1], f[2])
            )
        )(front(pk, vm))
    )
    stages["s2 +pay gather (tags)"] = jax.jit(
        lambda dix, pk, vm: (
            lambda f: sum(
                x.astype(jnp.uint32).sum()
                for x in probe_tags(dix, f[0], f[1], f[2])
            )
        )(front(pk, vm))
    )

    def s3(dix, pk, vm):
        f = front(pk, vm)
        tagv, payv = probe_tags(dix, f[0], f[1], f[2])
        out = finish_from_tags(
            tagv,
            payv,
            f[3],
            thresh,
            rows3=dix.rows3,
            ext_mat=dix.ext_mat,
            meta=meta,
            max_winners=16,
            L=L,
            has_rows=True,
        )
        return out[0].sum()

    stages["s3 full"] = jax.jit(s3)

    def timeit(f, reps=3):
        np.asarray(f(dix, pk, vm))
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            np.asarray(f(dix, pk, vm))
            best = min(best, time.time() - t0)
        return best

    for name, fn in stages.items():
        dt = timeit(fn)
        log(f"{name:<24} {dt * 1000:8.1f} ms")

    # extra gather shapes on a >64MB table: map the element-count curve
    rng = np.random.default_rng(0)
    k = meta.k
    N = B * (L - k + 1)
    idx = jax.device_put(
        rng.integers(0, 1 << 26, size=N, dtype=np.int64).astype(np.int32),
        dev,
    )
    floor = timeit(jax.jit(lambda dix, pk, vm: idx.sum()))
    gsum = jax.jit(
        lambda t, i: jnp.take(t, i, axis=0).astype(jnp.uint32).sum()
    )
    for w in (2, 4, 8):
        tab = jax.device_put(np.zeros((1 << 26, w), np.uint32), dev)
        np.asarray(gsum(tab, idx))
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            np.asarray(gsum(tab, idx))
            best = min(best, time.time() - t0)
        log(
            f"gather [2^26,{w}]u32 ({(4 * w) << 6}MB) {best * 1000:7.1f} ms "
            f"{N / max(best - floor, 1e-9) / 1e6:6.1f} M rows/s"
        )
        del tab


if __name__ == "__main__":
    main()
