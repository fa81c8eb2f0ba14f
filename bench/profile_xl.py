"""Stage profile of the XL (GB-scale one-gather) probe vs the classic
two-gather path, same session, on the real 50k-gene transcriptome index.

Round-3 verdict: the xl layout matched but did not beat classic (192k vs
~200k reads/s e2e) against a cost model predicting ~1.5x. This harness
answers WHERE the time goes (main 16-byte gather? side-table cond?
finish?) and A/Bs the candidate fixes in one session:

  - stage ladder: front -> +main gather -> +match -> +side -> full
  - classic full kernel on the same batch (the A/B anchor)
  - synthetic same-size gathers: [2^27,2]u32 (8B rows) vs [2^26,4]u32
    (16B rows) vs [2^25,8] — the isolated element-count curve at 1 GiB
    (bench/txome_gather.py measured 100M vs 92M rows/s; is it true
    IN-KERNEL at this table size?)
  - XL_SLOTS=2 variant (8-byte rows, one entry or half a degree-2 entry
    per bucket, bigger side table): the "universal fast shape" bet.

Usage: python bench/profile_xl.py [n_genes] [quick]
`quick` skips the synthetic gather curve and the XL_SLOTS=2 variant
(stage ladder + classic anchor only — the A/B loop for side-resolve work).
Needs the cached workload from bench/transcriptome_bench.py.
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
    print(f"[pxl] {m}", file=sys.stderr, flush=True)


def main():
    n_genes = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    fasta = os.path.join(CACHE, f"genes{n_genes}.fa")
    fastq = os.path.join(CACHE, f"reads{n_genes}_500000.fq")
    if not os.path.exists(fastq):
        log("run bench/transcriptome_bench.py once to generate the workload")
        return

    from shark_tpu.classify import hashed as H
    from shark_tpu.classify.hashed import (
        HashedDeviceIndex,
        _pad_stash,
        build_hashed_xl,
        classify_kernel_hashed,
    )
    from shark_tpu.classify.step import (
        DeviceIndex,
        StaticMeta,
        bloom_positions,
        build_device_index,
        build_rows3,
        emit_threshold_table,
        finish_from_tags,
        hash_positions,
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

    t0 = time.time()
    built = build_hashed_xl(index)
    assert built is not None
    table, side, side_stash, hmeta = built
    log(
        f"xl build {time.time() - t0:.0f}s lgB={hmeta.lgB} "
        f"table {table.nbytes / 1e9:.2f}GB side_lgB={hmeta.side_lgB} "
        f"side {side.nbytes / 1e6:.0f}MB has_side={hmeta.has_side}"
    )
    flagged = int(((table[:, 0] >> H.XL_FLAG_BIT) & 1).sum())
    log(f"flagged buckets {flagged} ({flagged / table.shape[0] * 100:.2f}%)")
    rows3, ext_mat = build_rows3(index)

    ns = NativeStream(fastq, "", B, L, 0, packed=True)
    nb = ns.next_batch()
    packed, vmask = nb[0].copy(), nb[1].copy()
    ns.close()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    thresh = jax.device_put(emit_threshold_table(0.6, L), dev)
    pk = jax.device_put(packed, dev)
    vm = jax.device_put(vmask, dev)

    dix_xl = HashedDeviceIndex(
        table=jax.device_put(table, dev),
        stash=jax.device_put(_pad_stash(np.empty((0, 4), np.uint32)), dev),
        rows3=jax.device_put(rows3, dev),
        ext_mat=jax.device_put(ext_mat, dev) if ext_mat is not None else None,
        side=jax.device_put(side, dev),
        side_stash=jax.device_put(side_stash, dev),
    )
    np.asarray(jnp.sum(dix_xl.table[0]))
    log("xl tables on device")

    lgB = hmeta.lgB

    def front(pk, vm):
        codes = unpack_codes(pk, vm)
        idx_hi, idx_lo, win_valid = bloom_positions(codes, meta)
        length = jnp.sum((codes < 4).astype(jnp.int32), axis=1)
        return idx_hi, idx_lo, win_valid, length

    def match(dix, f, with_side: bool):
        idx_hi, idx_lo, win_valid, _ = f
        bucket = (idx_lo & jnp.uint32((1 << lgB) - 1)).astype(jnp.int32)
        rest = (idx_lo >> lgB) | (idx_hi << (32 - lgB))
        row = take_rows(dix.table, bucket)
        meta_l = row >> 16
        pay_l = row & jnp.uint32(0xFFFF)
        lane_tag = meta_l >> 14
        m = (
            ((meta_l & jnp.uint32((1 << H.XL_REST_BITS) - 1))
             == rest[..., None])
            & (lane_tag != 0)
            & win_valid[..., None]
        )
        iota = jnp.arange(hmeta.slots, dtype=jnp.uint32)
        fs = jnp.min(jnp.where(m, iota, hmeta.slots), axis=-1, keepdims=True)
        p0 = jnp.sum(jnp.where(m & (iota == fs), pay_l, 0), axis=-1)
        p1 = jnp.sum(jnp.where(m & (iota > fs), pay_l, 0), axis=-1)
        tagv = jnp.max(jnp.where(m, lane_tag, 0), axis=-1)
        payv = p0 | (p1 << 16)
        if with_side:
            flg = ((row[..., 0] >> H.XL_FLAG_BIT) & 1) == 1
            need = win_valid & flg & ~jnp.any(m, axis=-1)
            tagv, payv = H._xl_side_resolve(
                dix, hmeta, idx_lo, idx_hi, need, tagv, payv
            )
        return tagv, payv

    stages = {}
    stages["x0 front"] = jax.jit(
        lambda dix, pk, vm: front(pk, vm)[1].astype(jnp.uint32).sum()
    )
    stages["x1 +main gather"] = jax.jit(
        lambda dix, pk, vm: (
            lambda f: take_rows(
                dix.table,
                (f[1] & jnp.uint32((1 << lgB) - 1)).astype(jnp.int32),
            ).astype(jnp.uint32).sum()
        )(front(pk, vm))
    )
    stages["x2 +match (no side)"] = jax.jit(
        lambda dix, pk, vm: sum(
            x.astype(jnp.uint32).sum()
            for x in match(dix, front(pk, vm), False)
        )
    )
    stages["x3 +side resolve"] = jax.jit(
        lambda dix, pk, vm: sum(
            x.astype(jnp.uint32).sum()
            for x in match(dix, front(pk, vm), True)
        )
    )

    def full_xl(dix, pk, vm):
        codes = unpack_codes(pk, vm)
        out = classify_kernel_hashed(
            dix, thresh, codes, meta=meta, hmeta=hmeta, max_winners=16
        )
        return out[0].sum()

    stages["x4 full xl"] = jax.jit(full_xl)

    def timeit(f, a, reps=3):
        np.asarray(f(a, pk, vm))
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            np.asarray(f(a, pk, vm))
            best = min(best, time.time() - t0)
        return best

    results = {}
    for name, fn in stages.items():
        dt = timeit(fn, dix_xl)
        results[name] = dt
        log(f"{name:<22} {dt * 1000:8.1f} ms")

    # ---- classic kernel, same session, same batch --------------------
    bf_rank, pay, rows3c, ext_matc = build_device_index(index)
    dix_c = DeviceIndex(
        bf_rank=jax.device_put(bf_rank, dev),
        pay=jax.device_put(pay, dev),
        rows3=jax.device_put(rows3c, dev),
        ext_mat=(
            jax.device_put(ext_matc, dev) if ext_matc is not None else None
        ),
    )
    np.asarray(jnp.sum(dix_c.bf_rank[:2]))

    def full_classic(dix, pk, vm):
        codes = unpack_codes(pk, vm)
        word_idx, bit_off, win_valid = hash_positions(codes, meta)
        length = jnp.sum((codes < 4).astype(jnp.int32), axis=1)
        tagv, payv = probe_tags(dix, word_idx, bit_off, win_valid)
        out = finish_from_tags(
            tagv, payv, length, thresh,
            rows3=dix.rows3, ext_mat=dix.ext_mat, meta=meta,
            max_winners=16, L=L, has_rows=True,
        )
        return out[0].sum()

    dt = timeit(jax.jit(full_classic), dix_c)
    results["c4 full classic"] = dt
    log(f"{'c4 full classic':<22} {dt * 1000:8.1f} ms")

    if "quick" in sys.argv[1:]:
        for k_, v in results.items():
            log(f"SUMMARY {k_:<22} {v * 1000:8.1f} ms "
                f"{B / v / 1e3:7.0f}k reads/s")
        return

    # ---- isolated same-size gather shapes (1 GiB each) ---------------
    N = B * (L - meta.k + 1)
    rng = np.random.default_rng(0)
    floor = timeit(jax.jit(lambda dix, pk, vm: pk.sum()), dix_xl)
    for lg, w in ((27, 2), (26, 4), (25, 8)):
        tab = jax.device_put(np.zeros((1 << lg, w), np.uint32), dev)
        idx = jax.device_put(
            rng.integers(0, 1 << lg, size=N, dtype=np.int64).astype(
                np.int32
            ),
            dev,
        )
        g = jax.jit(
            lambda t, i, pk, vm: jnp.take(t, i, axis=0)
            .astype(jnp.uint32)
            .sum()
        )
        np.asarray(g(tab, idx, pk, vm))
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            np.asarray(g(tab, idx, pk, vm))
            best = min(best, time.time() - t0)
        log(
            f"gather [2^{lg},{w}]u32 (1GiB) {best * 1000:7.1f} ms "
            f"{N / max(best - floor, 1e-9) / 1e6:6.1f} M rows/s"
        )
        del tab, idx

    # ---- XL_SLOTS=2 variant (8-byte rows) ----------------------------
    old_slots = H.XL_SLOTS
    try:
        H.XL_SLOTS = 2
        t0 = time.time()
        b2 = build_hashed_xl(index)
        if b2 is None:
            log("slots2: not buildable (spill cap) — negative recorded")
        else:
            t2, s2, st2, hm2 = b2
            log(
                f"slots2 build {time.time() - t0:.0f}s lgB={hm2.lgB} "
                f"table {t2.nbytes / 1e9:.2f}GB side_lgB={hm2.side_lgB} "
                f"side {s2.nbytes / 1e6:.0f}MB"
            )
            fl2 = int(((t2[:, 0] >> H.XL_FLAG_BIT) & 1).sum())
            log(f"slots2 flagged {fl2} ({fl2 / t2.shape[0] * 100:.2f}%)")
            dix2 = HashedDeviceIndex(
                table=jax.device_put(t2, dev),
                stash=dix_xl.stash,
                rows3=dix_xl.rows3,
                ext_mat=dix_xl.ext_mat,
                side=jax.device_put(s2, dev),
                side_stash=jax.device_put(st2, dev),
            )
            np.asarray(jnp.sum(dix2.table[0]))

            def full_xl2(dix, pk, vm):
                codes = unpack_codes(pk, vm)
                out = classify_kernel_hashed(
                    dix, thresh, codes, meta=meta, hmeta=hm2, max_winners=16
                )
                return out[0].sum()

            lgB2 = hm2.lgB
            g2 = jax.jit(
                lambda dix, pk, vm: (
                    lambda f: take_rows(
                        dix.table,
                        (f[1] & jnp.uint32((1 << lgB2) - 1)).astype(
                            jnp.int32
                        ),
                    ).astype(jnp.uint32).sum()
                )(front(pk, vm))
            )
            dt = timeit(g2, dix2)
            log(f"{'s1 slots2 gather':<22} {dt * 1000:8.1f} ms")
            dt = timeit(jax.jit(full_xl2), dix2)
            results["s4 full slots2"] = dt
            log(f"{'s4 full slots2':<22} {dt * 1000:8.1f} ms")
            # exactness: slots2 verdicts == slots4 verdicts on this batch
            w4 = np.asarray(
                jax.jit(
                    lambda dix, pk, vm: classify_kernel_hashed(
                        dix, thresh, unpack_codes(pk, vm),
                        meta=meta, hmeta=hmeta, max_winners=16,
                    )[0]
                )(dix_xl, pk, vm)
            )
            w2 = np.asarray(
                jax.jit(
                    lambda dix, pk, vm: classify_kernel_hashed(
                        dix, thresh, unpack_codes(pk, vm),
                        meta=meta, hmeta=hm2, max_winners=16,
                    )[0]
                )(dix2, pk, vm)
            )
            log(f"slots2 verdicts equal: {bool((w4 == w2).all())}")
    finally:
        H.XL_SLOTS = old_slots

    for k_, v in results.items():
        rate = B / v / 1e3
        log(f"SUMMARY {k_:<22} {v * 1000:8.1f} ms  {rate:7.0f}k reads/s")


if __name__ == "__main__":
    main()
