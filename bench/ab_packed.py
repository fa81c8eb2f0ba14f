"""In-session A/B of hashed-table layouts after the gather cost model
(bench/gather_gap.py: ~2.3 ns/row flat + ~0.25 ns/element; 2-D indices add
~1.7 ns/row).

Variants (same index, same batch, verdict-equality checked):
  ctl-2d   entry8 planar [n,2,8], 2-D index gather   (r2 production, ~80ms)
  e8-flat  entry8 planar [n,2,8], flat gather
  s8-19    packed16 u32[2^19,8] 16MB, flat
  s4-21    packed16 u32[2^21,4] 32MB, flat (stash ~128)
  s4-22    packed16 u32[2^22,4] 64MB, flat (at the cliff boundary)

Usage: python bench/ab_packed.py
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
    print(f"[ab] {m}", file=sys.stderr, flush=True)


def main():
    import bench as bench_mod

    fasta, fastq, *_ = bench_mod.gen_workload()
    from shark_tpu.classify import hashed as H
    from shark_tpu.classify.step import StaticMeta, emit_threshold_table
    from shark_tpu.config import SharkConfig
    from shark_tpu.io.native import NativeStream
    from shark_tpu.pipeline import load_or_build_index
    from shark_tpu.utils.timers import PhaseTimer

    cfg = SharkConfig(fasta_path=fasta, sample1_path=fastq, k=17, c=0.6)
    idx_dir = os.path.join(CACHE, "index.d")
    cfg.load_index = idx_dir if os.path.isdir(idx_dir) else ""
    cfg.save_index = "" if cfg.load_index else idx_dir
    index = load_or_build_index(cfg, PhaseTimer())
    meta = StaticMeta.for_index(index, L)

    pos = H._set_bit_positions(index)
    deg = np.diff(index.offsets).astype(np.int64)
    off = index.offsets[:-1].astype(np.int64)
    gene_ids = np.asarray(index.gene_ids)
    first_gene = gene_ids[np.minimum(off, gene_ids.size - 1)].astype(np.uint32)
    tag = np.where(deg == 1, H.TAG_D1, np.where(deg == 2, H.TAG_D2, H.TAG_ROW))
    payload = first_gene.copy()
    d2 = deg == 2
    payload[d2] |= gene_ids[off[d2] + 1].astype(np.uint32) << 16
    need16 = np.where(deg == 1, 1, 2).astype(np.int64)

    def build(entry16, slots, lgB):
        built = H._pack_table(
            pos, tag, payload, need16 if entry16 else None, lgB, entry16, slots
        )
        assert built is not None
        table, stash_rows = built
        log(
            f"  built entry16={entry16} slots={slots} lgB={lgB}: "
            f"{table.nbytes >> 20}MB, stash {stash_rows.shape[0]}"
        )
        return (
            table,
            H._pad_stash(stash_rows),
            H.HashedMeta(lgB=lgB, has_rows=False, entry16=entry16, slots=slots),
        )

    ns = NativeStream(fastq, "", B, L, 0, packed=True)
    packed, vmask, slot, n = ns.next_batch()
    packed, vmask = packed.copy(), vmask.copy()
    ns.close()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    thresh = jax.device_put(emit_threshold_table(0.6, L), dev)
    pk = jax.device_put(packed, dev)
    vm = jax.device_put(vmask, dev)
    gm_dummy = jax.device_put(np.zeros((1, 2), np.uint16), dev)

    import shark_tpu.classify.step as step_mod

    take_flat = step_mod.take_rows

    def take_2d(table, idx):
        return jnp.take(table, idx, axis=0)

    variants = [
        ("ctl-2d ", False, 8, 19, take_2d),
        ("e8-flat", False, 8, 19, take_flat),
        ("s8-19  ", True, 8, 19, take_flat),
        ("s4-21  ", True, 4, 21, take_flat),
        ("s4-22  ", True, 4, 22, take_flat),
    ]

    ref = None
    results = {}
    for name, e16, slots, lgB, taker in variants:
        table, stash, hmeta = build(e16, slots, lgB)
        dix = H.HashedDeviceIndex(
            table=jax.device_put(table, dev),
            stash=jax.device_put(stash, dev),
            rows3=gm_dummy,
            ext_mat=None,
        )
        step_mod.take_rows = taker
        H.take_rows = taker
        fn = jax.jit(
            lambda pk, vm, dix=dix, hmeta=hmeta: H.classify_kernel_hashed_packed(
                dix, thresh, pk, vm, meta=meta, hmeta=hmeta, max_winners=16
            )
        )
        out = fn(pk, vm)
        got = np.asarray(out[0])
        if ref is None:
            ref = got
        else:
            assert np.array_equal(ref, got), f"{name} verdicts differ"
        best = 1e9
        for _ in range(4):
            t0 = time.time()
            np.asarray(fn(pk, vm)[0])
            best = min(best, time.time() - t0)
        results[name] = best
        log(f"{name} {best * 1000:7.1f} ms/batch")
        del dix, table, stash
    step_mod.take_rows = take_flat
    H.take_rows = take_flat

    base = results["ctl-2d "]
    for name, dt in results.items():
        log(f"{name} {dt * 1000:7.1f} ms  {base / dt:5.2f}x vs control")


if __name__ == "__main__":
    main()
