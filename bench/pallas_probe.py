"""Experiment: can a Pallas kernel with hand-pipelined per-row DMAs beat
XLA's gather for the Bloom-probe access pattern (random 8-byte rows from a
GiB-scale HBM table)?

Result (v5e, 2026-08-17, 4M random probes of a 1 GiB table): NO —
  jnp.take      72.9 ms  (~93M rows/s after subtracting dispatch floor)
  pallas DMA   185.9 ms  (~26M rows/s), NSLOT=16 in-flight copies
XLA's gather wins 3-4x: the Pallas variant must issue one async copy per
row from the scalar core (there is no vector-gather-from-HBM primitive on
this hardware generation) and per-copy issue overhead dominates even with
a deep in-flight ring. The classify kernels therefore use jnp.take for
probes; Pallas is reserved for patterns where manual DMA pipelining
actually pays (block-contiguous streaming).

Run: python bench/pallas_probe.py [n_probes_log2] [rows_log2]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 1024  # SMEM-blocked s32 operands must tile to 1024
NSLOT = 16


def pallas_gather_tiles(table_tiles: jax.Array, idx: jax.Array) -> jax.Array:
    """Per-probe DMA gather. HBM slices must be 128-lane aligned, so the
    table is pre-shaped [n_tiles, 128] (64 8-byte rows per tile) and each
    probe DMAs the whole 512-byte tile its row lives in; the 2 useful
    lanes are extracted by the caller. This measures DMA *issue rate* —
    the quantity that decides whether hand-rolled gathers can beat XLA's."""
    n = idx.shape[0]
    assert n % CHUNK == 0

    def kern(idx_ref, table_ref, out_ref, scratch, sems):
        def start(j):
            slot = j % NSLOT
            pltpu.make_async_copy(
                table_ref.at[pl.ds(idx_ref[j] >> 6, 1), :],
                scratch.at[slot],
                sems.at[slot],
            ).start()

        for j0 in range(NSLOT):
            start(j0)

        def body(j, _):
            slot = j % NSLOT
            pltpu.make_async_copy(
                table_ref.at[pl.ds(idx_ref[j] >> 6, 1), :],
                scratch.at[slot],
                sems.at[slot],
            ).wait()
            out_ref[pl.ds(j, 1), :] = scratch[slot]

            @pl.when(j + NSLOT < CHUNK)
            def _():
                start(j + NSLOT)

            return 0

        jax.lax.fori_loop(0, CHUNK, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n // CHUNK,),
        in_specs=[
            pl.BlockSpec(
                (CHUNK,), lambda c: (c,), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (CHUNK, 128), lambda c: (c, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((NSLOT, 1, 128), jnp.uint32),
            pltpu.SemaphoreType.DMA((NSLOT,)),
        ],
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, 128), jnp.uint32),
        grid_spec=grid_spec,
    )(idx, table_tiles)


def main():
    n_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    rows_log2 = int(sys.argv[2]) if len(sys.argv) > 2 else 27
    N = 1 << n_log2
    rows = 1 << rows_log2
    rng = np.random.default_rng(0)
    table_host = rng.integers(
        0, 1 << 32, size=(rows, 2), dtype=np.uint64
    ).astype(np.uint32)
    table = jax.device_put(table_host)
    table_tiles = jax.device_put(table_host.reshape(rows // 64, 128))
    idx_host = rng.integers(0, rows, size=N, dtype=np.int64).astype(np.int32)
    idx = jax.device_put(idx_host)
    np.asarray(jax.jit(lambda x: x.sum())(idx))  # session warm
    print("session up", flush=True)

    ref_fn = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    pal_fn = jax.jit(pallas_gather_tiles)

    # correctness on a small prefix (full fetch over a tunnel is slow)
    nv = min(N, CHUNK * 8)
    idx_v = idx_host[:nv]
    ref = np.asarray(ref_fn(table, jax.device_put(idx_v)))
    tiles = np.asarray(pal_fn(table_tiles, jax.device_put(idx_v)))
    within = (idx_v & 63) * 2
    got = np.stack(
        [tiles[np.arange(nv), within], tiles[np.arange(nv), within + 1]],
        axis=1,
    )
    np.testing.assert_array_equal(got, ref)
    print("pallas gather matches jnp.take", flush=True)

    for name, fn, args in (
        ("jnp.take", ref_fn, (table, idx)),
        ("pallas DMA", pal_fn, (table_tiles, idx)),
    ):
        ts = []
        for _ in range(5):
            t0 = time.time()
            jax.device_get(fn(*args).sum())
            ts.append(time.time() - t0)
        dt = min(ts)
        print(
            f"{name}: {dt*1000:8.1f} ms  {N/dt/1e6:8.1f} M rows/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
