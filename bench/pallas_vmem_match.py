"""Experiment: beat XLA's bucket gather by keeping the 16 MB entry16
hashed table RESIDENT IN VMEM inside a Pallas kernel and issuing one
scalar-addressed (1,128) vector load per probe.

Result (v5e, 2026-08-18, 5.77M probes = one production batch, bit-exact
outputs):
  xla gather+match     60.1 ms   95.9 M probes/s
  pallas vmem         285.6 ms   20.2 M probes/s   (4.75x SLOWER)
Each dynamic-sublane load costs ~50 ns — Mosaic has no cheap
scalar-addressed vector load from a large VMEM ref on this generation.
Together with the per-probe-DMA loss (bench/pallas_probe.py, 3-4x) this
closes the hand-rolled-gather question from both directions: DMA issue and
VMEM dynamic indexing both lose to XLA's gather engine, which therefore IS
the hardware floor for the probe front end.

Motivation (docs/PERF.md): the production kernel's trace shows XLA already
stages the u32[2^19, 8] table in on-chip memory (S(1)) yet the gather still
runs at ~8.9 ns/row — the floor is gather ISSUE rate, not bandwidth. A
hand-rolled loop does strictly less work per probe: one SMEM index read,
one VMEM vector load, and the 8-slot match folded into lane ops on the
8x128 VPU tile.

Layout trick: VMEM pads the minor dim to 128 lanes, so a [2^lgB, 8] table
would waste 16x resident. Reshaped to [2^lgB/16, 128] (16 buckets per
512-byte row), a probe loads row bucket>>4 and selects its bucket purely in
the COMPARE: cmp = (meta & 0x3FFF) | (lane>>3)<<14 against an 18-bit
per-probe want = rest | (bucket & 15)<<14. Invalid probes carry
want = 0xFFFFFFFF (no 18-bit value matches).

Run:   python bench/pallas_vmem_match.py            (TPU timing A/B)
       python bench/pallas_vmem_match.py --interpret (CPU correctness)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

INTERPRET = "--interpret" in sys.argv
if INTERPRET:
    jax.config.update("jax_platforms", "cpu")

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 2048  # probes per grid step (SMEM s32 blocks tile to 1024)
UNROLL = 8  # probes per loop body = one (8,128) VPU tile


def make_pallas_match(n_rows128: int, n: int):
    """pallas_call computing (tagv|payv<<32-style packed [n,2] u32) from
    rows[n] (bucket>>4), want[n/8,8,1] (rest|group<<14 or miss sentinel),
    table128[n_rows128, 128]."""
    assert n % CHUNK == 0

    def kern(rows_ref, want_ref, table_ref, out_ref):
        # Mosaic can't reduce unsigned ints: all reduced quantities (meta16,
        # pay16, tag, slot) fit int32, so the match runs in i32 throughout.
        lane = jax.lax.broadcasted_iota(jnp.int32, (UNROLL, 128), 1)
        glane = (lane >> 3) << 14  # bucket-within-row id in bits 14..17
        slot = lane & 7  # slot within bucket

        def body(j, _):
            base = j * UNROLL
            tile = jnp.concatenate(
                [
                    table_ref[pl.ds(rows_ref[base + u], 1), :]
                    for u in range(UNROLL)
                ],
                axis=0,
            )  # (UNROLL, 128) u32 — one bucket row per probe
            meta = (tile >> 16).astype(jnp.int32)
            pay = (tile & jnp.uint32(0xFFFF)).astype(jnp.int32)
            tag = meta >> 14
            want = want_ref[j].astype(jnp.int32)  # miss sentinel -> -1
            m = (((meta & 0x3FFF) | glane) == want) & (tag != 0)
            fs = jnp.min(jnp.where(m, slot, 8), axis=1, keepdims=True)
            p0 = jnp.sum(
                jnp.where(m & (slot == fs), pay, 0), axis=1, keepdims=True
            )
            p1 = jnp.sum(
                jnp.where(m & (slot > fs), pay, 0), axis=1, keepdims=True
            )
            tv = jnp.max(jnp.where(m, tag, 0), axis=1, keepdims=True)
            out_ref[pl.ds(base, UNROLL), :] = jnp.concatenate(
                [tv, p0 | (p1 << 16)], axis=1
            ).astype(jnp.uint32)
            return 0

        jax.lax.fori_loop(0, CHUNK // UNROLL, body, 0)

    grid_spec = pl.GridSpec(
        grid=(n // CHUNK,),
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda c: (c,), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (CHUNK // UNROLL, UNROLL, 1),
                lambda c: (c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole table resident
        ],
        out_specs=pl.BlockSpec(
            (CHUNK, 2), lambda c: (c, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, 2), jnp.uint32),
        grid_spec=grid_spec,
        interpret=INTERPRET,
    )


def xla_match(table, bucket, rest, valid):
    """The production entry16 gather+match (classify/hashed.py:321-342)."""
    row = jnp.take(table, bucket, axis=0)  # [n, 8]
    meta_l = row >> 16
    pay_l = row & jnp.uint32(0xFFFF)
    lane_tag = meta_l >> 14
    m = (
        ((meta_l & jnp.uint32(0x3FFF)) == rest[:, None])
        & (lane_tag != 0)
        & valid[:, None]
    )
    iota8 = jnp.arange(8, dtype=jnp.uint32)
    fs = jnp.min(jnp.where(m, iota8, jnp.uint32(8)), axis=-1, keepdims=True)
    p0 = jnp.sum(jnp.where(m & (iota8 == fs), pay_l, 0), axis=-1)
    p1 = jnp.sum(jnp.where(m & (iota8 > fs), pay_l, 0), axis=-1)
    tagv = jnp.max(jnp.where(m, lane_tag, 0), axis=-1)
    return jnp.stack([tagv, p0 | (p1 << 16)], axis=1)


def build_inputs(n, lgB, seed=0):
    rng = np.random.default_rng(seed)
    n_buckets = 1 << lgB
    table = rng.integers(0, 1 << 32, size=(n_buckets, 8), dtype=np.uint64)
    table = table.astype(np.uint32)
    bucket = rng.integers(0, n_buckets, size=n, dtype=np.int64).astype(
        np.int32
    )
    rest = rng.integers(0, 1 << 14, size=n, dtype=np.int64).astype(np.uint32)
    valid = rng.random(n) < 0.97
    # plant guaranteed hits for ~half the probes (realistic hit rate), and
    # double-width (degree-2) entries for a quarter of those
    hit = np.flatnonzero(rng.random(n) < 0.5)
    s = rng.integers(0, 7, size=hit.size)
    t = rng.integers(1, 4, size=hit.size).astype(np.uint32)
    meta16 = ((t << 14) | rest[hit]).astype(np.uint32) << 16
    table[bucket[hit], s] = meta16 | rng.integers(
        0, 1 << 16, size=hit.size
    ).astype(np.uint32)
    dbl = rng.random(hit.size) < 0.25
    table[bucket[hit[dbl]], s[dbl] + 1] = meta16[dbl] | rng.integers(
        0, 1 << 16, size=int(dbl.sum())
    ).astype(np.uint32)
    return table, bucket, rest, valid


def main():
    lgB = 19  # 16 MB table: the production single-end geometry
    n = CHUNK * (8 if INTERPRET else 2816)  # prod batch = 65536*88 probes
    table, bucket, rest, valid = build_inputs(n, lgB)
    rows = (bucket >> 4).astype(np.int32)
    want = np.where(
        valid, rest | ((bucket.astype(np.uint32) & 15) << 14), 0xFFFFFFFF
    ).astype(np.uint32)
    table128 = table.reshape(-1, 128)

    d = jax.device_put
    args_x = (d(table), d(bucket), d(rest), d(valid))
    args_p = (d(rows), d(want.reshape(-1, UNROLL, 1)), d(table128))

    pal = make_pallas_match(table128.shape[0], n)
    fx = jax.jit(xla_match)
    fp = jax.jit(pal)

    ref = np.asarray(fx(*args_x))
    got = np.asarray(fp(*args_p))
    np.testing.assert_array_equal(got, ref)
    print(
        f"pallas VMEM match == XLA gather+match on {n} probes "
        f"({(ref[:, 0] != 0).mean():.2f} hit rate)",
        flush=True,
    )
    if INTERPRET:
        return

    for name, fn, args in (("xla gather+match", fx, args_x), ("pallas vmem", fp, args_p)):
        ts = []
        for _ in range(6):
            t0 = time.time()
            jax.device_get(fn(*args).sum())
            ts.append(time.time() - t0)
        dt = min(ts)
        print(
            f"{name}: {dt*1000:8.1f} ms  {n/dt/1e6:8.1f} M probes/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
