"""Sharded-Bloom-filter classification: index larger than one chip's HBM.

The reference has no analogue (its index is a single shared-memory
structure, bloomfilter.h:36-203); this is the TPU-native scale-out design
from SURVEY.md §5/§7: partition the Bloom address space across the mesh,
route each probe to the owner chip over ICI with `all_to_all`, and return
each probe's (degree, gene-list) row to the read's home chip, where the
coverage/winner reduction runs exactly as in the replicated path.

Inside one `shard_map` over mesh axis "dp", each device holds
  - a batch shard  codes[B/n, L]
  - an index shard: the bf_rank words and gene rows of its contiguous
    1/n-th of the Bloom address space (ranks are LOCAL to the shard, so
    each shard is a complete mini-index of its range)
and one step performs:
  hash -> owner = word_idx // words_per_shard
  bucket-compact probes by owner (sort + positional pack, fixed capacity)
  all_to_all probe buckets -> owners probe locally (two gathers)
  all_to_all replies back -> scatter into [B/n, L, D+1] -> finish_kernel

Bucket capacity defaults to an adaptive binomial-tail bound (mean + 8
sigma): XXH64 spreads DISTINCT k-mers uniformly, so for i.i.d. probes the
per-owner count is Binomial(P, 1/n) and 8 sigma of headroom makes overflow
astronomically unlikely while sending ~half the bytes of the old blanket
2x slack. Duplicate probes (PCR-duplicated reads, low-complexity k-mers)
are NOT independent — in the worst case every probe lands on one owner,
which no fixed slack covers — so overflow is recoverable, not fatal:
overflowed probes are dropped + counted per batch, and the pipeline calls
`reprobe()` to re-run that batch with a geometrically larger cap (the
grown cap sticks for subsequent batches).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from typing import NamedTuple

from shark_tpu.classify.step import (
    MAX_SIZE_BITS,
    StaticMeta,
    emit_threshold_table,
    finish_kernel,
    hash_positions,
    probe_local,
)
from shark_tpu.index.structure import SharkIndex
from shark_tpu.parallel.mesh import make_mesh

MISS_SENTINEL = jnp.uint32(0xFFFFFFFF)


class ShardIndexArrays(NamedTuple):
    """Per-shard device arrays (leading shard axis): the sharded path keeps
    FULL-width gene rows because they ride the all_to_all reply."""

    bf_rank: jnp.ndarray  # uint32[n, wps, 2]
    gene_mat: jnp.ndarray  # uint16[n, max_rows, D+1]


def shard_index(index: SharkIndex, n: int):
    """Split a host SharkIndex into n address-range shards of per-shard
    arrays, stacked on a leading shard axis for shard_map consumption."""
    n_words = index.bf_words.size
    if n_words % n != 0:
        raise ValueError(f"{n_words} bloom words not divisible by {n} shards")
    wps = n_words // n
    if wps > 0x7FFFFFFF:
        # int32 local gather addressing; an 8 GiB bit-vector per shard is
        # past per-chip HBM anyway — add devices instead
        raise ValueError(
            f"{wps} bloom words per shard exceeds int32 addressing; "
            "use more devices"
        )
    deg_all = np.diff(index.offsets).astype(np.int64)
    # capped-degree rows with ONE geometry across shards; the extension
    # table does not ride the all_to_all — reads hitting deg>D rows carry
    # the PACK_OVF flag and recompute exactly on the host (rare by
    # construction; see classify/step.py GENE_INLINE_CAP)
    from shark_tpu.classify.step import build_gene_rows, index_geometry

    geometry = index_geometry(index)
    D = geometry[0]
    # per-shard set-bit counts via the word rank at shard boundaries
    bf_ranks = np.empty((n, wps, 2), dtype=np.uint32)
    gene_mats = []
    max_rows = 1
    bounds = np.empty(n + 1, dtype=np.int64)
    bounds[0] = 0
    for s in range(n):
        lo_word = s * wps
        hi_word = (s + 1) * wps
        base = int(index.word_rank[lo_word])
        end = (
            int(index.word_rank[hi_word])
            if hi_word < n_words
            else index.n_set_bits
        )
        bounds[s + 1] = end
        bf_ranks[s, :, 0] = index.bf_words[lo_word:hi_word]
        bf_ranks[s, :, 1] = index.word_rank[lo_word:hi_word] - base
        max_rows = max(max_rows, end - base)
    for s in range(n):
        base, end = int(bounds[s]), int(bounds[s + 1])
        lo_assoc = int(index.offsets[base])
        hi_assoc = int(index.offsets[end])
        gm, _ = build_gene_rows(
            deg_all[base:end],
            np.asarray(index.gene_ids[lo_assoc:hi_assoc]),
            ext=False,
            geometry=geometry,
        )
        if gm.shape[0] < max_rows:
            gm = np.vstack(
                [gm, np.zeros((max_rows - gm.shape[0], D + 1), np.uint16)]
            )
        gene_mats.append(gm)
    return bf_ranks, np.stack(gene_mats), wps, D


def _route_probe_return(
    dix_shard: ShardIndexArrays,
    word_idx: jnp.ndarray,  # int32[b, L] global word indices
    bit_off: jnp.ndarray,  # uint32[b, L]
    win_valid: jnp.ndarray,  # bool[b, L]
    *,
    n: int,
    wps: int,
    cap: int,
    D: int,
    axis: str,
):
    """The all_to_all hash-routing round. Returns (gm [b,L,D+1], hit [b,L],
    overflow count)."""
    b, L = word_idx.shape
    Pn = b * L
    flat_word = word_idx.reshape(Pn)
    flat_bit = bit_off.reshape(Pn).astype(jnp.uint32)
    flat_valid = win_valid.reshape(Pn)

    owner = (flat_word // wps).astype(jnp.int32)
    # sort probes by owner, keeping original position
    sort_key = owner.astype(jnp.uint32) * jnp.uint32(Pn) + jax.lax.iota(
        jnp.uint32, Pn
    )
    sort_key = jnp.where(flat_valid, sort_key, jnp.uint32(n) * jnp.uint32(Pn))
    skey = jnp.sort(sort_key)
    s_owner = (skey // Pn).astype(jnp.int32)
    s_pos = (skey % Pn).astype(jnp.int32)
    s_valid = s_owner < n
    # within-owner slot: running index minus owner's first index
    idx = jax.lax.iota(jnp.int32, Pn)
    prev_owner = jnp.roll(s_owner, 1).at[0].set(-1)
    seg_start = s_valid & (s_owner != prev_owner)
    base = jax.lax.cummax(jnp.where(seg_start, idx, 0), axis=0)
    slot = idx - base
    ok = s_valid & (slot < cap)
    overflow = jnp.sum((s_valid & (slot >= cap)).astype(jnp.int32))

    # pack (local word, bit) per owner bucket in TWO uint32 lanes — a
    # single (word<<5)|bit lane would collide with the sentinel or wrap
    # once a shard covers >= 2^27 bloom words (wps*32 >= 2^32), silently
    # corrupting output in exactly the bigger-than-HBM regime this mode
    # targets. The word lane's sentinel is safe: local words are < wps,
    # and shard_index rejects wps >= 2^32 - 1.
    g_word = jnp.take(flat_word, s_pos)
    g_bit = jnp.take(flat_bit, s_pos)
    g_valid = jnp.take(flat_valid, s_pos)
    local_word = (g_word - s_owner * wps).astype(jnp.uint32)
    send = jnp.full((n, cap, 2), MISS_SENTINEL, dtype=jnp.uint32)
    payload = jnp.stack(
        [
            jnp.where(ok & g_valid, local_word, MISS_SENTINEL),
            g_bit,
        ],
        axis=-1,
    )
    send = send.at[s_owner, slot].set(payload, mode="drop")

    # route to owners
    recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0)
    recv = recv.reshape(n, cap, 2)

    # owner-side probe of the local shard
    r_valid = recv[..., 0] != MISS_SENTINEL
    r_word = jnp.where(r_valid, recv[..., 0], 0).astype(jnp.int32)
    r_bit = recv[..., 1] & 31  # keep shift amounts defined on empty slots
    gm_r, hit_r = probe_local(
        dix_shard.bf_rank, dix_shard.gene_mat, r_word, r_bit, r_valid
    )
    reply = jnp.where(
        hit_r[..., None], gm_r, jnp.uint16(0)
    )  # [n, cap, D+1]

    # route replies back
    back = jax.lax.all_to_all(reply, axis, split_axis=0, concat_axis=0)
    back = back.reshape(n, cap, D + 1)

    # scatter replies to original probe positions
    gm_flat = jnp.zeros((Pn, D + 1), dtype=jnp.uint16)
    vals = back[s_owner, slot]  # [Pn, D+1] (garbage where !ok)
    gm_flat = gm_flat.at[jnp.where(ok, s_pos, Pn)].set(
        jnp.where(ok[:, None], vals, 0), mode="drop"
    )
    gm = gm_flat.reshape(b, L, D + 1)
    hit = gm[..., 0] > 0
    return gm, hit, overflow


class ShardedBFClassifier:
    """Classify against an index sharded by Bloom address range across the
    mesh. The batch is data-parallel on the same axis."""

    def __init__(
        self,
        index: SharkIndex,
        max_winners: int = 16,
        c: float = 0.6,
        mesh: Mesh | None = None,
        n_devices: int = 0,
        slack: float | None = None,
    ):
        self.index = index
        self.max_winners = max_winners
        self.c = c
        self.mesh = mesh or make_mesh(n_devices)
        self.axis = self.mesh.axis_names[0]
        # sharding, all_to_all, and the shard count all live on axis 0; a
        # second non-trivial axis would split the shards 2-per-group and
        # silently answer probes from the wrong half — reject it
        for a in self.mesh.axis_names[1:]:
            if self.mesh.shape[a] != 1:
                raise ValueError(
                    "sharded-BF mode requires a single-axis mesh (axis "
                    f"{a!r} has size {self.mesh.shape[a]})"
                )
        self.n = int(self.mesh.shape[self.axis])
        # the probe front end packs the GLOBAL bloom word index into int32
        # (hash_positions), so the total index size is capped regardless
        # of device count; fail here with an honest message instead of a
        # circular "use the sharded-BF mode" from the first batch
        if index.size_bits > MAX_SIZE_BITS:
            raise ValueError(
                f"Bloom filter ({index.size_bits} bits) exceeds the probe "
                f"front end's int32 word addressing ({MAX_SIZE_BITS} bits) "
                "— the sharded-BF mode shards HBM footprint, not the "
                "address space"
            )
        self.slack = slack  # None = adaptive binomial-tail cap
        self.cap_mult = 1.0  # grown by reprobe() after an overflow
        bf_ranks, gene_mats, self.wps, self.D = shard_index(index, self.n)
        shard0 = NamedSharding(self.mesh, P(self.axis))
        self.dix = ShardIndexArrays(
            bf_rank=jax.device_put(bf_ranks, shard0),
            gene_mat=jax.device_put(gene_mats, shard0),
        )
        self._fns = {}
        self._thresh = {}

    def _probe_cap(self, b: int, L: int) -> int:
        """Per-owner routing bucket capacity for a per-device batch of b
        reads of padded length L. With `slack` set: the explicit
        `slack * P/n`. Default (adaptive): Binomial(P, 1/n) mean + 8 sigma
        + 64 — overflow odds ~1e-15/batch for i.i.d. XXH64 probes, and any
        duplicate-probe pathology is recovered by reprobe()'s geometric
        growth. Never exceeds b*L (all probes on one owner)."""
        total = b * L
        mean = total / self.n
        if self.slack is not None:
            cap = self.slack * mean
        else:
            cap = mean + 8.0 * mean**0.5 + 64.0
        cap = int(np.ceil(cap * self.cap_mult))
        return max(8, min(cap, total))

    def grow_cap(self) -> None:
        """Double every subsequent compile's routing cap (and drop the jit
        cache so the next call picks it up)."""
        self.cap_mult *= 2.0
        self._fns.clear()

    def reprobe(self, codes, attempts: int = 0):
        """Spill-and-retry after a routing overflow: re-run ONE batch with
        geometrically larger caps until its probes fit. `codes` is either
        a [B, L] uint8 code array or a (packed, vmask) planar pair. The
        grown cap sticks, so a workload that overflows once doesn't pay a
        recompile per batch. The default attempt count is enough doublings
        to saturate the cap at all-probes-on-one-owner, where overflow is
        impossible — so the returned result is overflow-free unless the
        caller passed a smaller `attempts`."""
        if isinstance(codes, tuple):
            B, L = codes[0].shape[0], codes[0].shape[1] * 4
        else:
            B, L = codes.shape
        if attempts <= 0:
            total = (B // self.n) * L
            cap0 = self._probe_cap(B // self.n, L)
            attempts = max(1, int(np.ceil(np.log2(total / cap0))) + 1)
        result = None
        for retry in range(attempts + 1):
            # first pass retries at the CURRENT cap: with ~8 batches in
            # flight, one overflow burst makes every queued batch call
            # reprobe(), and growing unconditionally would compound the
            # cap 2^8x (each doubling = a jit cache flush + a 10-15s
            # remote recompile) when the first growth already sufficed
            if retry > 0:
                self.grow_cap()
            result = (
                self.call_packed(*codes)
                if isinstance(codes, tuple)
                else self(codes)
            )
            if int(np.asarray(result[4]).sum()) == 0:
                break
        return result

    def _fn(self, B: int, L: int, packed: bool = False):
        key = (B, L, packed, self.cap_mult)
        fn = self._fns.get(key)
        if fn is not None:
            return fn
        meta = StaticMeta.for_index(self.index, L)
        n, wps, D, axis = self.n, self.wps, self.D, self.axis
        b = B // n
        # routing sort keys are owner*Pn + slot in uint32 (sentinel n*Pn)
        pn = b * max(L - meta.k + 1, 1)
        if (n + 1) * pn >= (1 << 32):
            raise ValueError(
                f"per-device probe count {pn} x {n} shards exceeds 32-bit "
                "routing keys; reduce the per-device batch"
            )
        cap = self._probe_cap(b, L)
        max_winners = self.max_winners

        def step(dix_shard, thresh, *data):
            # shapes inside shard_map: codes [b, L]; dix_shard has the
            # leading shard axis reduced to 1 -> squeeze it
            dix_local = ShardIndexArrays(
                bf_rank=dix_shard.bf_rank[0], gene_mat=dix_shard.gene_mat[0]
            )
            if packed:
                from shark_tpu.classify.step import unpack_codes

                codes = unpack_codes(*data)
            else:
                (codes,) = data
            word_idx, bit_off, win_valid = hash_positions(codes, meta)
            gm, hit, ovf = _route_probe_return(
                dix_local,
                word_idx,
                bit_off,
                win_valid,
                n=n,
                wps=wps,
                cap=cap,
                D=D,
                axis=axis,
            )
            out = finish_kernel(
                gm, hit, codes, thresh, meta=meta, max_winners=max_winners
            )
            return out + (ovf[None],)

        mesh = self.mesh
        data_specs = (P(self.axis), P(self.axis)) if packed else (P(self.axis),)
        fn = jax.jit(
            jax.shard_map(
                step,
                mesh=mesh,
                in_specs=(
                    ShardIndexArrays(
                        bf_rank=P(self.axis), gene_mat=P(self.axis)
                    ),
                    P(),
                )
                + data_specs,
                out_specs=(
                    P(self.axis),
                    P(self.axis),
                    P(self.axis),
                    P(self.axis),
                    P(self.axis),
                ),
                check_vma=False,
            )
        )
        self._fns[key] = fn
        if L not in self._thresh:
            self._thresh[L] = jax.device_put(
                emit_threshold_table(self.c, L), NamedSharding(self.mesh, P())
            )
        return fn

    def __call__(self, codes: np.ndarray):
        B, L = codes.shape
        if B % self.n != 0:
            raise ValueError(f"batch {B} not divisible by {self.n} devices")
        fn = self._fn(B, L)
        return fn(self.dix, self._thresh[L], codes)

    def call_packed(self, packed: np.ndarray, vmask: np.ndarray):
        B = packed.shape[0]
        L = packed.shape[1] * 4
        if B % self.n != 0:
            raise ValueError(f"batch {B} not divisible by {self.n} devices")
        fn = self._fn(B, L, packed=True)
        return fn(self.dix, self._thresh[L], packed, vmask)
