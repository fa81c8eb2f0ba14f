"""The device classify step: one jit'd function from base codes to verdicts.

Per batch of padded reads [B, L] it computes, entirely on device:

  1. rolling canonical k-mers of every valid window (uint32 limb pairs);
  2. bit-exact XXH64 and reduction modulo the Bloom size;
  3. gather probes into the Bloom bit-vector + per-word rank;
  4. CSR gathers of each hit k-mer's gene list (max-degree static unroll);
  5. a sort-based segmented coverage reduction.

Step 5 is the key TPU-ization. The reference accumulates, per (read, gene),
cov += min(k, pos - last) sequentially over k-mer positions
(ReadAnalyzer.hpp:56-86). That recurrence equals the size of the union of
k-length intervals ending at the gene's hit positions, which is order-free:
sort the (gene, pos) hit pairs of each read, then within each equal-gene
segment the contribution of a hit is min(k, pos_i - pos_{i-1}) and the
segment head contributes k. (Head equivalence: the reference adds
min(k, e+1) for a first probe and min(k, e - 0) for a first rolling hit;
both are k because any window end e >= k-1.) Segment sums come from cumsums
and a cummax-carried segment base; winners are the argmax segments by
lexicographic (cov, hits) with ties kept, exactly as the reference's
std::map scan (ReadAnalyzer.hpp:90-102).

The cov >= c*len emission threshold is evaluated ON DEVICE against a
host-precomputed integer table thresh[len] = min{cov : (float64)cov >=
c * (float64)len}, which reproduces the reference's double-precision
compare (ReadAnalyzer.hpp:104) bit-exactly without float64 on the TPU.

Results return to the host as ONE packed int32 per read (winner gene id,
winner count, emit flag); the full winner matrix stays device-resident and
is fetched only for the rare multi-winner batches. This keeps the
device->host path — the expensive direction on tunneled TPU setups — to
4 bytes per read.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from shark_tpu.index.structure import SharkIndex
from shark_tpu.ops import u64
from shark_tpu.ops.kmers import INVALID, canonical_kmers_jax
from shark_tpu.ops.xxh64 import xxh64_u64

# Largest supported Bloom filter per device: word indices must fit int32.
MAX_SIZE_BITS = 1 << 36  # 8 GiB of bit-vector


# Gene-row capping (transcriptome scale). Rows are (deg, slot_0..slot_{D-1})
# uint16; a row whose true degree exceeds D keeps its first D-2 genes
# inline and stores a 32-bit extension-row index in its last two slots.
# Without a cap, one hot k-mer shared by dozens of genes inflates EVERY row
# to the global max degree — 64x table blowup at n_set ~ 10^8 (tens of GB,
# past HBM). D is the smallest power of two >= max degree whose table fits
# the byte budget; the cap + extension path engages ONLY when the budget
# forces it. (An earlier histogram rule capped D when few SET BITS exceeded
# it, but reads concentrate on exactly those rows — a 50k-gene family
# workload sent ~1% of reads to the per-read host-recompute escape and ran
# 40x slow. Rare-in-the-index is not rare-in-the-sample.)
GENE_D_CHOICES = (8, 16, 32, 64)
GENE_MAT_BUDGET = 4 << 30  # primary row-table byte budget
EXT_MAX_W = 64  # extension-row width cap; reads past it recompute on host
EXT_CAP2 = 16  # max extension-escaping windows per read before host redo

# Batch-level compaction of deg>=3 row windows (finish_from_tags): when the
# compacted rows3 geometry is at least this wide, batches where no read has
# more than ROW_CAP row windows route them through ROW_CAP compacted
# columns instead of D3 full-width key lanes (sort width 2*Ls + D3*ROW_CAP
# vs D3*Ls); heavier batches take the full-width branch of the same cond.
ROW_COMPACT_MIN_D = 8
ROW_CAP = 16

# Impure-read sub-batch widths of the group fast path: up to B // FIX_DIV
# reads re-score through the recursive heavy finish (tier 2: B //
# FIX_DIV2); batches beyond both fall back to the full heavy branch
# (exact at every tier). Homolog measurements (bench/homolog_split.py +
# bench/ab_fixcap.py, one v5e session): ~0.35% of reads are impure
# (~230/batch at B=65536), and the device A/B put cap=1024 at 115.8
# ms/batch vs 124.1 at the old single-tier 4096 — while cap=256
# REGRESSED to 202.9 ms (narrow sub-batch sorts schedule badly). The
# txome workload's impure counts land BETWEEN the tiers (BENCH r4 caught
# the single-tier 1024 cap dropping txome to the full heavy branch), so
# tier 2 keeps 4096.
FIX_DIV = 64
FIX_DIV2 = 16

# Group sub-batch recursion: skip the row-cond machinery (exact either
# way); trace-time knob so bench/ab_subfix.py can A/B it in one process.
_SUBFIX_FORCE_FULL = True

# Probe-result tags, shared by every probe front-end (the hashed bucket
# table and the classic rank->payload gather produce the same
# (tag, payload) stream; one back-end turns it into verdicts):
#   0 = miss; 1 = one gene (payload g); 2 = two genes (payload g0|g1<<16);
#   3 = degree>=3, payload = row index into the COMPACTED deg>=3 row table
TAG_D1 = 1
TAG_D2 = 2
TAG_ROW = 3


@dataclass(frozen=True)
class StaticMeta:
    """Compile-time parameters of the classify computation."""

    k: int
    size_bits: int
    n_genes: int
    degree: int  # FULL row geometry: gene slots per all-degrees row
    pos_bits: int  # bits reserved for the position in a sort key
    ext_w: int = 0  # extension-row width (0 = no rows overflow the cap)
    degree3: int = 1  # COMPACTED deg>=3 row geometry (rows3 tables)
    ext3_w: int = 0
    # > 0 when TAG_ROW payloads carry (gid << rows_bits) | rows3_index,
    # enabling the tie-heavy group fast path (group_info)
    rows_bits: int = 0

    @classmethod
    def for_index(
        cls, index: SharkIndex, max_len: int, allow_wide: bool = False
    ) -> "StaticMeta":
        """`allow_wide` is set by the sharded-BF path, whose (hi, lo) limb
        router (parallel.sharded_bf.shard_owner_local) lifts the int32
        front end's 2^36-bit ceiling; single-chip kernels keep the
        guard."""
        if index.size_bits > MAX_SIZE_BITS and not allow_wide:
            raise ValueError(
                "Bloom filter too large for single-device int32 addressing; "
                "use the sharded-BF mode"
            )
        pos_bits = max(1, int(np.ceil(np.log2(max(2, max_len)))))
        # +1: the group fast path scores deduped gene sets as one pseudo
        # gene id == n_genes, which must also fit the 31-bit sort keys
        if ((index.n_genes + 1) << pos_bits) >= (1 << 31):
            raise ValueError("n_genes * max_len exceeds 31-bit sort keys")
        degree, ext_w = index_geometry(index)
        degree3, ext3_w = index_geometry3(index)
        gi = group_info(index)
        return cls(
            k=index.k,
            size_bits=index.size_bits,
            n_genes=index.n_genes,
            degree=degree,
            pos_bits=pos_bits,
            ext_w=ext_w,
            degree3=degree3,
            ext3_w=ext3_w,
            rows_bits=gi[2] if gi is not None else 0,
        )


def row_geometry(deg: np.ndarray) -> Tuple[int, int]:
    """(inline gene slots D, extension width) from a degree histogram;
    powers of two to bound recompilation.

    D covers all but a <= 1e-4 TAIL of rows; tail rows keep D-2 genes
    inline and spill to the extension table. The tail exists in real
    indexes because two k-mers colliding on one Bloom position MERGE
    their gene lists (reference semantics, bloomfilter.h:61-75): an
    8-member family core colliding with anything becomes a deg 9+ row,
    and sizing D = pow2(max_deg) for those few rows doubles every row
    AND the finish sort width. The tail threshold is row-count-based
    (not sample-based) but safe: tail windows resolve through the exact
    device ext path (EXT_CAP2 per read), not host redo, so even a
    sample concentrated on tail rows only pays the small ext gather.
    Degrees common in the index (true families) always sit below the
    1e-4 boundary and stay inline."""
    return _row_geometry_impl(deg, tail_rule=True)


def row_geometry_full(deg: np.ndarray) -> Tuple[int, int]:
    """Geometry for paths that cannot reach an extension table at query
    time (the sharded-BF reply rows): D = pow2(max degree) up to the
    inline cap, ext only when a cap forces it (those rows
    host-recompute)."""
    return _row_geometry_impl(deg, tail_rule=False)


def _row_geometry_impl(deg: np.ndarray, tail_rule: bool) -> Tuple[int, int]:
    n_set = deg.size
    if n_set == 0:
        return 1, 0
    max_deg = int(deg.max())
    # hard inline cap: keys_from_gm unrolls D full [B, Ls] key lanes and a
    # ~D*Ls-wide finish sort, so D past GENE_D_CHOICES' ceiling is a
    # compile/HBM blowup (a 1000-member family would otherwise demand
    # D=1024). Degrees past the cap route through the extension table —
    # or, beyond ext_w/EXT_CAP2 (and always on the no-ext sharded path),
    # the exact host-recompute escape.
    D_full = min(
        1 << int(np.ceil(np.log2(max(1, max_deg)))), GENE_D_CHOICES[-1]
    )
    D = D_full
    if tail_rule:
        # floor of 32 rows: a real shared region (a ~300bp family core is
        # ~284 rows) always exceeds it and stays inline; isolated
        # collision-merged rows (a handful per index) fall under it and
        # take the ext path. A sub-32-row true repeat would ext-escape
        # too — exact either way, worst case a few host redos per batch.
        tail_budget = max(32, n_set // 10000)
        for cand in (4, 8, 16, 32, 64):
            if cand >= D_full:
                break
            if int(np.count_nonzero(deg > cand)) <= tail_budget:
                D = cand
                break
    # byte budget on the row table (transcriptome scale)
    while D > GENE_D_CHOICES[0] and n_set * (D + 1) * 2 > GENE_MAT_BUDGET:
        D >>= 1
    if D >= max_deg:
        return D, 0
    resid = max_deg - (D - 2)
    ext_w = 1 << int(np.ceil(np.log2(max(1, resid))))
    return D, min(ext_w, EXT_MAX_W)


def index_geometry(index: SharkIndex) -> Tuple[int, int]:
    """Cached FULL row geometry of an index (all set bits, no-ext rule;
    used by the sharded-BF path whose routed rows cover every degree).
    The histogram scan costs a pass over offsets; every consumer must
    agree on one answer."""
    geom = index.__dict__.get("_row_geometry")
    if geom is None:
        geom = row_geometry_full(np.diff(index.offsets))
        index.__dict__["_row_geometry"] = geom
    return geom


class GeneGroups(NamedTuple):
    """Deduped gene-SETS of the deg>=3 rows, CSR layout: members of group
    g are flat[offsets[g]:offsets[g+1]] (ascending gene ids, as stored).
    The host expands group verdicts through this instead of fetching (or
    recomputing) per-member winner lists."""

    offsets: np.ndarray  # int64[n_gids + 1]
    flat: np.ndarray  # uint16[total]

    @property
    def n_gids(self) -> int:
        return self.offsets.size - 1


def group_info(index: SharkIndex):
    """(gid int64[n_deg3_rows], GeneGroups, rows_bits) for the tie-heavy
    fast path, or None when the index cannot carry group ids.

    Many deg>=3 rows share one gene SET (a family's shared core is ~L-k+1
    rows with identical member lists, reference semantics: every core
    k-mer maps to the whole family, bloomfilter.h:61-75). A read whose
    hits are all rows of ONE set ties across exactly that set, so the
    kernel can score the set once as a pseudo-gene and the host expands
    members from here — instead of D3 full-width key lanes per window
    (the measured 8x key redundancy of the homolog workload).

    The TAG_ROW payload then carries (gid << rows_bits) | rows3_index.
    Returns None when the split doesn't fit 32 bits (transcriptome-scale
    row counts), or gids/genes exceed the packed 16-bit verdict field."""
    cached = index.__dict__.get("_group_info", "unset")
    if cached != "unset":
        return cached
    info = _group_info_impl(index)
    index.__dict__["_group_info"] = info
    return info


def _group_info_impl(index: SharkIndex):
    deg = np.diff(index.offsets).astype(np.int64)
    d3rows = np.flatnonzero(deg >= 3)
    n3 = d3rows.size
    if n3 == 0 or index.n_genes >= (1 << 16):
        return None
    rows_bits = max(1, int(np.ceil(np.log2(max(n3, 2)))))
    gid_cap = min(1 << (32 - rows_bits), 1 << 16)
    off = index.offsets[:-1].astype(np.int64)
    gene_ids = np.asarray(index.gene_ids)
    gid = np.empty(n3, np.int64)
    uniq_sets = []
    next_gid = 0
    for d in np.unique(deg[d3rows]):
        sel = np.flatnonzero(deg[d3rows] == d)
        rows = d3rows[sel]
        mat = gene_ids[off[rows][:, None] + np.arange(int(d))[None, :]]
        uniq, inv = np.unique(mat, axis=0, return_inverse=True)
        gid[sel] = next_gid + inv
        next_gid += uniq.shape[0]
        uniq_sets.append(uniq)
        if next_gid > gid_cap:
            return None
    offsets = np.concatenate(
        [[0]]
        + [np.full(u.shape[0], u.shape[1], np.int64) for u in uniq_sets]
    ).cumsum()
    flat = np.concatenate([u.reshape(-1) for u in uniq_sets]).astype(
        np.uint16
    )
    return gid, GeneGroups(offsets=offsets, flat=flat), rows_bits


def rows3_payload(index: SharkIndex) -> np.ndarray:
    """uint32 TAG_ROW payloads, one per deg>=3 set bit in CSR rank order:
    the compacted rows3 index, with (gid << rows_bits) OR'd in when the
    index carries group ids (group_info) — both probe front-ends
    (build_pay and the hashed _entry_streams) must agree bit for bit."""
    deg = np.diff(index.offsets)
    n3 = int(np.count_nonzero(deg >= 3))
    ridx = np.arange(n3, dtype=np.uint32)
    gi = group_info(index)
    if gi is not None:
        gid, _, rows_bits = gi
        ridx |= gid.astype(np.uint32) << np.uint32(rows_bits)
    return ridx


def index_geometry3(index: SharkIndex) -> Tuple[int, int]:
    """Cached geometry of the COMPACTED deg>=3 row table (rows3). The
    single-chip kernels resolve deg<=2 probes inline from tag/payload
    words and gather wide rows only for deg>=3 k-mers, so the wide table
    holds just those rows — at transcriptome scale that is ~1% of set
    bits, which keeps the gather in the fast small-table regime
    (bench/txome_gather.py: 98M rows/s under ~64MB vs 47M at 2.3GB)."""
    geom = index.__dict__.get("_row_geometry3")
    if geom is None:
        deg = np.diff(index.offsets)
        geom = row_geometry(deg[deg >= 3])
        index.__dict__["_row_geometry3"] = geom
    return geom


def _mod_size(h: u64.U64, size_bits: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """hash % size -> (idx_hi, idx_lo) uint32, exploiting the size's form.

    The CLI sizes are multiples of 2**33 bits (argument_parser.hpp:133), so
    size = m * 2**32 and hash % size = (hi % m) * 2**32 + lo. Power-of-two
    sizes (tests, tuned deployments) reduce to a mask.
    """
    hi, lo = h
    if size_bits & (size_bits - 1) == 0:  # power of two
        if size_bits <= (1 << 32):
            mask = jnp.uint32(size_bits - 1 if size_bits < (1 << 32) else 0xFFFFFFFF)
            return jnp.zeros_like(hi), lo & mask
        himask = jnp.uint32((size_bits >> 32) - 1)
        return hi & himask, lo
    if size_bits % (1 << 32) == 0:
        m = jnp.uint32(size_bits >> 32)
        return hi % m, lo
    raise ValueError(
        "Bloom size must be a power of two or a multiple of 2**32 bits"
    )


def emit_threshold_table(c: float, max_len: int) -> np.ndarray:
    """thresh[l] = smallest integer cov with (float64)cov >= c*l, matching
    the reference's double compare (ReadAnalyzer.hpp:104) exactly."""
    l = np.arange(max_len + 1, dtype=np.float64)
    # float64 ceil IS "smallest integer cov with cov >= c*l" (fuzz-verified
    # against the scalar float64 compare across random (c, l))
    return np.ceil(c * l).astype(np.int64).astype(np.int32)


# Packed verdict layout (bits of one int32 per read).
PACK_GENE_BITS = 16            # winner gene id (uint16 capacity)
PACK_NW_SHIFT = 16
PACK_NW_BITS = 5               # n_winners, saturating at 31
PACK_EMIT_SHIFT = 21           # cov >= c*len flag
PACK_OVF_SHIFT = 22            # device result incomplete; host must redo
PACK_GRP_SHIFT = 23            # gene field holds a GROUP id (group_info);
#                                the host expands members via GeneGroups

# Sentinel padding of the compacted extra-winner pair stream.
PAIR_SENTINEL = 0xFFFFFFFF


@functools.partial(jax.jit, static_argnums=(2,))
def extract_pairs(packed: jnp.ndarray, winners: jnp.ndarray, cap: int):
    """ALL winners (slots 0..nw-1) of emitted rows as one device-sorted
    (row << 16 | gene) uint32 stream, truncated to `cap` entries.

    For tie-heavy batches (homolog panels: half the reads can tie across
    a whole gene family) this replaces {extra-pair fetch + host concat +
    host lexsort} with one fetch whose order IS the reference emission
    order (read-ascending, genes ascending within a read). The caller
    computes the exact pair count from the already-fetched packed verdicts
    and passes a QUANTIZED cap above it (pipeline._winner_pairs: levels
    {2^14, 2^17, 2^19, B*W} — cap is a static jit argument and each new
    value costs a remote compile), so the stream never truncates (the
    caller's sentinel-slot check at index `total` still guards the
    invariant). Rows with overflow/saturated winner counts are excluded —
    the caller recomputes those on the host.

    Note (row 65535, gene 65535) encodes to PAIR_SENTINEL itself; it
    sorts into the sentinel tail and may even be truncated by `cap`, but
    every sentinel-valued entry DECODES to exactly that pair, so the
    caller's slice-by-count reconstruction is exact either way."""
    B, W = winners.shape
    if B > 65536:
        # the read index rides the key's high 16 bits; a larger batch
        # would alias read 65536 onto read 0 (callers guard on this too,
        # but the invariant belongs to the encoding)
        raise ValueError("extract_pairs requires batch size <= 65536")
    nw = (packed >> PACK_NW_SHIFT) & ((1 << PACK_NW_BITS) - 1)
    emit = ((packed >> PACK_EMIT_SHIFT) & 1) == 1
    ovf = ((packed >> PACK_OVF_SHIFT) & 1) == 1
    grp = ((packed >> PACK_GRP_SHIFT) & 1) == 1
    sat = (1 << PACK_NW_BITS) - 1
    # group verdicts (grp) carry a GROUP id, not a gene: the host expands
    # members from GeneGroups, so they never ride the pair stream
    need = emit & (nw >= 1) & (nw <= W) & (nw < sat) & ~ovf & ~grp
    slot = jnp.arange(W, dtype=jnp.int32)[None, :]
    valid = need[:, None] & (slot < nw[:, None])
    row = jnp.arange(B, dtype=jnp.uint32)[:, None]
    key = (row << 16) | winners.astype(jnp.uint32)
    keys = jnp.where(valid, key, jnp.uint32(PAIR_SENTINEL)).reshape(-1)
    out = jnp.sort(keys)
    return out[: min(cap, out.shape[0])]


class DeviceIndex(NamedTuple):
    """Gather-optimized device layout of a SharkIndex (classic probe).

    A probe costs at most TWO random gathers (the dominant device cost —
    the compute around them is effectively free on the VPU):
      bf_rank[w] : (bloom word, exclusive rank) in one 8-byte row
      pay[r]     : (tag<<30 | g0, g1-or-rows3-index) in one 8-byte row
    versus the reference's bit-vector + rank + select + flattened-set walk
    (bloomfilter.h:78-102), which costs 6+ dependent memory touches.
    8-byte rows are the fastest gather shape at ANY table size on v5e
    (~100M rows/s even at 2+GB, bench/txome_gather.py), so both hot
    gathers stay in that shape; the wide (deg, gene...) rows exist only
    for deg>=3 k-mers in the small compacted rows3 table.

    (A single-gather layout was measured ~30% SLOWER on v5e — the negative
    result and its runnable kernel live in bench/fast_kernel.py.)
    """

    bf_rank: jnp.ndarray  # uint32[n_words, 2]: word, rank
    pay: jnp.ndarray  # uint32[max(n_set,1), 2]: tag/payload per set bit
    rows3: jnp.ndarray  # uint16[max(n_deg3,1), D3+1] compacted deg>=3 rows
    ext_mat: Optional[jnp.ndarray] = None  # uint16[n_ovf, ext3_w] tails


def build_gene_rows(
    deg: np.ndarray,
    gene_flat: np.ndarray,
    ext: bool,
    geometry: Optional[Tuple[int, int]] = None,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """(degree, slots) rows from per-row degrees + concatenated gene lists.

    Rows with deg <= D hold all genes inline. When the index has rows past
    GENE_INLINE_CAP, overflow rows keep their first D-2 genes inline and
    slots D-2, D-1 hold the (lo, hi) halves of an index into the returned
    extension matrix, whose rows carry genes D-2..min(deg, D-2+ext_w)-1.
    `ext=False` (sharded shards: no extension table rides the all_to_all)
    leaves those slots zero — the kernel flags such reads for exact host
    recompute instead."""
    n_set = deg.size
    D, ext_w = geometry or row_geometry(deg)
    gene_mat = np.zeros((max(n_set, 1), D + 1), dtype=np.uint16)
    ext_mat = None
    if not n_set:
        return gene_mat, None
    offsets = np.concatenate([[0], np.cumsum(deg)])
    gene_mat[:, 0] = deg
    inline = np.minimum(deg, D) if ext_w == 0 else np.where(
        deg > D, D - 2, deg
    )
    rows = np.repeat(np.arange(n_set), inline)
    cols = _ragged_cols(inline)
    gene_mat[rows, cols + 1] = gene_flat[
        np.repeat(offsets[:-1], inline) + cols
    ]
    if ext_w:
        ovf = np.flatnonzero(deg > D)
        if ext and ovf.size:
            eidx = np.arange(ovf.size, dtype=np.uint32)
            gene_mat[ovf, D - 1] = (eidx & 0xFFFF).astype(np.uint16)
            gene_mat[ovf, D] = (eidx >> 16).astype(np.uint16)
            ext_mat = np.zeros((ovf.size, ext_w), dtype=np.uint16)
            take = np.minimum(deg[ovf] - (D - 2), ext_w)
            erows = np.repeat(np.arange(ovf.size), take)
            ecols = _ragged_cols(take)
            ext_mat[erows, ecols] = gene_flat[
                np.repeat(offsets[:-1][ovf] + (D - 2), take) + ecols
            ]
    return gene_mat, ext_mat


def compact_true_cols(mask: jnp.ndarray, pos_i32: jnp.ndarray, cap: int):
    """Columns of up to `cap` True entries of mask [B, C] (ascending
    column order == ascending position in both the full-axis and
    compacted-positions layouts), with validity and the positions at
    those columns: (scol i32[B, cap], svalid bool[B, cap],
    cpos i32[B, cap])."""
    B, C = mask.shape
    col_iota = jnp.broadcast_to(
        jnp.arange(C, dtype=jnp.int32)[None, :], (B, C)
    )
    need_col = jnp.where(mask, col_iota, C)
    scol_s = jnp.sort(need_col, axis=1)[:, :cap]
    svalid = scol_s < C
    scol = jnp.minimum(scol_s, C - 1)
    cpos = jnp.where(
        svalid, jnp.take_along_axis(pos_i32, scol, axis=1), 0
    )
    return scol, svalid, cpos


def _ragged_cols(counts: np.ndarray) -> np.ndarray:
    """[0..c0-1, 0..c1-1, ...] for per-row counts."""
    total = int(counts.sum())
    ends = np.cumsum(counts)
    return np.arange(total, dtype=np.int64) - np.repeat(
        ends - counts, counts
    )


def build_pay(index: SharkIndex) -> np.ndarray:
    """uint32[max(n_set,1), 2] tag/payload rows, one per set bit in CSR
    rank order: word0 = tag<<30 | first_gene (tags 1/2), word1 = second
    gene (tag 2) or the row's index into the compacted rows3 table
    (tag 3)."""
    deg = np.diff(index.offsets).astype(np.int64)
    n_set = deg.size
    pay = np.zeros((max(n_set, 1), 2), dtype=np.uint32)
    if not n_set:
        return pay
    off = index.offsets[:-1].astype(np.int64)
    gene_ids = np.asarray(index.gene_ids)
    first_gene = gene_ids[np.minimum(off, max(gene_ids.size - 1, 0))].astype(
        np.uint32
    )
    tag = np.where(
        deg == 1, TAG_D1, np.where(deg == 2, TAG_D2, TAG_ROW)
    ).astype(np.uint32)
    d2 = deg == 2
    d3 = deg >= 3
    pay[:, 0] = (tag << 30) | np.where(d3, 0, first_gene)
    w1 = np.zeros(n_set, np.uint32)
    if d2.any():
        w1[d2] = gene_ids[off[d2] + 1].astype(np.uint32)
    if d3.any():
        w1[d3] = rows3_payload(index)  # rows3 index (+ gid bits)
    pay[:, 1] = w1
    return pay


def pack_rows_u32(gm16: np.ndarray) -> np.ndarray:
    """[n, F] u16 rows -> [n, ceil(F/2)] u32 (field 2j low half, 2j+1
    high half of word j). TPU gather cost is ~linear in ELEMENTS per row
    (bench/gather_gap.py), so halving the element count nearly halves the
    wide-row gather; the field unpack is free VPU shift/mask work."""
    n, F = gm16.shape
    W = (F + 1) // 2
    padded = np.zeros((n, 2 * W), dtype=np.uint16)
    padded[:, :F] = gm16
    return (
        padded[:, 0::2].astype(np.uint32)
        | (padded[:, 1::2].astype(np.uint32) << 16)
    )


def row_field(gm: jnp.ndarray, i: int) -> jnp.ndarray:
    """uint32 field i of packed-u32 (or plain u16) gene rows."""
    if gm.dtype == jnp.uint16:
        return gm[..., i].astype(jnp.uint32)
    w = gm[..., i >> 1]
    return (w >> 16) if (i & 1) else (w & jnp.uint32(0xFFFF))


def build_rows3(
    index: SharkIndex, ext: bool = True
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Compacted (degree, slots) rows for deg>=3 set bits only (+ extension
    matrix), addressed by the tag-3 payload of build_pay /
    build_hashed_index. Rows are PACKED two u16 fields per u32 word
    (pack_rows_u32)."""
    deg = np.diff(index.offsets).astype(np.int64)
    d3 = deg >= 3
    geometry = index_geometry3(index)
    if not d3.any():
        return pack_rows_u32(
            np.zeros((1, geometry[0] + 1), dtype=np.uint16)
        ), None
    gene_flat = np.asarray(index.gene_ids)[np.repeat(d3, deg)]
    gm16, ext_mat = build_gene_rows(
        deg[d3], gene_flat, ext, geometry=geometry
    )
    return pack_rows_u32(gm16), ext_mat


def build_gene_mat(
    index: SharkIndex, ext: bool = True
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """(degree, slots) row per set bit (+ extension matrix), numpy — the
    FULL-width layout (all degrees); used by the sharded-BF path."""
    deg = np.diff(index.offsets).astype(np.int64)
    return build_gene_rows(
        deg, np.asarray(index.gene_ids), ext, geometry=index_geometry(index)
    )


def build_device_index(
    index: SharkIndex,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """Host-side construction of the classic DeviceIndex arrays (numpy):
    (bf_rank, pay, rows3, ext_mat)."""
    n_words = index.bf_words.size
    bf_rank = np.empty((n_words, 2), dtype=np.uint32)
    bf_rank[:, 0] = index.bf_words
    bf_rank[:, 1] = index.word_rank
    pay = build_pay(index)
    rows3, ext_mat = build_rows3(index)
    return bf_rank, pay, rows3, ext_mat


def hash_positions(codes: jnp.ndarray, meta: StaticMeta):
    """codes [B, L] -> (word_idx i32[B,Ls], bit_off u32[B,Ls], win_valid
    bool[B,Ls]) with Ls = L-k+1: column j addresses the window ENDING at
    position j+k-1 (windows ending before k-1 cannot exist, so they are
    sliced away rather than masked — the probe gathers are the dominant
    device cost and this trims them ~k/L).

    The per-window canonical-kmer -> XXH64 -> mod -> (word, bit) address
    computation, shared by the replicated and sharded probe paths."""
    idx_hi, idx_lo, win_valid = bloom_positions(codes, meta)
    word_idx = ((idx_hi << 27) | (idx_lo >> 5)).astype(jnp.int32)
    return word_idx, idx_lo & 31, win_valid


def bloom_positions(codes: jnp.ndarray, meta: StaticMeta):
    """codes [B, L] -> (idx_hi u32[B,Ls], idx_lo u32[B,Ls], win_valid
    bool[B,Ls]): the bit-exactness-critical window-slice + canonical-kmer
    + XXH64 + mod-size front end, shared by every probe layout (classic
    word/bit addressing above; the hashed kernel's bucket/rest split)."""
    k = meta.k
    canon, win_valid = canonical_kmers_jax(codes, k)
    s = min(k - 1, codes.shape[1] - 1)
    canon = (canon[0][:, s:], canon[1][:, s:])
    win_valid = win_valid[:, s:]
    h = xxh64_u64(canon)
    idx_hi, idx_lo = _mod_size(h, meta.size_bits)
    return idx_hi, idx_lo, win_valid


def take_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Row gather with FLATTENED indices.

    XLA's TPU gather issues ~25% faster from a 1-D index vector than from
    the same indices shaped [B, L] (bench/gather_gap.py: 155M vs 124M
    rows/s for identical tables) — batch dims on the index add per-row
    issue cost. All hot row gathers go through here."""
    flat = jnp.take(table, idx.reshape(-1), axis=0)
    return flat.reshape(idx.shape + table.shape[1:])


def probe_rank(bf_rank: jnp.ndarray, word_idx, bit_off, win_valid):
    """Bloom membership + exact CSR rank from one 8-byte-row gather.

    Returns (rank i32[...], hit bool[...]); rank is 0 where !hit."""
    wr = take_rows(bf_rank, word_idx)
    w = wr[..., 0]
    hit = (((w >> bit_off) & 1) == 1) & win_valid
    low_mask = (jnp.uint32(1) << bit_off) - 1
    rank = wr[..., 1] + jax.lax.population_count(w & low_mask)
    return jnp.where(hit, rank.astype(jnp.int32), 0), hit


def decode_pay_words(w0: jnp.ndarray, w1: jnp.ndarray):
    """(tag, payload) from a build_pay 8-byte row's two u32 words — THE
    bit-layout decode, shared by the classic probe and the sharded-BF
    reply wire (which routes the same rows over all_to_all) so the two
    paths cannot diverge. Zeroed words decode to tag 0 = miss."""
    tagv = w0 >> 30
    payv = jnp.where(
        tagv == TAG_ROW,
        w1,
        (w0 & jnp.uint32(0xFFFF)) | ((w1 & jnp.uint32(0xFFFF)) << 16),
    )
    return tagv, payv


def probe_tags(dix: DeviceIndex, word_idx, bit_off, win_valid):
    """Classic two-gather probe to (tag, payload) per window.

    Both gathers are 8-byte rows — the fastest gather shape at any table
    size on v5e (bench/txome_gather.py). tag/payload semantics match the
    hashed front-end (TAG_* constants)."""
    r, hit = probe_rank(dix.bf_rank, word_idx, bit_off, win_valid)
    pw = take_rows(dix.pay, r)
    return decode_pay_words(
        jnp.where(hit, pw[..., 0], jnp.uint32(0)), pw[..., 1]
    )


def keys_from_gm(
    gm: jnp.ndarray,  # uint16[B, Ls, D+1]
    hit: jnp.ndarray,  # bool[B, Ls]
    *,
    meta: StaticMeta,
    L: int,
    off: int,
    ext_mat: Optional[jnp.ndarray],
    geometry: Optional[Tuple[int, int]] = None,  # (D, ext_w) of gm's rows
    positions: Optional[jnp.ndarray] = None,  # i32[B, C] absolute window pos
):
    """(gene << pos_bits | pos) sort-key blocks from per-window gene rows,
    handling the capped-degree inline/extension layout. Returns
    (list of uint32[B, *] blocks, row_ovf bool[B]). Shared by the sharded
    path (full-width rows, meta.degree) and the single-chip kernels'
    degree>=3 cond branch (compacted rows3 geometry). `positions` supplies
    explicit absolute window positions when gm's columns are a compacted
    subset of windows rather than the full off..off+Ls-1 axis."""
    B, Ls = hit.shape
    D, ext_w = geometry if geometry is not None else (meta.degree, meta.ext_w)
    G = meta.n_genes
    pos_bits = meta.pos_bits
    deg = jnp.where(hit, row_field(gm, 0).astype(jnp.int32), 0)

    if positions is not None:
        pos_i32 = positions
    else:
        pos_i32 = jnp.broadcast_to(
            (jnp.arange(Ls, dtype=jnp.int32) + off)[None, :], (B, Ls)
        )
    sentinel = jnp.uint32(G << pos_bits)
    pos_u32 = pos_i32.astype(jnp.uint32)
    row_ovf = jnp.zeros((B,), dtype=jnp.bool_)
    keys = []
    if ext_w == 0:
        for d in range(D):
            g = row_field(gm, 1 + d)
            key = (g << pos_bits) | pos_u32
            keys.append(jnp.where(hit & (d < deg), key, sentinel))
        return keys, row_ovf
    # inline slots: all D when deg <= D, else the first D-2 (the last
    # two hold the extension-row index)
    over = deg > D
    for d in range(D):
        g = row_field(gm, 1 + d)
        key = (g << pos_bits) | pos_u32
        ok = hit & (d < deg) & (~over if d >= D - 2 else True)
        keys.append(jnp.where(ok, key, sentinel))
    needy = hit & over
    if ext_mat is None:
        # no extension table on this path: exact host recompute
        row_ovf = jnp.any(needy, axis=1)
        return keys, row_ovf
    cap2 = EXT_CAP2
    scol, svalid, cpos = compact_true_cols(needy, pos_i32, cap2)
    gm2 = jnp.take_along_axis(gm, scol[..., None], axis=1)
    erow = row_field(gm2, D - 1).astype(jnp.int32) | (
        row_field(gm2, D).astype(jnp.int32) << 16
    )
    eg = take_rows(ext_mat, jnp.where(svalid, erow, 0))  # [B, cap2, ext_w]
    resid = jnp.where(svalid, row_field(gm2, 0).astype(jnp.int32) - (D - 2), 0)
    spos = cpos.astype(jnp.uint32)
    for d in range(ext_w):
        g = eg[..., d].astype(jnp.uint32)
        key = (g << pos_bits) | spos
        keys.append(jnp.where(svalid & (d < resid), key, sentinel))
    row_ovf = (jnp.sum(needy.astype(jnp.int32), axis=1) > cap2) | jnp.any(
        needy & (deg - (D - 2) > ext_w), axis=1
    )
    return keys, row_ovf


def finish_from_keys(
    key_mat: jnp.ndarray,  # uint32[B, K] (gene << pos_bits | pos), sentinel-padded
    length: jnp.ndarray,  # int32[B]
    thresh: jnp.ndarray,  # int32[L+1]
    row_ovf: jnp.ndarray,  # bool[B]: device view incomplete for this read
    *,
    meta: StaticMeta,
    max_winners: int,
    L: int,
):
    B = key_mat.shape[0]
    k = meta.k
    W = max_winners
    G = meta.n_genes
    pos_bits = meta.pos_bits

    # sort-based segmented coverage reduction
    skey = jnp.sort(key_mat, axis=1)
    gene = (skey >> pos_bits).astype(jnp.int32)
    pos = (skey & ((1 << pos_bits) - 1)).astype(jnp.int32)
    valid = gene < G

    prev_gene = jnp.pad(gene[:, :-1], ((0, 0), (1, 0)), constant_values=-1)
    prev_pos = jnp.pad(pos[:, :-1], ((0, 0), (1, 0)), constant_values=0)
    next_gene = jnp.pad(gene[:, 1:], ((0, 0), (0, 1)), constant_values=-2)

    seg_start = valid & (gene != prev_gene)
    seg_end = valid & (gene != next_gene)
    contrib = jnp.where(
        valid,
        jnp.where(seg_start, k, jnp.minimum(k, pos - prev_pos)),
        0,
    ).astype(jnp.int32)
    ones = valid.astype(jnp.int32)

    # cov and hits ride ONE packed cumsum/cummax pair (measured ~2.3 ms/
    # batch saved vs two pairs, bench/profile_finish.py). No carries:
    # the hits field gets ceil(log2(width+1)) bits (per-row hit count <=
    # key width) and the cov field tops out at k * width, so the packed
    # value stays under 2^31; both fields are monotone, so the cummax
    # carries the same per-field segment bases as two separate cummaxes.
    # Wide geometries (huge D rows, or fused lengths in the multi-KB
    # range) overflow the 31-bit budget — those fall back to two unpacked
    # pairs, bit-identically.
    width = key_mat.shape[1]
    HB = max(1, int(np.ceil(np.log2(width + 1))))
    if k * width < (1 << (31 - HB)):
        packed_c = (contrib << HB) | ones
        csum = jnp.cumsum(packed_c, axis=1)
        base = jax.lax.cummax(
            jnp.where(seg_start, csum - packed_c, 0), axis=1
        )
        both = csum - base
        cov = both >> HB
        hits = both & ((1 << HB) - 1)
    else:
        csum_c = jnp.cumsum(contrib, axis=1)
        base_c = jax.lax.cummax(
            jnp.where(seg_start, csum_c - contrib, 0), axis=1
        )
        cov = csum_c - base_c
        csum_h = jnp.cumsum(ones, axis=1)
        base_h = jax.lax.cummax(
            jnp.where(seg_start, csum_h - ones, 0), axis=1
        )
        hits = csum_h - base_h

    M = jnp.int32(L + 1)
    combined = jnp.where(seg_end, cov * M + hits, 0)
    best = jnp.max(combined, axis=1)
    winner = seg_end & (combined == best[:, None]) & (best[:, None] > 0)
    n_winners = jnp.sum(winner.astype(jnp.int32), axis=1)

    # compact winner genes (already in ascending-gene order along the
    # sorted key axis) to width W by sorting — a scatter here costs ~50ms
    # per 64k batch on TPU, a second small sort is ~free. (A batch-level
    # cond skipping this sort on tie-free batches measured a WASH in an
    # in-session A/B — 0.99x single-end, 1.00x homolog, verdict-identical
    # — so the unconditional sort stays; bench/ab_winner_cond.py.)
    wkey = jnp.where(winner, gene.astype(jnp.uint32), jnp.uint32(0xFFFFFFFF))
    swin = jnp.sort(wkey, axis=1)[:, :W]
    winners = jnp.where(
        swin != jnp.uint32(0xFFFFFFFF), swin.astype(jnp.int32), -1
    )

    best_cov = best // M
    emit = best_cov >= jnp.take(thresh, length, mode="clip")
    nw_sat = jnp.minimum(n_winners, (1 << PACK_NW_BITS) - 1)
    packed = (
        jnp.maximum(winners[:, 0], 0)
        | (nw_sat << PACK_NW_SHIFT)
        | (emit.astype(jnp.int32) << PACK_EMIT_SHIFT)
        | (row_ovf.astype(jnp.int32) << PACK_OVF_SHIFT)
    )
    return packed, winners, best_cov, length


def finish_from_tags(
    tagv: jnp.ndarray,  # uint32[B, Ls]: 0 miss / TAG_D1 / TAG_D2 / TAG_ROW
    payv: jnp.ndarray,  # uint32[B, Ls]: genes or rows3 index (see TAG_*)
    length: jnp.ndarray,  # int32[B]
    thresh: jnp.ndarray,  # int32[L+1]
    *,
    rows3: jnp.ndarray,  # uint16[max(n_deg3,1), D3+1]
    ext_mat: Optional[jnp.ndarray],
    meta: StaticMeta,
    max_winners: int,
    L: int,
    has_rows: bool,
    allow_groups: bool = True,
    force_full_rows: bool = False,
):
    """Shared back-end of every probe front-end: (tag, payload) per window
    -> sort keys -> coverage/winner reduction. Degree<=2 windows build
    their keys directly; degree>=3 windows resolve through the compacted
    rows3 table under a batch-level cond so row-free batches never pay the
    gather. `allow_groups=False` disables the tie-heavy group fast path
    (used by its own sub-batch recursion); `force_full_rows=True`
    additionally skips the row-free and column-compaction conds and goes
    straight to the full-width row resolve — bit-exact (it is those conds'
    fallback branch), used by the group sub-batch where rows exist by
    construction (need_fix implies any_row) and every cond is a fusion
    boundary at a scale too small to amortize it."""
    B, Ls = tagv.shape
    off = L - Ls
    pos_bits = meta.pos_bits
    pos_u32 = jnp.broadcast_to(
        (jnp.arange(Ls, dtype=jnp.uint32) + off)[None, :], (B, Ls)
    )
    sentinel = jnp.uint32(meta.n_genes << pos_bits)
    keys = [
        jnp.where(
            (tagv == TAG_D1) | (tagv == TAG_D2),
            ((payv & 0xFFFF) << pos_bits) | pos_u32,
            sentinel,
        ),
        jnp.where(
            tagv == TAG_D2, ((payv >> 16) << pos_bits) | pos_u32, sentinel
        ),
    ]
    row_ovf = jnp.zeros((B,), dtype=jnp.bool_)

    if has_rows:
        geometry3 = (meta.degree3, meta.ext3_w)
        is_row = tagv == TAG_ROW
        rb = meta.rows_bits
        if rb:
            row_idx = jnp.where(
                is_row, payv & jnp.uint32((1 << rb) - 1), 0
            ).astype(jnp.int32)
            gidv = (payv >> rb).astype(jnp.int32)
        else:
            row_idx = jnp.where(is_row, payv, 0).astype(jnp.int32)

        def _finish(extra_keys, base_keys, ovf):
            key_mat = jnp.concatenate(base_keys + list(extra_keys), axis=1)
            return finish_from_keys(
                key_mat, length, thresh, ovf,
                meta=meta, max_winners=max_winners, L=L,
            )

        def full_from_gm(gm):
            ks, ovf = keys_from_gm(
                gm, is_row,
                meta=meta, L=L, off=off,
                ext_mat=ext_mat, geometry=geometry3,
            )
            # a window is EITHER direct (<=2 keys) or a row (<=D3 keys),
            # never both, so the first two row lanes fold into the direct
            # lanes (exactly one side is non-sentinel; sentinel is the max
            # key) — sort width (D3+2)*Ls -> max(D3,2)*Ls
            ks = list(ks)
            folded = list(keys)
            for i in range(min(2, len(ks))):
                if ks[i].shape == folded[i].shape:
                    folded[i] = jnp.minimum(folded[i], ks[i])
                    ks[i] = None
            return _finish([x for x in ks if x is not None], folded, ovf)

        def full_branch(_):
            return full_from_gm(take_rows(rows3, row_idx))

        if force_full_rows:
            return full_branch(None)

        heavy = full_branch
        if meta.degree3 >= ROW_COMPACT_MIN_D:
            # Wide-row indexes (transcriptome scale: D3 up to 16) pay a
            # full-width [B, Ls] rows3 gather per batch even when deg>=3
            # windows are rare collision rows. Batches where no read has
            # more than ROW_CAP row windows gather rows at ROW_CAP
            # compacted columns instead (the win is the ~5.8M-row gather
            # shrinking to ~1M — per-row sort width is nearly free on the
            # VPU, measured in bench/profile_finish.py); heavier batches
            # (family cores) take the full-width branch of the same cond.
            # Both branches are bit-exact.
            pos_i32 = pos_u32.astype(jnp.int32)

            def _compact_cols(mask):
                return compact_true_cols(mask, pos_i32, ROW_CAP)

            def compact_branch(_):
                scol, svalid, cpos = _compact_cols(is_row)
                ridx = jnp.where(
                    svalid, jnp.take_along_axis(row_idx, scol, axis=1), 0
                )
                gm = take_rows(rows3, ridx)
                ks, ovf = keys_from_gm(
                    gm, svalid,
                    meta=meta, L=L, off=off,
                    ext_mat=ext_mat, geometry=geometry3,
                    positions=cpos,
                )
                return _finish(ks, keys, ovf)

            # (A "mid tier" — inline lanes for the common degree plus
            # compacted residual columns for rare wider windows — measured
            # a 11% LOSS on the 50k-gene txome bench: XLA's per-row sort
            # is cheap at these widths, while the column-compaction
            # machinery (a [B,Ls] sort + take_alongs) is not. The light
            # branch below wins only because it removes the full-width
            # rows3 GATHER, not because it narrows the sort.)
            n_row = jnp.sum(is_row.astype(jnp.int32), axis=1)

            def heavy(_):
                return jax.lax.cond(
                    jnp.max(n_row) <= ROW_CAP,
                    compact_branch,
                    full_branch,
                    None,
                )

        if rb and allow_groups:
            # Tie-heavy (group) fast path. Per read, call it PURE when all
            # its hits are deg>=3 rows carrying ONE common group id (one
            # deduped gene set) and it has no direct (deg<=2) hits: every
            # member of that set then receives identical hit positions, so
            # (cov, hits) are identical, all members tie, and the verdict
            # is exactly "the whole set, with the set's coverage"
            # (ReadAnalyzer.hpp:90-102 tie semantics). Such reads score
            # the SET as one pseudo-gene (id n_genes) in a single key
            # lane folded into the direct lanes — no rows3 gather, no D3
            # key fan-out, no per-member winner traffic (the 8x key
            # redundancy of homolog panels, docs/PERF.md) — and the host
            # expands members from GeneGroups.
            #
            # IMPURE row-hitting reads (core-boundary straddlers whose row
            # hits interleave with member-specific direct hits; reads
            # touching a collision-merged row with its own unique set —
            # ~1% of core reads at -b 1, so EVERY production batch has
            # some) re-score exactly through a compacted FIX_CAP-read
            # sub-batch of the recursive heavy finish, scattered back
            # over the group verdicts. Only a batch with more than
            # FIX_CAP impure reads falls back to the full heavy branch.
            any_direct = jnp.any(
                (tagv == TAG_D1) | (tagv == TAG_D2), axis=1
            )
            any_row = jnp.any(is_row, axis=1)
            gmax = jnp.max(jnp.where(is_row, gidv, -1), axis=1)
            gmin = jnp.min(
                jnp.where(is_row, gidv, jnp.int32(0x7FFFFFFF)), axis=1
            )
            pure = any_row & ~any_direct & (gmax == gmin)
            need_fix = any_row & ~pure
            n_fix = jnp.sum(need_fix.astype(jnp.int32))
            # two sub-batch tiers: homolog batches fit the small one
            # (~230 impure, ab_fixcap.py), txome batches need the large
            # one (impure counts land between them — BENCH r4 caught the
            # single-tier 1024 cap silently dropping txome to the full
            # heavy branch: group_rows went 2048 -> 0 and warm classify
            # 1.56 -> 2.28 s)
            FIX_CAP = min(B, max(64, B // FIX_DIV))
            FIX_CAP2 = min(B, max(FIX_CAP, B // FIX_DIV2))

            def group_branch(fix):
                def impl(_):
                    import dataclasses

                    pseudo = jnp.uint32(meta.n_genes)
                    sent2 = jnp.uint32((meta.n_genes + 1) << pos_bits)
                    direct1 = (tagv == TAG_D1) | (tagv == TAG_D2)
                    kd0 = jnp.where(
                        direct1,
                        ((payv & 0xFFFF) << pos_bits) | pos_u32,
                        sent2,
                    )
                    kd1 = jnp.where(
                        tagv == TAG_D2,
                        ((payv >> 16) << pos_bits) | pos_u32,
                        sent2,
                    )
                    # a window is direct XOR row: the group lane folds
                    # into lane 0 (sentinel is the max key)
                    kg = jnp.where(
                        is_row, (pseudo << pos_bits) | pos_u32, sent2
                    )
                    meta2 = dataclasses.replace(
                        meta, n_genes=meta.n_genes + 1
                    )
                    packed, winners, best_cov, length_ = finish_from_keys(
                        jnp.concatenate(
                            [jnp.minimum(kd0, kg), kd1], axis=1
                        ),
                        length,
                        thresh,
                        row_ovf,
                        meta=meta2,
                        max_winners=max_winners,
                        L=L,
                    )
                    # pure reads: the pseudo-gene is their only candidate
                    # and any_row guarantees >= 1 hit, so rewrite the
                    # verdict to (group id, nw=1 placeholder, GRP flag),
                    # keeping the device-computed emit bit; the host
                    # substitutes the true member list and count
                    emit_b = (packed >> PACK_EMIT_SHIFT) & 1
                    packed = jnp.where(
                        pure,
                        jnp.maximum(gmax, 0)
                        | (1 << PACK_NW_SHIFT)
                        | (emit_b << PACK_EMIT_SHIFT)
                        | jnp.int32(1 << PACK_GRP_SHIFT),
                        packed,
                    )
                    if fix:
                        # compact the impure reads into a `fix`-read
                        # sub-batch, re-score them exactly through the
                        # recursive heavy finish (group path disabled),
                        # scatter the verdicts back; padding lanes write
                        # back the original values via mode="drop"
                        iota_b = jnp.arange(B, dtype=jnp.int32)
                        sel_raw = jnp.sort(
                            jnp.where(need_fix, iota_b, B)
                        )[:fix]
                        # clamped indices feed the TAKES only (padding
                        # lanes read read B-1's data and are discarded);
                        # the SCATTERS use the raw indices with
                        # mode="drop" so padding lanes (index B) write
                        # nothing. The earlier clamp-both-sides version
                        # wrote take(packed, B-1) — the STALE pre-fix
                        # verdict — from every padding lane, and
                        # duplicate-index .at[].set is last-write-wins,
                        # so an IMPURE read at index B-1 kept its group
                        # pseudo-gene verdict (emitting gene id n_genes)
                        # whenever the batch had fewer than `fix` impure
                        # reads. Regression: test_groups.py
                        # test_impure_last_read_exact.
                        sel = jnp.minimum(sel_raw, B - 1)
                        sp, sw, sc, _ = finish_from_tags(
                            jnp.take(tagv, sel, axis=0),
                            jnp.take(payv, sel, axis=0),
                            jnp.take(length, sel, axis=0),
                            thresh,
                            rows3=rows3,
                            ext_mat=ext_mat,
                            meta=meta,
                            max_winners=max_winners,
                            L=L,
                            has_rows=True,
                            allow_groups=False,
                            force_full_rows=_SUBFIX_FORCE_FULL,
                        )
                        packed = packed.at[sel_raw].set(sp, mode="drop")
                        winners = winners.at[sel_raw].set(
                            sw, mode="drop"
                        )
                        best_cov = best_cov.at[sel_raw].set(
                            sc, mode="drop"
                        )
                    return packed, winners, best_cov, length_

                return impl

            inner_heavy = heavy
            tier2 = (
                inner_heavy
                if FIX_CAP2 == FIX_CAP
                else lambda _: jax.lax.cond(
                    n_fix <= FIX_CAP2,
                    group_branch(FIX_CAP2),
                    inner_heavy,
                    None,
                )
            )

            def heavy(_):
                return jax.lax.cond(
                    n_fix == 0,
                    group_branch(0),
                    lambda _: jax.lax.cond(
                        n_fix <= FIX_CAP,
                        group_branch(FIX_CAP),
                        tier2,
                        None,
                    ),
                    None,
                )

        # row-free batches skip even the compacted gather + row lanes
        return jax.lax.cond(
            jnp.any(is_row),
            heavy,
            lambda _: _finish([], keys, row_ovf),
            None,
        )

    key_mat = jnp.concatenate(keys, axis=1)
    return finish_from_keys(
        key_mat,
        length,
        thresh,
        row_ovf,
        meta=meta,
        max_winners=max_winners,
        L=L,
    )


def classify_kernel(
    dix: DeviceIndex,
    thresh: jnp.ndarray,  # int32[L+1] emission threshold table
    codes: jnp.ndarray,  # uint8[B, L]
    *,
    meta: StaticMeta,
    max_winners: int,
    has_rows: bool = True,
):
    """Returns (packed i32[B], winners i32[B, W], best_cov i32[B],
    length i32[B])."""
    word_idx, bit_off, win_valid = hash_positions(codes, meta)
    tagv, payv = probe_tags(dix, word_idx, bit_off, win_valid)
    length = jnp.sum((codes < INVALID).astype(jnp.int32), axis=1)
    return finish_from_tags(
        tagv,
        payv,
        length,
        thresh,
        rows3=dix.rows3,
        ext_mat=dix.ext_mat,
        meta=meta,
        max_winners=max_winners,
        L=codes.shape[1],
        has_rows=has_rows,
    )


def unpack_codes(packed: jnp.ndarray, vmask: jnp.ndarray) -> jnp.ndarray:
    """(2-bit codes u8[B, L/4], validity bits u8[B, L/8]) -> byte codes
    u8[B, L]. The packed form cuts host->device transfer 2.7x — transfer,
    not compute, bounds tunneled/host-limited deployments.

    PLANAR layout: byte j of a packed row holds the bases at positions
    j, j+L/4, j+2L/4, j+3L/4 (one 2-bit plane per position quarter), and
    likewise 8 planes for the validity bits. Unpacking is then a plain
    shift-mask-concatenate along the lane axis — a byte-interleaved
    layout would force an expensive cross-lane relayout on TPU (~45ms per
    64k batch, measured; planar is ~free)."""
    c = jnp.concatenate(
        [(packed >> (2 * r)) & 3 for r in range(4)], axis=1
    )
    v = jnp.concatenate(
        [(vmask >> r) & 1 for r in range(8)], axis=1
    )
    return jnp.where(v == 1, c, jnp.uint8(INVALID))


def classify_kernel_packed(
    dix: DeviceIndex,
    thresh: jnp.ndarray,
    packed: jnp.ndarray,  # uint8[B, L/4]
    vmask: jnp.ndarray,  # uint8[B, L/8]
    *,
    meta: StaticMeta,
    max_winners: int,
    has_rows: bool = True,
):
    codes = unpack_codes(packed, vmask)
    return classify_kernel(
        dix,
        thresh,
        codes,
        meta=meta,
        max_winners=max_winners,
        has_rows=has_rows,
    )


class Classifier:
    """Holds the device-resident index and a cache of jitted kernels keyed by
    padded batch geometry.

    Probe-path selection (`probe`): "hashed" = one gather into a
    position-keyed bucket table (classify/hashed.py) — the fast path when
    the table fits its byte budget; "classic" = two gathers (bf_rank +
    gene rows) — unconditionally correct at any scale; None = auto
    (hashed when buildable). A third, single-gather "fast" layout measured
    ~30% slower on v5e and lives as a negative result in
    bench/fast_kernel.py."""

    def __init__(
        self,
        index: SharkIndex,
        max_winners: int = 16,
        c: float = 0.6,
        device=None,
        probe: Optional[str] = None,
        probe_opts: Optional[dict] = None,
    ):
        """`probe_opts` tunes the probe-table build without monkeypatching:
        "threads" (host build parallelism, defaults to min(4, cpu_count)),
        "cache_dir" (on-disk packed-table cache, see
        classify/table_cache.py), and — for probe="xl" — "lgB"/"side_lgB"
        (pinned table geometries, used by A/B benches, fuzz tests, and the
        multi-chip dryrun to force spill-heavy layouts)."""
        self.index = index
        self.max_winners = max_winners
        self.c = c
        opts = dict(probe_opts or {})
        build_threads = opts.pop("threads", None)
        xl_lgB = opts.pop("lgB", None)
        xl_side_lgB = opts.pop("side_lgB", None)
        cache_dir = opts.pop("cache_dir", None)
        if opts:
            raise ValueError(f"unknown probe_opts: {sorted(opts)}")
        if (xl_lgB is not None or xl_side_lgB is not None) and probe != "xl":
            raise ValueError("lgB/side_lgB probe_opts require probe='xl'")
        # deduped deg>=3 gene sets for the tie-heavy group fast path; the
        # host expands group verdicts (PACK_GRP) through this
        gi = group_info(index)
        self.groups = gi[1] if gi is not None else None
        # local_devices: under a multi-host jax.distributed runtime the
        # global jax.devices()[0] may live on another process
        dev = device or jax.local_devices()[0]
        self._dev = dev
        built = None
        built_xl = None
        if probe in (None, "hashed", "xl"):
            from shark_tpu.classify.hashed import (
                HashedDeviceIndex,
                _pad_stash,
                build_hashed_index,
                build_hashed_xl,
            )

            cached = None
            if cache_dir:
                from shark_tpu.classify.table_cache import (
                    load_tables,
                    save_tables_async,
                )

                cached = load_tables(
                    cache_dir, index, probe, lgB=xl_lgB, side_lgB=xl_side_lgB
                )
            if cached is not None:
                kind, arrays = cached
                if kind == "hashed":
                    built = arrays
                else:
                    built_xl = arrays
            else:
                if probe != "xl":
                    built = build_hashed_index(index, threads=build_threads)
                if built is None:
                    # past the 64 MB bucket-table cliff (or forced): the
                    # GB-scale 16-byte-row layout keeps the one-gather probe
                    built_xl = build_hashed_xl(
                        index,
                        lgB=xl_lgB,
                        side_lgB=xl_side_lgB,
                        threads=build_threads,
                    )
                if cache_dir and (built is not None or built_xl is not None):
                    save_tables_async(
                        cache_dir,
                        index,
                        probe,
                        "hashed" if built is not None else "xl",
                        built if built is not None else built_xl,
                        lgB=xl_lgB,
                        side_lgB=xl_side_lgB,
                    )
            if built is None and built_xl is None and probe is not None:
                raise ValueError(
                    f"{probe} probe table not buildable for this index "
                    "(table budget / stash overflow); use probe='classic'"
                )
        if built is not None or built_xl is not None:
            if built is not None:
                table, stash, self._hmeta = built
                side = side_stash = None
                self.probe = "hashed"
            else:
                table, side, side_stash, self._hmeta = built_xl
                stash = _pad_stash(np.empty((0, 4), np.uint32))  # unused
                self.probe = "xl"
            rows3, ext_mat = (
                build_rows3(index)
                if self._hmeta.has_rows
                else (np.zeros((1, 2), np.uint16), None)
            )
            self.dix = HashedDeviceIndex(
                table=jax.device_put(table, dev),
                stash=jax.device_put(stash, dev),
                rows3=jax.device_put(rows3, dev),
                ext_mat=(
                    jax.device_put(ext_mat, dev)
                    if ext_mat is not None
                    else None
                ),
                side=(
                    jax.device_put(side, dev) if side is not None else None
                ),
                side_stash=(
                    jax.device_put(side_stash, dev)
                    if side_stash is not None
                    else None
                ),
            )
            self._has_rows = self._hmeta.has_rows
        else:
            bf_rank, pay, rows3, ext_mat = build_device_index(index)
            self._has_rows = bool((np.diff(index.offsets) >= 3).any())
            self.dix = DeviceIndex(
                bf_rank=jax.device_put(bf_rank, dev),
                pay=jax.device_put(pay, dev),
                rows3=jax.device_put(rows3, dev),
                ext_mat=(
                    jax.device_put(ext_mat, dev)
                    if ext_mat is not None
                    else None
                ),
            )
            self.probe = "classic"
        self._fns = {}
        self._thresh = {}

    def _fn(self, L: int, packed: bool = False):
        key = (L, packed)
        fn = self._fns.get(key)
        if fn is None:
            meta = StaticMeta.for_index(self.index, L)
            if self.probe in ("hashed", "xl"):
                from shark_tpu.classify.hashed import (
                    classify_kernel_hashed,
                    classify_kernel_hashed_packed,
                )

                kern = functools.partial(
                    classify_kernel_hashed_packed
                    if packed
                    else classify_kernel_hashed,
                    meta=meta,
                    hmeta=self._hmeta,
                    max_winners=self.max_winners,
                )
            else:
                kern = functools.partial(
                    classify_kernel_packed if packed else classify_kernel,
                    meta=meta,
                    max_winners=self.max_winners,
                    has_rows=self._has_rows,
                )
            fn = self._jit(kern, packed)
            self._fns[key] = fn
            if L not in self._thresh:
                self._thresh[L] = jax.device_put(
                    emit_threshold_table(self.c, L), self._dev
                )
        return fn

    def _jit(self, kern, packed: bool):
        """jit-compilation hook; DataParallelClassifier overrides it with
        mesh shardings so construction/probe selection stays shared."""
        return jax.jit(kern)

    def __call__(self, codes: np.ndarray):
        """codes: uint8 [B, L] -> device result tuple (async)."""
        fn = self._fn(codes.shape[1])
        return fn(self.dix, self._thresh[codes.shape[1]], codes)

    def call_packed(self, packed: np.ndarray, vmask: np.ndarray):
        """packed u8[B, L/4] + validity u8[B, L/8] -> result tuple."""
        L = packed.shape[1] * 4
        fn = self._fn(L, packed=True)
        return fn(self.dix, self._thresh[L], packed, vmask)
