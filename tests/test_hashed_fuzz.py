"""Property-fuzz of the hashed probe-table builder's geometry edges.

The packer (classify/hashed._pack_table) is the one bit-exactness-critical
component whose edge cases were previously covered only by construction-time
asserts: lgB families, entry16 (4-byte slots, two-word degree-2/row entries)
vs entry8 (planar 64-byte buckets), spill-stash partitioning near the
SMALL_STASH/STASH_CAP limits, and the 14-bit/30-bit rest boundaries.

Two layers:
  * `_pack_table` fuzz against a numpy emulation of the kernel's exact
    match semantics (classify/hashed.classify_kernel_hashed lanes), on
    synthetic (pos, tag, payload) sets that force bucket pileups and sit
    at the rest-width boundaries;
  * whole-index fuzz: random indexes across entry16/entry8/heavy-collision
    regimes, asserting the hashed kernel's verdicts equal the classic
    two-gather kernel bit for bit.
"""

import numpy as np
import pytest

from shark_tpu.classify.hashed import (
    BUCKET_SLOTS,
    SMALL_STASH,
    HashedMeta,
    _pack_table,
    _pad_stash,
    build_hashed_index,
)
from shark_tpu.classify.step import (
    MAX_SIZE_BITS,
    TAG_D1,
    TAG_D2,
    TAG_ROW,
    Classifier,
)
from shark_tpu.index.build import build_index
from shark_tpu.ops.kmers import encode_bytes

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def _emulate_lookup(table, stash, entry16, slots, lgB, p):
    """(tag, payload) the device kernel would produce for position p —
    the exact lane-match semantics of classify_kernel_hashed, in numpy."""
    bucket = int(p) & ((1 << lgB) - 1)
    rest = int(p) >> lgB
    tag, pay = 0, 0
    row = table[bucket]
    if entry16:
        metas = (row >> 16).astype(np.int64)
        pays = (row & 0xFFFF).astype(np.int64)
        m = ((metas & 0x3FFF) == (rest & 0x3FFF)) & ((metas >> 14) != 0)
        # the kernel trusts rest to fit 14 bits (build guarantees it)
        assert rest < (1 << 14)
        if m.any():
            fs = int(np.flatnonzero(m)[0])
            p0 = int(pays[fs])
            p1 = int(pays[m & (np.arange(slots) > fs)].sum())
            tag = int((metas[m] >> 14).max())
            pay = p0 | (p1 << 16)
    else:
        w0 = row[0].astype(np.int64)
        w1 = row[1].astype(np.int64)
        m = ((w0 & 0x3FFFFFFF) == rest) & ((w0 >> 30) != 0)
        assert rest < (1 << 30)
        if m.any():
            tag = int((w0[m] >> 30).sum())
            pay = int(w1[m].sum())
    sm = (stash[:, 0].astype(np.int64) == (int(p) & 0xFFFFFFFF)) & (
        stash[:, 1].astype(np.int64) == (int(p) >> 32)
    )
    tag += int(stash[sm, 2].astype(np.int64).sum())
    pay += int(stash[sm, 3].astype(np.int64).sum())
    return tag, pay


@pytest.mark.parametrize("seed", range(8))
def test_pack_table_fuzz(seed):
    rng = np.random.default_rng(seed)
    entry16 = seed % 2 == 0
    slots = BUCKET_SLOTS
    lgB = int(rng.integers(6, 13))
    rest_bits = 14 if entry16 else 30
    # sit at / near the rest-width boundary (capped at the kernel's
    # position-space limit so stash padding can never alias a real pos)
    size = min(
        (1 << lgB) << int(rng.integers(rest_bits - 2, rest_bits + 1)),
        MAX_SIZE_BITS,
    )
    n = int(rng.integers(64, 2048))
    pos = rng.integers(0, size, size=n, dtype=np.uint64)
    # pile a third of the entries onto a handful of buckets to force
    # spills (stash occupancy well past a bucket's capacity)
    mask = np.uint64((1 << lgB) - 1)
    third = n // 3
    hot = rng.integers(0, 1 << lgB, size=3, dtype=np.uint64)
    pos[:third] = (pos[:third] & ~mask) | hot[
        rng.integers(0, 3, size=third)
    ]
    pos = np.unique(pos)
    n = pos.size
    tag = rng.integers(1, 4, size=n).astype(np.int64)
    payload = np.where(
        tag == TAG_D1,
        rng.integers(0, 1 << 16, size=n),
        rng.integers(0, 1 << 32, size=n, dtype=np.int64),
    ).astype(np.uint32)
    need = np.where(tag == 1, 1, 2).astype(np.int64) if entry16 else None

    table, stash_rows = _pack_table(
        pos, tag, payload, need, lgB, entry16, slots
    )
    assert stash_rows.shape[0] > 0, "fuzz config failed to force spills"
    stash = _pad_stash(stash_rows)
    assert stash.shape[0] >= stash_rows.shape[0]
    assert (stash.shape[0] & (stash.shape[0] - 1)) == 0  # pow2 padded

    # every input position resolves to exactly its (tag, payload)
    for i in range(n):
        got = _emulate_lookup(table, stash, entry16, slots, lgB, pos[i])
        assert got == (int(tag[i]), int(payload[i])), (i, hex(int(pos[i])))

    # absent positions (same bucket universe) must miss
    miss = rng.integers(0, size, size=256, dtype=np.uint64)
    miss = miss[~np.isin(miss, pos)]
    for p in miss:
        got = _emulate_lookup(table, stash, entry16, slots, lgB, p)
        assert got == (0, 0), hex(int(p))

    # stash rows + in-table entries partition the input set: each spilled
    # position must NOT also match in the table (checked inside
    # _emulate_lookup by tag arithmetic — a double entry would produce a
    # tag sum > 3, caught by the exact equality above); here check counts
    in_table = int((table != 0).sum())
    if entry16:
        expected_words = int(np.where(tag == 1, 1, 2).sum())
    else:
        # planar w0 is always nonzero for a live entry; w1 may be zero
        # (payload 0), so count only the meta plane
        in_table = int((table[:, 0, :] != 0).sum())
        expected_words = n
    assert in_table + (
        int(np.where(tag[np.isin(pos, _stash_pos(stash_rows))] == 1, 1, 2).sum())
        if entry16
        else stash_rows.shape[0]
    ) == expected_words


def _stash_pos(stash_rows: np.ndarray) -> np.ndarray:
    return stash_rows[:, 0].astype(np.uint64) | (
        stash_rows[:, 1].astype(np.uint64) << np.uint64(32)
    )


def _random_records(rng, n_genes, gene_len, core_len=0):
    """Random genes; core_len > 0 plants a shared core in half of them
    (degree >= n/2 rows — rows3/group geometry stress)."""
    core = BASES[rng.integers(0, 4, size=core_len)].tobytes() if core_len else b""
    recs = []
    for g in range(n_genes):
        seq = BASES[rng.integers(0, 4, size=gene_len)].tobytes()
        if core and g % 2 == 0:
            mid = gene_len // 2
            seq = seq[:mid] + core + seq[mid + core_len :]
        recs.append((f"G{g}", seq))
    return recs


def _reads_codes(rng, records, n_reads, read_len, L):
    codes = np.full((n_reads, L), 4, dtype=np.uint8)
    for i in range(n_reads):
        _, seq = records[rng.integers(0, len(records))]
        start = int(rng.integers(0, max(1, len(seq) - read_len)))
        arr = np.frombuffer(seq[start : start + read_len], np.uint8).copy()
        mut = rng.random(arr.size) < 0.04
        arr[mut] = rng.choice(
            np.frombuffer(b"ACGTN", np.uint8), size=int(mut.sum())
        )
        codes[i, : arr.size] = encode_bytes(arr.tobytes())
    return codes


def _kernel_equal(index, codes, a, b):
    ra = [np.asarray(x) for x in a(codes)]
    rb = [np.asarray(x) for x in b(codes)]
    for name, x, y in zip(("packed", "winners", "best_cov", "length"), ra, rb):
        np.testing.assert_array_equal(x, y, err_msg=name)


@pytest.mark.parametrize("seed", range(4))
def test_xl_vs_classic_fuzz(seed, monkeypatch):
    """The GB-scale xl layout (16-byte rows, flag bit, side table) must
    equal the classic kernel bit for bit — across pinned geometries that
    force heavy bucket spills, a tiny XL_SIDE_CAP that forces the
    full-width side branch, and the natural (auto) geometry."""
    from shark_tpu.classify import hashed as H

    rng = np.random.default_rng(100 + seed)
    core = BASES[rng.integers(0, 4, size=60 + 10 * seed)].tobytes()
    recs = []
    for g in range(30 + 4 * seed):
        seq = BASES[rng.integers(0, 4, size=500)].tobytes()
        if g % 2 == 0:  # shared core -> deg>=3 rows -> TAG_ROW via side too
            seq = seq[:200] + core + seq[200 + len(core) :]
        recs.append((f"G{g}", seq))
    index = build_index(recs, 11, 1 << 16)
    codes = _reads_codes(rng, recs, n_reads=160, read_len=90, L=96)
    classic = Classifier(index, max_winners=24, probe="classic")

    # natural geometry
    xl = Classifier(index, max_winners=24, probe="xl")
    assert xl.probe == "xl" and xl._hmeta.xl
    _kernel_equal(index, codes, classic, xl)

    # pinned tight geometry -> guaranteed spills through the side table
    forced = H.build_hashed_xl(index, lgB=13)
    assert forced is not None and forced[3].has_side
    monkeypatch.setattr(
        H, "build_hashed_xl", lambda ix, **kw: forced
    )
    xl_sp = Classifier(index, max_winners=24, probe="xl")
    _kernel_equal(index, codes, classic, xl_sp)

    # tiny side cap -> reads exceed it -> the FULL-width side branch
    monkeypatch.setattr(H, "XL_SIDE_CAP", 1)
    xl_full = Classifier(index, max_winners=24, probe="xl")
    _kernel_equal(index, codes, classic, xl_full)


def test_xl_no_spill_geometry():
    """A lightly-loaded xl table (no spills) must skip the side machinery
    (has_side False) and still match classic."""
    from shark_tpu.classify.hashed import build_hashed_xl

    rng = np.random.default_rng(11)
    recs = _random_records(rng, 6, 300)
    index = build_index(recs, 17, 1 << 18)
    built = build_hashed_xl(index, lgB=14)  # ~1.7k entries in 64k slots
    assert built is not None
    assert not built[3].has_side
    codes = _reads_codes(rng, recs, n_reads=96, read_len=80, L=88)
    from shark_tpu.classify import hashed as H

    classic = Classifier(index, max_winners=8, probe="classic")
    orig = H.build_hashed_xl
    H.build_hashed_xl = lambda ix, **kw: built
    try:
        xl = Classifier(index, max_winners=8, probe="xl")
    finally:
        H.build_hashed_xl = orig
    _kernel_equal(index, codes, classic, xl)


GEOMETRIES = [
    # (size_bits, n_genes, gene_len, core_len, k) — regimes:
    (1 << 16, 30, 500, 0, 11),    # dense Bloom collisions, entry16
    (1 << 17, 60, 600, 80, 11),   # heavy load + shared core (rows3)
    (1 << 20, 8, 300, 0, 17),     # sparse panel, entry16 small-lgB family
    (1 << 28, 12, 400, 60, 17),   # size past every entry16 candidate -> entry8
]


@pytest.mark.parametrize("size_bits,n_genes,gene_len,core_len,k", GEOMETRIES)
def test_hashed_vs_classic_geometry_fuzz(
    size_bits, n_genes, gene_len, core_len, k
):
    rng = np.random.default_rng(size_bits % 97)
    records = _random_records(rng, n_genes, gene_len, core_len)
    index = build_index(records, k, size_bits)
    built = build_hashed_index(index)
    assert built is not None, "hashed table should build at these scales"
    hmeta: HashedMeta = built[2]
    if size_bits == 1 << 28:
        assert not hmeta.entry16  # the 14-bit rest boundary forces entry8
    else:
        assert hmeta.entry16

    codes = _reads_codes(rng, records, n_reads=192, read_len=90, L=96)
    classic = Classifier(index, max_winners=24, probe="classic")
    hashed = Classifier(index, max_winners=24, probe="hashed")
    ref = [np.asarray(x) for x in classic(codes)]
    got = [np.asarray(x) for x in hashed(codes)]
    for name, a, b in zip(
        ("packed", "winners", "best_cov", "length"), ref, got
    ):
        np.testing.assert_array_equal(a, b, err_msg=name)


@pytest.mark.parametrize("seed", range(6))
def test_pack_native_vs_numpy_fuzz(seed):
    """Randomized native-vs-numpy pack equality across layouts and
    geometries (the 4-case test in test_native.py pins the shapes; this
    sweeps random gene sets, duplication rates, k, and bucket counts)."""
    from shark_tpu.classify import hashed as H
    from shark_tpu.classify.step import rows3_payload
    from shark_tpu.index.build import build_index
    from shark_tpu.io import native

    if not native.available():
        pytest.skip("native engine unavailable")
    rng = np.random.default_rng(900 + seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    k = int(rng.choice([13, 15, 17]))
    n_genes = int(rng.integers(20, 90))
    records = []
    for g in range(n_genes):
        seq = bases[rng.integers(0, 4, size=int(rng.integers(k, 300)))]
        records.append((f"g{g}", seq.tobytes()))
    # random duplication creates deg>=2 / deg>=3 entries
    for m in range(int(rng.integers(0, 6))):
        src = records[int(rng.integers(0, n_genes))][1]
        cut = int(rng.integers(0, max(1, len(src) - k)))
        records.append((f"d{m}", src[cut:]))
    size_bits = 1 << int(rng.choice([20, 22]))
    ix = build_index(records, k, size_bits)
    if ix.n_set_bits == 0:
        pytest.skip("degenerate empty index")

    pos, tag, payload, has_rows, deg = H._entry_streams(ix)
    need = np.where(deg == 1, 1, 2).astype(np.int64)
    d3pay = rows3_payload(ix) if has_rows else np.zeros(0, np.uint32)
    lg_lo = max(6, int(np.ceil(np.log2(size_bits))) - 14)
    for _ in range(3):
        entry16 = bool(rng.integers(0, 2))
        slots = int(rng.choice([4, 8]))
        lgB = int(rng.integers(lg_lo, 16))
        t_np, sp_np = H._pack_table(
            pos, tag, payload, need if entry16 else None, lgB, entry16,
            slots,
        )
        res = native.pack_xl_native(
            ix, d3pay, lgB, slots, entry16, spill_cap=size_bits,
            threads=int(rng.integers(1, 5)),
        )
        assert res is not None
        np.testing.assert_array_equal(res[0], t_np)
        np.testing.assert_array_equal(res[1], sp_np)
