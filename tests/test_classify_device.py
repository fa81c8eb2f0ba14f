"""Device classify kernel vs the pure-host oracle on randomized workloads."""

import numpy as np
import pytest

from shark_tpu.classify.oracle import (
    OracleIndex,
    build_oracle_index,
    classify_read,
)
from shark_tpu.classify.step import Classifier
from shark_tpu.index.build import build_index
from shark_tpu.ops.kmers import encode_bytes

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
K = 11
SIZE_BITS = 1 << 16  # tiny filter => plenty of collisions exercised


def _random_records(rng, n_genes, gene_len):
    recs = []
    for g in range(n_genes):
        seq = BASES[rng.integers(0, 4, size=gene_len)].tobytes()
        recs.append((f"G{g}", seq))
    return recs


def _random_reads(rng, records, n_reads, read_len, err=0.05):
    reads = []
    for _ in range(n_reads):
        _, seq = records[rng.integers(0, len(records))]
        start = int(rng.integers(0, max(1, len(seq) - read_len)))
        arr = np.frombuffer(seq[start : start + read_len], np.uint8).copy()
        mut = rng.random(arr.size) < err
        arr[mut] = rng.choice(np.frombuffer(b"ACGTN", np.uint8), size=int(mut.sum()))
        reads.append(arr.tobytes())
    return reads


@pytest.fixture(scope="module")
def workload():
    rng = np.random.default_rng(42)
    records = _random_records(rng, n_genes=20, gene_len=400)
    reads = _random_reads(rng, records, n_reads=300, read_len=90)
    index = build_index(records, K, SIZE_BITS)
    oracle = build_oracle_index(records, K, SIZE_BITS)
    return records, reads, index, oracle


def _index_agrees(index, oracle: OracleIndex, positions):
    for p in positions:
        got = index.membership(int(p)).tolist()
        want = oracle.assoc.get(int(p), [])
        assert got == want, p


def test_index_matches_oracle(workload):
    _, _, index, oracle = workload
    # every associated position plus a sample of absent ones
    _index_agrees(index, oracle, list(oracle.assoc))
    rng = np.random.default_rng(0)
    _index_agrees(index, oracle, rng.integers(0, SIZE_BITS, size=200))


def _unpack(packed):
    from shark_tpu.classify.step import (
        PACK_EMIT_SHIFT,
        PACK_NW_BITS,
        PACK_NW_SHIFT,
    )

    winner0 = packed & ((1 << PACK_NW_SHIFT) - 1)
    nw = (packed >> PACK_NW_SHIFT) & ((1 << PACK_NW_BITS) - 1)
    emit = (packed >> PACK_EMIT_SHIFT) & 1
    return winner0, nw, emit


def test_device_matches_oracle(workload):
    _, reads, index, oracle = workload
    L = 128
    B = len(reads)
    codes = np.full((B, L), 4, dtype=np.uint8)
    for i, r in enumerate(reads):
        codes[i, : len(r)] = encode_bytes(r)

    c = 0.6
    clf = Classifier(index, max_winners=24, c=c)
    packed, winners, best_cov, length = (np.asarray(x) for x in clf(codes))
    winner0, n_winners, emit = _unpack(packed)

    for i, r in enumerate(reads):
        # oracle with c=0 reports winners whenever any gene was hit
        want_w, want_cov, want_len = classify_read(
            oracle, encode_bytes(r), 0.0, False
        )
        assert length[i] == want_len, i
        assert best_cov[i] == want_cov, (i, best_cov[i], want_cov)
        nw = int(n_winners[i])
        got_w = sorted(winners[i, :nw].tolist()) if nw else []
        assert got_w == want_w, (i, got_w, want_w)
        if nw:
            assert winner0[i] == winners[i, 0]
        # device emit flag must match the reference float64 compare
        want_emit = float(want_cov) >= c * float(want_len)
        assert bool(emit[i]) == want_emit, i


def test_device_short_and_empty_reads(workload):
    _, _, index, _ = workload
    clf = Classifier(index, max_winners=4)
    codes = np.full((4, 64), 4, dtype=np.uint8)
    codes[1, :5] = 0  # shorter than k
    codes[2, :K] = 1  # exactly k of 'C'
    packed, winners, best_cov, length = (np.asarray(x) for x in clf(codes))
    _, n_winners, _ = _unpack(packed)
    assert length.tolist()[:2] == [0, 5]
    assert n_winners[0] == 0 and n_winners[1] == 0


def test_emit_threshold_table_matches_float64():
    from shark_tpu.classify.step import emit_threshold_table

    rng = np.random.default_rng(5)
    for c in [0.0, 0.3, 0.6, 2 / 3, 0.999, 1.0] + list(rng.random(20)):
        t = emit_threshold_table(c, 300)
        for l in range(301):
            th = int(t[l])
            if th > 0:
                assert not (float(th - 1) >= c * float(l)), (c, l)
            assert float(th) >= c * float(l), (c, l)


def test_hashed_kernel_matches_classic(workload):
    """The one-gather hashed probe path must equal the classic two-gather
    kernel bit for bit on a collision-heavy index (shared positions,
    degree >= 3 rows, stash spills all possible here)."""
    _, reads, index, _ = workload
    L = 128
    codes = np.full((len(reads), L), 4, dtype=np.uint8)
    for i, r in enumerate(reads):
        codes[i, : len(r)] = encode_bytes(r)
    classic = Classifier(index, max_winners=24, probe="classic")
    hashed = Classifier(index, max_winners=24, probe="hashed")
    assert hashed.probe == "hashed"
    ref = [np.asarray(x) for x in classic(codes)]
    got = [np.asarray(x) for x in hashed(codes)]
    for name, a, b in zip(("packed", "winners", "best_cov", "length"), ref, got):
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_hashed_build_covers_all_positions(workload):
    """Every set position resolves to its exact CSR gene list through the
    table+stash (membership oracle equivalence)."""
    from shark_tpu.classify.hashed import (
        BUCKET_SLOTS,
        TAG_D1,
        TAG_D2,
        TAG_ROW,
        _set_bit_positions,
        build_hashed_index,
    )

    _, _, index, oracle = workload
    table, stash, hmeta = build_hashed_index(index)
    positions = _set_bit_positions(index)
    mask = (1 << hmeta.lgB) - 1

    d3rows = np.flatnonzero(np.diff(index.offsets) >= 3)
    from shark_tpu.classify.step import group_info

    gi = group_info(index)
    rows_mask = (1 << gi[2]) - 1 if gi is not None else 0xFFFFFFFF

    def decode(tag, payload, p):
        if tag == TAG_D1:
            return [payload & 0xFFFF]
        if tag == TAG_D2:
            return [payload & 0xFFFF, payload >> 16]
        assert tag == TAG_ROW
        # payload: compacted deg>=3 row index, gid in the high bits
        r = d3rows[payload & rows_mask]
        lo, hi = index.offsets[r], index.offsets[r + 1]
        return index.gene_ids[lo:hi].tolist()

    tag_shift, rest_mask = (14, 0x3FFF) if hmeta.entry16 else (30, 0x3FFFFFFF)
    n_stash_hits = 0
    for p in positions[:: max(1, positions.size // 500)]:
        want = index.membership(int(p)).tolist()
        got = None
        row = table[int(p) & mask]
        rest = int(p) >> hmeta.lgB
        if hmeta.entry16:
            # packed u32 words: meta16 high half, payload16 low half
            lanes = [(int(w) >> 16, int(w) & 0xFFFF) for w in row]
        else:
            lanes = [
                (int(row[0, s]), int(row[1, s])) for s in range(BUCKET_SLOTS)
            ]
        matched = [
            (meta >> tag_shift, pay)
            for meta, pay in lanes
            if (meta & rest_mask) == rest and (meta >> tag_shift) != 0
        ]
        if matched:
            tags = {t for t, _ in matched}
            assert len(tags) == 1  # all matched slots belong to this entry
            t = tags.pop()
            if hmeta.entry16:
                # degree-2/row entries span two slots (payload halves)
                assert len(matched) == (1 if t == TAG_D1 else 2)
                pay = matched[0][1]
                if len(matched) == 2:
                    pay |= matched[1][1] << 16
            else:
                assert len(matched) == 1
                pay = matched[0][1]
            got = decode(t, pay, p)
        for srow in np.asarray(stash):
            if int(srow[0]) == (int(p) & 0xFFFFFFFF) and int(srow[1]) == (
                int(p) >> 32
            ):
                assert got is None
                got = decode(int(srow[2]), int(srow[3]), p)
                n_stash_hits += 1
        assert got == want, p


def _fast_kernel_mod():
    """Load the quarantined single-gather kernel (bench/fast_kernel.py —
    a documented negative result kept runnable for future-hardware A/B)."""
    import importlib.util
    import pathlib

    path = pathlib.Path(__file__).resolve().parents[1] / "bench" / "fast_kernel.py"
    spec = importlib.util.spec_from_file_location("fast_kernel", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_fast_kernel_matches_classic(workload):
    """Single-gather kernel with no-overflow capacity must equal the
    classic two-gather kernel bit for bit (collision-heavy index)."""
    fk = _fast_kernel_mod()
    _, reads, index, _ = workload
    L = 128
    codes = np.full((len(reads), L), 4, dtype=np.uint8)
    for i, r in enumerate(reads):
        codes[i, : len(r)] = encode_bytes(r)
    classic = Classifier(index, max_winners=24)
    fast = fk.FastClassifier(index, max_winners=24, cap2=L)
    ref = [np.asarray(x) for x in classic(codes)]
    got = [np.asarray(x) for x in fast(codes)]
    for name, a, b in zip(("packed", "winners", "best_cov", "length"), ref, got):
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_fast_kernel_overflow_flag(workload):
    from shark_tpu.classify.step import PACK_OVF_SHIFT

    fk = _fast_kernel_mod()
    _, reads, index, _ = workload
    L = 128
    codes = np.full((len(reads), L), 4, dtype=np.uint8)
    for i, r in enumerate(reads):
        codes[i, : len(r)] = encode_bytes(r)
    tiny = fk.FastClassifier(index, max_winners=24, cap2=4)
    packed = np.asarray(tiny(codes)[0])
    ovf = (packed >> PACK_OVF_SHIFT) & 1
    assert ovf.sum() > 0  # collision-heavy index must overflow cap2=4
    # rows without overflow must match the classic kernel
    classic = Classifier(index, max_winners=24)
    ref = np.asarray(classic(codes)[0])
    keep = ovf == 0
    np.testing.assert_array_equal(packed[keep], ref[keep])


def test_multi_device_matches_single(workload):
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    from shark_tpu.parallel.data_parallel import DataParallelClassifier

    _, reads, index, _ = workload
    L = 128
    B = 296  # divisible by 8
    codes = np.full((B, L), 4, dtype=np.uint8)
    for i in range(B):
        r = reads[i % len(reads)]
        codes[i, : len(r)] = encode_bytes(r)

    single = Classifier(index, max_winners=24)
    multi = DataParallelClassifier(index, max_winners=24, n_devices=8)
    ref = [np.asarray(x) for x in single(codes)]
    got = [np.asarray(x) for x in multi(codes)]
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a, b)

    # packed-input path over the mesh must agree too
    L4, L8 = L // 4, L // 8
    packed = np.zeros((B, L4), dtype=np.uint8)
    vmask = np.zeros((B, L8), dtype=np.uint8)
    for i in range(L):  # planar layout (see unpack_codes)
        c = codes[:, i]
        v = c < 4
        packed[:, i % L4] |= np.where(v, c, 0).astype(np.uint8) << (
            2 * (i // L4)
        )
        vmask[:, i % L8] |= v.astype(np.uint8) << (i // L8)
    got_p = [np.asarray(x) for x in multi.call_packed(packed, vmask)]
    for a, b in zip(ref, got_p):
        np.testing.assert_array_equal(a, b)


def test_multi_device_xl_matches_single(workload):
    """The GB-scale xl layout over the 8-device mesh, with a pinned
    spill-forcing geometry so the side-table compaction/cond executes
    multi-device (auto geometry has no spills at this scale): full
    output equality against the single-device xl classifier, both wire
    formats."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    from shark_tpu.classify import hashed as H
    from shark_tpu.parallel.data_parallel import DataParallelClassifier

    _, reads, index, _ = workload
    L = 128
    B = 296
    codes = np.full((B, L), 4, dtype=np.uint8)
    for i in range(B):
        r = reads[i % len(reads)]
        codes[i, : len(r)] = encode_bytes(r)

    forced = H.build_hashed_xl(index, lgB=10)  # tight: forces spills
    assert forced is not None and forced[3].has_side, "no side spills"
    orig = H.build_hashed_xl
    H.build_hashed_xl = lambda ix, **kw: forced
    try:
        single = Classifier(index, max_winners=24, probe="xl")
        multi = DataParallelClassifier(
            index, max_winners=24, n_devices=8, probe="xl"
        )
    finally:
        H.build_hashed_xl = orig
    assert single.probe == multi.probe == "xl"
    ref = [np.asarray(x) for x in single(codes)]
    got = [np.asarray(x) for x in multi(codes)]
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a, b)
