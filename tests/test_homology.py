"""Multi-gene stress: genes with shared segments (homologs) force shared
k-mers, multi-winner ties, and deg>1 association rows through the whole
device path; verdicts must match the oracle exactly."""

import numpy as np
import pytest

from shark_tpu.classify.oracle import build_oracle_index, classify_read
from shark_tpu.classify.step import (
    PACK_EMIT_SHIFT,
    PACK_NW_BITS,
    PACK_NW_SHIFT,
    Classifier,
)
from shark_tpu.index.build import build_index
from shark_tpu.ops.kmers import encode_bytes

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
K = 15
SIZE_BITS = 1 << 20


@pytest.fixture(scope="module")
def homolog_workload():
    rng = np.random.default_rng(99)
    # gene families: 10 families x 4 members sharing a 150bp core
    records = []
    for fam in range(10):
        core = BASES[rng.integers(0, 4, size=150)]
        for m in range(4):
            left = BASES[rng.integers(0, 4, size=80)]
            right = BASES[rng.integers(0, 4, size=80)]
            seq = np.concatenate([left, core, right])
            records.append((f"F{fam}M{m}", seq.tobytes()))
    index = build_index(records, K, SIZE_BITS)
    oracle = build_oracle_index(records, K, SIZE_BITS)
    # reads straddling core/flank boundaries -> shared AND unique k-mers
    reads = []
    for _ in range(400):
        _, seq = records[rng.integers(0, len(records))]
        start = int(rng.integers(0, len(seq) - 90))
        reads.append(seq[start : start + 90])
    return index, oracle, reads


def test_homolog_ties_match_oracle(homolog_workload):
    index, oracle, reads = homolog_workload
    assert index.max_degree >= 4  # the shared cores must really share
    L = 128
    codes = np.full((len(reads), L), 4, dtype=np.uint8)
    for i, r in enumerate(reads):
        codes[i, : len(r)] = encode_bytes(r)
    clf = Classifier(index, max_winners=8, c=0.6)
    packed, winners, best_cov, length = (np.asarray(x) for x in clf(codes))
    nw = (packed >> PACK_NW_SHIFT) & ((1 << PACK_NW_BITS) - 1)
    emit = ((packed >> PACK_EMIT_SHIFT) & 1).astype(bool)

    n_multi = 0
    for i, r in enumerate(reads):
        want_w, want_cov, want_len = classify_read(
            oracle, encode_bytes(r), 0.6, False
        )
        got_emit = bool(emit[i]) and nw[i] > 0
        assert got_emit == bool(want_w), i
        if want_w:
            got = winners[i, : nw[i]].tolist()
            assert got == want_w, (i, got, want_w)
            n_multi += len(want_w) > 1
    assert n_multi > 10  # the workload must actually produce ties


def _high_degree_workload(n_members, rng_seed=7):
    """One family of n_members genes sharing a core: every core k-mer has
    degree n_members."""
    rng = np.random.default_rng(rng_seed)
    core = BASES[rng.integers(0, 4, size=200)]
    records = []
    for m in range(n_members):
        left = BASES[rng.integers(0, 4, size=60)]
        right = BASES[rng.integers(0, 4, size=60)]
        records.append(
            (f"M{m}", np.concatenate([left, core, right]).tobytes())
        )
    # distinct singleton genes so degree 1 dominates the histogram
    for g in range(40):
        records.append(
            (f"S{g}", BASES[rng.integers(0, 4, size=400)].tobytes())
        )
    index = build_index(records, K, SIZE_BITS)
    oracle = build_oracle_index(records, K, SIZE_BITS)
    reads = []
    for _ in range(200):
        _, seq = records[rng.integers(0, len(records))]
        start = int(rng.integers(0, len(seq) - 90))
        reads.append(seq[start : start + 90])
    return index, oracle, reads


@pytest.mark.parametrize("members", [12, 40])
def test_high_degree_rows_match_oracle(members):
    """Degree > 8 rows: wide-inline geometry (12-member family fits D=16)
    and the extension-table escape (40 members with the capped D=8 + ext
    geometry forced, as a budget-constrained index would get) must both
    match the oracle exactly — including the PACK_OVF host-recompute
    path."""
    import shark_tpu.classify.step as step
    from shark_tpu.config import SharkConfig
    from shark_tpu.pipeline import _winner_pairs

    index, oracle, reads = _high_degree_workload(members)
    assert index.max_degree >= members
    D, ext_w = step.index_geometry(index)
    if members > 16:
        # force the capped + extension geometry even though this tiny
        # index would fit wide rows (the single-chip kernels read the
        # compacted deg>=3 geometry, _row_geometry3)
        index.__dict__["_row_geometry"] = (8, 64)
        index.__dict__["_row_geometry3"] = (8, 64)
        D, ext_w = 8, 64
        assert int(np.count_nonzero(np.diff(index.offsets) > 8)) > 0
    L = 128
    codes = np.full((len(reads), L), 4, dtype=np.uint8)
    for i, r in enumerate(reads):
        codes[i, : len(r)] = encode_bytes(r)
    clf = Classifier(index, max_winners=24, c=0.6)
    if ext_w:
        assert clf.dix.ext_mat is not None
    result = clf(codes)
    cfg = SharkConfig(fasta_path="x", sample1_path="y")
    ri, gi = _winner_pairs(cfg, index, result, len(reads), codes, 24)
    want_r, want_g = [], []
    for i, r in enumerate(reads):
        wins, _, _ = classify_read(oracle, encode_bytes(r), 0.6, False)
        want_r.extend([i] * len(wins))
        want_g.extend(wins)
    assert ri.tolist() == want_r
    assert gi.tolist() == want_g


def test_wide_family_panel_matches_oracle():
    """A 100-member family (degree ~100 rows): the geometry must stay at
    the inline cap (D used to blow up to pow2(max_degree)=128, and the
    packed-cumsum 31-bit guard then crashed the kernel at trace time for
    any batch), with the over-cap tails routed through the extension
    table / host-recompute escape — verdicts exactly equal the oracle."""
    import shark_tpu.classify.step as step
    from shark_tpu.config import SharkConfig
    from shark_tpu.pipeline import _winner_pairs

    rng = np.random.default_rng(31)
    records = []
    for fam in range(3):
        core = BASES[rng.integers(0, 4, size=150)]
        for m in range(100):
            left = BASES[rng.integers(0, 4, size=40)]
            right = BASES[rng.integers(0, 4, size=40)]
            records.append(
                (
                    f"W{fam}M{m}",
                    np.concatenate([left, core, right]).tobytes(),
                )
            )
    index = build_index(records, K, SIZE_BITS)
    assert index.max_degree >= 100
    for geom in (step.index_geometry(index), step.index_geometry3(index)):
        assert geom[0] <= step.GENE_D_CHOICES[-1]
    oracle = build_oracle_index(records, K, SIZE_BITS)
    reads = []
    for _ in range(120):
        _, seq = records[rng.integers(0, len(records))]
        start = int(rng.integers(0, len(seq) - 90))
        reads.append(seq[start : start + 90])
    L = 128
    codes = np.full((len(reads), L), 4, dtype=np.uint8)
    for i, r in enumerate(reads):
        codes[i, : len(r)] = encode_bytes(r)
    clf = Classifier(index, max_winners=8, c=0.6)
    result = clf(codes)  # pre-fix: AssertionError at jit trace
    cfg = SharkConfig(fasta_path="x", sample1_path="y")
    ri, gi = _winner_pairs(cfg, index, result, len(reads), codes, 8)
    want_r, want_g = [], []
    n_multi = 0
    for i, r in enumerate(reads):
        wins, _, _ = classify_read(oracle, encode_bytes(r), 0.6, False)
        want_r.extend([i] * len(wins))
        want_g.extend(wins)
        n_multi += len(wins) > 8
    assert n_multi > 5  # 100-way ties must exercise the overflow redo
    assert ri.tolist() == want_r
    assert gi.tolist() == want_g


def test_finish_from_keys_wide_fallback_matches_packed():
    """Key widths past the packed-cumsum 31-bit budget take the unpacked
    two-cumsum fallback; padding a narrow key matrix with sentinels into
    the fallback regime must leave every verdict bit-identical."""
    from shark_tpu.classify.step import (
        StaticMeta,
        emit_threshold_table,
        finish_from_keys,
    )

    rng = np.random.default_rng(3)
    G, pos_bits, L, k = 8, 7, 100, 31
    meta = StaticMeta(
        k=k, size_bits=1 << 20, n_genes=G, degree=1, pos_bits=pos_bits,
        ext_w=0, degree3=1, ext3_w=0,
    )
    B, narrow = 5, 64
    sentinel = np.uint32(G << pos_bits)
    keys = np.full((B, narrow), sentinel, dtype=np.uint32)
    for b in range(B):
        for g in rng.choice(G, size=3, replace=False):
            pos = np.sort(
                rng.choice(np.arange(k, L), size=int(rng.integers(1, 9)),
                           replace=False)
            )
            for j, p in enumerate(pos):
                keys[b, rng.integers(0, narrow)] = np.uint32(
                    (int(g) << pos_bits) | int(p)
                )
    length = np.full(B, L, dtype=np.int32)
    row_ovf = np.zeros(B, dtype=bool)
    thresh = emit_threshold_table(0.6, L)

    import jax.numpy as jnp

    def run(key_mat):
        out = finish_from_keys(
            jnp.asarray(key_mat), jnp.asarray(length), thresh,
            jnp.asarray(row_ovf), meta=meta, max_winners=4, L=L,
        )
        return [np.asarray(o) for o in out]

    # width 12288: HB=14, k*width = 368640 >= 2^17 -> unpacked fallback
    wide = np.full((B, 12288), sentinel, dtype=np.uint32)
    wide[:, : keys.shape[1]] = keys
    got_narrow = run(keys)
    got_wide = run(wide)
    for a, b in zip(got_narrow, got_wide):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("members", [12, 40])
def test_row_compaction_light_batch(members):
    """Batches where every read has <= ROW_CAP deg>=3 windows take the
    COMPACTED row branch of finish_from_tags (sort width 2*Ls+D3*ROW_CAP);
    verdicts must match the oracle exactly, including rows resolved
    through the extension table (forced capped geometry)."""
    import shark_tpu.classify.step as step
    from shark_tpu.config import SharkConfig
    from shark_tpu.pipeline import _winner_pairs

    index, oracle, _ = _high_degree_workload(members)
    if members > 16:
        index.__dict__["_row_geometry"] = (8, 64)
        index.__dict__["_row_geometry3"] = (8, 64)
    meta = step.StaticMeta.for_index(index, 128)
    assert meta.degree3 >= step.ROW_COMPACT_MIN_D  # cond path compiled

    # reconstruct member 0's sequence (same rng replay as the generator);
    # reads ending o bases into the core have max(0, o-K+1) deg>=members
    # windows — keep every read at <= ROW_CAP row windows so the whole
    # batch takes the compact branch
    rng3 = np.random.default_rng(7)
    core3 = BASES[rng3.integers(0, 4, size=200)]
    left3 = BASES[rng3.integers(0, 4, size=60)]
    right3 = BASES[rng3.integers(0, 4, size=60)]
    member_seq = np.concatenate([left3, core3, right3]).tobytes()

    reads = []
    for o in range(1, 25):  # end o bases into the core (o-K+1 core k-mers)
        end = 60 + o
        reads.append(member_seq[max(0, end - 90) : end])
    for s in range(8):  # fully-flank reads: zero row windows
        reads.append(member_seq[s : s + 40])
    # o <= 24 with K=15 -> at most 10 core (deg>=3) windows per read, and
    # the o=24 read has 10 > 0 of them, so the compact branch really runs
    assert max(0, 24 - K + 1) <= step.ROW_CAP

    L = 128
    codes = np.full((len(reads), L), 4, dtype=np.uint8)
    for i, r in enumerate(reads):
        codes[i, : len(r)] = encode_bytes(r)
    clf = Classifier(index, max_winners=24, c=0.6)
    result = clf(codes)
    cfg = SharkConfig(fasta_path="x", sample1_path="y")
    ri, gi = _winner_pairs(cfg, index, result, len(reads), codes, 24)
    want_r, want_g = [], []
    for i, r in enumerate(reads):
        wins, _, _ = classify_read(oracle, encode_bytes(r), 0.6, False)
        want_r.extend([i] * len(wins))
        want_g.extend(wins)
    assert ri.tolist() == want_r
    assert gi.tolist() == want_g


def test_wide_rows_light_and_full_branches():
    """Wide ext-free rows3 geometry (degree3=16, the transcriptome shape):
    a batch where every read has <= ROW_CAP deg>=3 windows takes the
    compacted-columns branch; a batch with a deep-core read takes the
    full-width fallback — both must match the oracle exactly."""
    import shark_tpu.classify.step as step
    from shark_tpu.config import SharkConfig
    from shark_tpu.pipeline import _winner_pairs

    rng = np.random.default_rng(21)
    records = []
    coreA = BASES[rng.integers(0, 4, size=200)]  # deg-8 family (common)
    for m in range(8):
        left = BASES[rng.integers(0, 4, size=60)]
        right = BASES[rng.integers(0, 4, size=60)]
        records.append(
            (f"A{m}", np.concatenate([left, coreA, right]).tobytes())
        )
    coreB = BASES[rng.integers(0, 4, size=60)]  # deg-12 region (rare tail)
    for m in range(12):
        left = BASES[rng.integers(0, 4, size=130)]
        right = BASES[rng.integers(0, 4, size=130)]
        records.append(
            (f"B{m}", np.concatenate([left, coreB, right]).tobytes())
        )
    for g in range(40):
        records.append(
            (f"S{g}", BASES[rng.integers(0, 4, size=400)].tobytes())
        )
    index = build_index(records, K, SIZE_BITS)
    oracle = build_oracle_index(records, K, SIZE_BITS)
    # force the wide ext-free geometry a transcriptome-scale histogram
    # would produce (the tiny test index caps to 8+ext instead)
    index.__dict__["_row_geometry3"] = (16, 0)
    meta = step.StaticMeta.for_index(index, 128)
    assert meta.degree3 == 16 and meta.ext3_w == 0

    b_seq = records[8][1]  # B0: 130 left + 60 core + 130 right
    a_seq = records[0][1]
    # batch 1: reads ending o bases into coreB have o-K+1 <= 16 deg>=3
    # windows -> the whole batch takes the compacted-columns branch
    batch1 = []
    for o in range(K, K + 16):
        end = 130 + o
        batch1.append(b_seq[end - 90 : end])
    # batch 2: a deep coreA read has 90-K+1 = 76 > ROW_CAP row windows ->
    # the whole batch takes the full-width fallback
    batch2 = [b_seq[115 : 115 + 90], a_seq[60:150], b_seq[:90]]

    clf = Classifier(index, max_winners=24, c=0.6)
    cfg = SharkConfig(fasta_path="x", sample1_path="y")
    for reads in (batch1, batch2):
        L = 128
        codes = np.full((len(reads), L), 4, dtype=np.uint8)
        for i, r in enumerate(reads):
            codes[i, : len(r)] = encode_bytes(r)
        result = clf(codes)
        ri, gi = _winner_pairs(cfg, index, result, len(reads), codes, 24)
        want_r, want_g = [], []
        for i, r in enumerate(reads):
            wins, _, _ = classify_read(oracle, encode_bytes(r), 0.6, False)
            want_r.extend([i] * len(wins))
            want_g.extend(wins)
        assert ri.tolist() == want_r
        assert gi.tolist() == want_g


def _pair_workload(rng_seed=7):
    """10 families of TWO members sharing a 150bp core: core reads tie
    across exactly two genes through the degree-2 DIRECT path (TAG_D2),
    which is the tie shape that still rides the winner-pair stream now
    that deg>=3 whole-set ties take the group fast path (PACK_GRP) and
    never enter the stream."""
    rng = np.random.default_rng(rng_seed)
    records = []
    for fam in range(10):
        core = BASES[rng.integers(0, 4, size=150)]
        for m in range(2):
            left = BASES[rng.integers(0, 4, size=80)]
            right = BASES[rng.integers(0, 4, size=80)]
            records.append(
                (f"P{fam}M{m}", np.concatenate([left, core, right]).tobytes())
            )
    index = build_index(records, K, SIZE_BITS)
    oracle = build_oracle_index(records, K, SIZE_BITS)
    reads = []
    for _ in range(300):
        _, seq = records[rng.integers(0, len(records))]
        start = int(rng.integers(80, 230 - 90))  # inside the core: a tie
        reads.append(seq[start : start + 90])
    return index, oracle, reads


def test_extra_pair_stream_and_fallback():
    """The compacted extra-winner pair fetch (pipeline._winner_pairs fast
    path) and its truncation fallback must both reproduce the oracle's
    association list exactly."""
    from shark_tpu.classify.step import PAIR_SENTINEL, extract_pairs
    from shark_tpu.config import SharkConfig
    from shark_tpu.pipeline import _winner_pairs

    index, oracle, reads = _pair_workload()
    rng = np.random.default_rng(7)
    core_reads = []
    for _ in range(16):
        idx = int(rng.integers(0, len(reads)))
        core_reads.append(reads[idx])
    L = 128
    codes = np.full((len(core_reads), L), 4, dtype=np.uint8)
    for i, r in enumerate(core_reads):
        codes[i, : len(r)] = encode_bytes(r)
    clf = Classifier(index, max_winners=8, c=0.6)
    result = clf(codes)

    # the device pair stream is truncated to cap and sentinel-padded
    pairs = np.asarray(extract_pairs(result[0], result[1], 128))
    assert pairs.shape[0] == 128

    cfg = SharkConfig(fasta_path="x", sample1_path="y")
    ri, gi = _winner_pairs(cfg, index, result, len(core_reads), codes, 8)
    want_r, want_g = [], []
    for i, r in enumerate(core_reads):
        wins, _, _ = classify_read(oracle, encode_bytes(r), 0.6, False)
        want_r.extend([i] * len(wins))
        want_g.extend(wins)
    assert ri.tolist() == want_r
    assert gi.tolist() == want_g
    # this workload must actually have ties (extras in the stream)
    assert int((pairs != PAIR_SENTINEL).sum()) > 0


def test_winner_pairs_speculative_stream():
    """A speculative pre-dispatched pair stream (pipeline speculation path)
    must give identical associations to the exact-cap recompute, an
    undersized speculation must be ignored, and spec_state must report a
    capacity the main loop can speculate with."""
    from shark_tpu.classify.step import extract_pairs
    from shark_tpu.config import SharkConfig
    from shark_tpu.pipeline import _winner_pairs

    index, oracle, reads = _pair_workload(11)
    rng = np.random.default_rng(11)
    batch = [reads[int(rng.integers(0, len(reads)))] for _ in range(32)]
    L = 128
    codes = np.full((len(batch), L), 4, dtype=np.uint8)
    for i, r in enumerate(batch):
        codes[i, : len(r)] = encode_bytes(r)
    clf = Classifier(index, max_winners=8, c=0.6)
    result = clf(codes)
    cfg = SharkConfig(fasta_path="x", sample1_path="y")

    spec_state = {"cap": 0}
    ri0, gi0 = _winner_pairs(
        cfg, index, result, len(batch), codes, 8, spec_state=spec_state
    )
    cap = spec_state["cap"]
    assert cap > 0  # tie-heavy workload must engage the stream path

    sp = extract_pairs(result[0], result[1], cap)
    ri1, gi1 = _winner_pairs(
        cfg, index, result, len(batch), codes, 8, spec=(sp, cap),
        spec_state=spec_state,
    )
    np.testing.assert_array_equal(ri0, ri1)
    np.testing.assert_array_equal(gi0, gi1)

    # a lying cap (too small for this batch) must be ignored, not trusted
    ri2, gi2 = _winner_pairs(
        cfg, index, result, len(batch), codes, 8, spec=(sp, 1),
        spec_state=spec_state,
    )
    np.testing.assert_array_equal(ri0, ri2)
    np.testing.assert_array_equal(gi0, gi2)


def test_pair_sentinel_collision_boundary():
    """The legitimate association (row 65535, gene 65535) encodes to
    0xFFFFFFFF == PAIR_SENTINEL in the winner-pair stream. At the
    reference's full capacity (65536 genes, bloomfilter.h:45) and a full
    65536-read batch it must still be emitted — the host reconstructs the
    stream by exact count, not by sentinel filtering."""
    from shark_tpu.config import SharkConfig
    from shark_tpu.pipeline import _winner_pairs

    K2 = 15
    # 65536 genes: all but the last two are shorter than k (no k-mers, but
    # they consume gene ids, main.cpp:186); genes 65534 and 65535 are
    # identical so the read ties across both and takes the stream path
    rng = np.random.default_rng(3)
    seq = BASES[rng.integers(0, 4, size=64)].tobytes()
    records = [(f"g{i}", b"A") for i in range(65534)]
    records += [("g65534", seq), ("g65535", seq)]
    index = build_index(records, K2, 1 << 18)

    B, L = 65536, 64
    codes = np.full((B, L), 4, dtype=np.uint8)
    codes[65535, :] = encode_bytes(seq)
    clf = Classifier(index, max_winners=8, c=0.6)
    result = clf(codes)

    cfg = SharkConfig(fasta_path="x", sample1_path="y")
    ri, gi = _winner_pairs(cfg, index, result, B, codes, 8)
    assert ri.tolist() == [65535, 65535]
    assert gi.tolist() == [65534, 65535]


def test_native_tie_pipeline_speculation(homolog_workload, tmp_path):
    """Tie-heavy sample through the NATIVE engine (_run_native drain +
    speculative pair extraction across batches): outputs must equal the
    Python-path pipeline byte for byte."""
    from shark_tpu.config import SharkConfig
    from shark_tpu.io import native
    from shark_tpu.pipeline import run_pipeline

    if not native.available():
        pytest.skip("native engine unavailable")
    index, oracle, reads = homolog_workload
    fa = tmp_path / "genes.fa"
    # rebuild the fixture records from the oracle's gene list is not
    # possible; regenerate the same family workload deterministically
    rng = np.random.default_rng(99)
    records = []
    with open(fa, "wb") as f:
        for fam in range(10):
            core = BASES[rng.integers(0, 4, size=150)]
            for m in range(4):
                left = BASES[rng.integers(0, 4, size=80)]
                right = BASES[rng.integers(0, 4, size=80)]
                seq = np.concatenate([left, core, right]).tobytes()
                records.append((f"F{fam}M{m}", seq))
                f.write(b">F%dM%d\n" % (fam, m) + seq + b"\n")
    fq = tmp_path / "reads.fq"
    with open(fq, "wb") as f:
        for i, r in enumerate(reads):
            f.write(b"@r%04d\n" % i + r + b"\n+\n" + b"I" * len(r) + b"\n")

    clf = Classifier(index, max_winners=16, c=0.6)

    def run(native_on, tag):
        cfg = SharkConfig(
            fasta_path=str(fa),
            sample1_path=str(fq),
            out1_path=str(tmp_path / f"{tag}.fq"),
            ssv_path=str(tmp_path / f"{tag}.ssv"),
            k=K,
            c=0.6,
            batch_size=128,  # many batches -> speculation engages
            max_read_len=128 if native_on else 0,
            use_native=native_on,
        )
        stats = run_pipeline(cfg, classifier=clf)
        assert stats.get("native", False) == native_on
        return stats

    s_nat = run(True, "nat")
    s_py = run(False, "py")
    assert s_nat["n_associations"] == s_py["n_associations"]
    assert (tmp_path / "nat.ssv").read_bytes() == (
        tmp_path / "py.ssv"
    ).read_bytes()
    assert (tmp_path / "nat.fq").read_bytes() == (
        tmp_path / "py.fq"
    ).read_bytes()


def test_single_mode_suppresses_ties(homolog_workload):
    """--single must emit only unique-winner reads (ReadAnalyzer.hpp:105)."""
    import io

    from shark_tpu.config import SharkConfig
    from shark_tpu.io.encode import ReadBatch
    from shark_tpu.io.writer import OutputWriter
    from shark_tpu.pipeline import _drain

    index, oracle, reads = homolog_workload
    L = 128
    codes = np.full((len(reads), L), 4, dtype=np.uint8)
    recs = []
    for i, r in enumerate(reads):
        codes[i, : len(r)] = encode_bytes(r)
        recs.append((f"r{i}", r, b"I" * len(r)))
    batch = ReadBatch(codes=codes, n=len(reads), ids=[r[0] for r in recs],
                      recs1=recs, recs2=None)
    clf = Classifier(index, max_winners=8, c=0.6)
    result = clf(codes)

    for single in (False, True):
        cfg = SharkConfig(fasta_path="x", sample1_path="y", single=single)
        ssv = io.StringIO()
        writer = OutputWriter(ssv, "")
        _drain(cfg, index, batch, result, writer, 8)
        got = ssv.getvalue().splitlines()
        want = []
        for i, r in enumerate(reads):
            wins, _, _ = classify_read(oracle, encode_bytes(r), 0.6, single)
            want.extend(f"r{i} {oracle.gene_names[g]}" for g in wins)
        assert got == want, f"single={single}"
    # sanity: single mode must actually remove some associations here
    assert len(ssv.getvalue().splitlines()) > 0
