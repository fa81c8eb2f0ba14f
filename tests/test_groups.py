"""Tie-heavy group fast path: device group verdicts + host expansion.

A read whose hits are all deg>=3 rows of ONE deduped gene set ties across
exactly that set (ReadAnalyzer.hpp:90-102); the kernel scores the set once
as a pseudo-gene and the host expands members via GeneGroups. These tests
pin (a) that the fast path actually engages (grp-flagged verdicts), (b)
bit-exact associations vs the oracle through the production host path for
pure / mixed / fallback-heavy batches, and (c) single-mode semantics.
"""

import numpy as np
import pytest

from shark_tpu.classify.oracle import build_oracle_index, classify_read
from shark_tpu.classify.step import (
    PACK_GRP_SHIFT,
    Classifier,
    group_info,
)
from shark_tpu.config import SharkConfig
from shark_tpu.index.build import build_index
from shark_tpu.ops.kmers import encode_bytes
from shark_tpu.pipeline import _winner_pairs

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
K = 15
SIZE_BITS = 1 << 26  # collision-light so purity is controlled by reads


@pytest.fixture(scope="module")
def family_workload():
    rng = np.random.default_rng(77)
    records = []
    for fam in range(8):
        core = BASES[rng.integers(0, 4, size=150)]
        for m in range(5):
            seq = np.concatenate(
                [
                    BASES[rng.integers(0, 4, size=100)],
                    core,
                    BASES[rng.integers(0, 4, size=100)],
                ]
            )
            records.append((f"F{fam}M{m}", seq.tobytes()))
    index = build_index(records, K, SIZE_BITS)
    oracle = build_oracle_index(records, K, SIZE_BITS)
    return records, index, oracle


def _encode(reads, L=96):
    codes = np.full((len(reads), L), 4, dtype=np.uint8)
    for i, r in enumerate(reads):
        codes[i, : len(r)] = encode_bytes(r)
    return codes


def _device(clf, codes):
    return tuple(np.asarray(x) for x in clf(codes))


def _oracle_pairs(oracle, reads, c, single):
    want_r, want_g = [], []
    for i, r in enumerate(reads):
        w, _, _ = classify_read(oracle, encode_bytes(r), c, single)
        want_r += [i] * len(w)
        want_g += w
    return np.asarray(want_r, np.int32), np.asarray(want_g, np.int32)


def _sample(rng, records, n, where):
    reads = []
    for _ in range(n):
        _, seq = records[rng.integers(0, len(records))]
        if where == "core":  # fully inside the shared core -> pure
            start = int(rng.integers(100, 250 - 90))
        elif where == "flank":  # member-specific -> direct-only
            start = int(rng.integers(0, 100 - 90))
        else:  # anywhere, incl. core-boundary straddlers -> impure
            start = int(rng.integers(0, len(seq) - 90))
        reads.append(seq[start : start + 90])
    return reads


def test_group_info_shape(family_workload):
    _, index, _ = family_workload
    gi = group_info(index)
    assert gi is not None
    gid, groups, rows_bits = gi
    assert groups.n_gids >= 8  # at least one set per family
    # family sets have 5 members each
    sizes = np.diff(groups.offsets)
    assert (sizes >= 3).all()
    assert (sizes == 5).sum() >= 8
    assert gid.max() < groups.n_gids


def test_pure_batch_group_verdicts(family_workload):
    records, index, oracle = family_workload
    rng = np.random.default_rng(1)
    reads = _sample(rng, records, 120, "core") + _sample(
        rng, records, 40, "flank"
    )
    codes = _encode(reads)
    clf = Classifier(index, max_winners=8, c=0.6)
    res = _device(clf, codes)
    grp = (res[0] >> PACK_GRP_SHIFT) & 1
    assert int(grp.sum()) >= 100, "group fast path did not engage"
    cfg = SharkConfig(c=0.6)
    ri, gi_ = _winner_pairs(
        cfg, index, res, len(reads), codes, 8, groups=clf.groups
    )
    want_r, want_g = _oracle_pairs(oracle, reads, 0.6, False)
    np.testing.assert_array_equal(ri, want_r)
    np.testing.assert_array_equal(gi_, want_g)


def test_mixed_batch_subfix_exact(family_workload):
    """Straddling reads (impure) within FIX_CAP ride the compacted
    sub-batch re-score; associations must equal the oracle exactly."""
    records, index, oracle = family_workload
    rng = np.random.default_rng(2)
    # 512 reads, FIX_CAP = max(64, 512//16) = 64: keep impure count under
    # it (~40 straddlers) so the group_fix branch is the one exercised
    reads = _sample(rng, records, 300, "core") + _sample(
        rng, records, 172, "flank"
    )
    for _ in range(40):
        _, seq = records[rng.integers(0, len(records))]
        start = int(rng.integers(30, 90))  # straddles flank/core boundary
        reads.append(seq[start : start + 90])
    codes = _encode(reads)
    clf = Classifier(index, max_winners=8, c=0.6)
    res = _device(clf, codes)
    grp = (res[0] >> PACK_GRP_SHIFT) & 1
    assert int(grp.sum()) >= 250  # pure reads still fast-pathed
    cfg = SharkConfig(c=0.6)
    ri, gi_ = _winner_pairs(
        cfg, index, res, len(reads), codes, 8, groups=clf.groups
    )
    want_r, want_g = _oracle_pairs(oracle, reads, 0.6, False)
    np.testing.assert_array_equal(ri, want_r)
    np.testing.assert_array_equal(gi_, want_g)


def test_subfix_force_full_flag_equality(family_workload):
    """The sub-batch recursion's cond-skip (step._SUBFIX_FORCE_FULL,
    default True since the r5 A/B) must be verdict-identical to the
    cond'd path on a mixed batch — it is the conds' own fallback branch,
    pinned here so a future cond refactor cannot silently diverge."""
    from shark_tpu.classify import step as step_mod

    records, index, _ = family_workload
    rng = np.random.default_rng(11)
    reads = _sample(rng, records, 200, "core") + _sample(
        rng, records, 100, "flank"
    )
    for _ in range(30):
        _, seq = records[rng.integers(0, len(records))]
        start = int(rng.integers(30, 90))
        reads.append(seq[start : start + 90])
    codes = _encode(reads)
    orig = step_mod._SUBFIX_FORCE_FULL
    try:
        step_mod._SUBFIX_FORCE_FULL = True
        res_full = _device(Classifier(index, max_winners=8, c=0.6), codes)
        step_mod._SUBFIX_FORCE_FULL = False
        res_cond = _device(Classifier(index, max_winners=8, c=0.6), codes)
    finally:
        step_mod._SUBFIX_FORCE_FULL = orig
    for a, b in zip(res_full, res_cond):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_heavy_fallback_when_over_cap(family_workload):
    """More impure reads than FIX_CAP -> the whole batch takes the exact
    heavy branch (no grp verdicts), still oracle-exact."""
    records, index, oracle = family_workload
    rng = np.random.default_rng(3)
    reads = []
    for _ in range(200):  # all straddlers; FIX_CAP = max(64, 200//16) = 64
        _, seq = records[rng.integers(0, len(records))]
        start = int(rng.integers(40, 80))
        reads.append(seq[start : start + 90])
    codes = _encode(reads)
    clf = Classifier(index, max_winners=8, c=0.6)
    res = _device(clf, codes)
    grp = (res[0] >> PACK_GRP_SHIFT) & 1
    assert int(grp.sum()) == 0  # fallback taken
    cfg = SharkConfig(c=0.6)
    ri, gi_ = _winner_pairs(
        cfg, index, res, len(reads), codes, 8, groups=clf.groups
    )
    want_r, want_g = _oracle_pairs(oracle, reads, 0.6, False)
    np.testing.assert_array_equal(ri, want_r)
    np.testing.assert_array_equal(gi_, want_g)


def test_single_mode_drops_groups(family_workload):
    """-s: a group verdict is >= 3 tied winners, never emitted."""
    records, index, oracle = family_workload
    rng = np.random.default_rng(4)
    reads = _sample(rng, records, 60, "core") + _sample(
        rng, records, 60, "flank"
    )
    codes = _encode(reads)
    clf = Classifier(index, max_winners=8, c=0.6)
    res = _device(clf, codes)
    cfg = SharkConfig(c=0.6, single=True)
    ri, gi_ = _winner_pairs(
        cfg, index, res, len(reads), codes, 8, groups=clf.groups
    )
    want_r, want_g = _oracle_pairs(oracle, reads, 0.6, True)
    np.testing.assert_array_equal(ri, want_r)
    np.testing.assert_array_equal(gi_, want_g)
    # core reads (ties) all dropped; flank reads survive
    assert ri.size > 0
    assert set(ri.tolist()).isdisjoint(range(60))


def test_group_vs_classic_and_xl_probe(family_workload):
    """All three probe layouts agree bit for bit on a group-heavy batch
    (the group branch lives in the shared finish; front-ends must feed it
    identical gid payloads)."""
    records, index, _ = family_workload
    rng = np.random.default_rng(5)
    reads = _sample(rng, records, 100, "core") + _sample(
        rng, records, 50, "any"
    )
    codes = _encode(reads)
    outs = {}
    for probe in ("classic", "hashed", "xl"):
        clf = Classifier(index, max_winners=8, c=0.6, probe=probe)
        outs[probe] = _device(clf, codes)
    for probe in ("hashed", "xl"):
        for name, a, b in zip(
            ("packed", "winners", "best_cov", "length"),
            outs["classic"],
            outs[probe],
        ):
            np.testing.assert_array_equal(a, b, err_msg=f"{probe}:{name}")


def test_mid_tier_subfix_exact(family_workload):
    """Impure count BETWEEN the two sub-batch tiers (FIX_CAP < n_fix <=
    FIX_CAP2): the second compacted re-score tier must engage — pure
    reads keep their group verdicts (so the full heavy branch was NOT
    taken) and associations equal the oracle exactly. At B=4096 the
    tiers are 64 and 256; 150 straddlers land between them. Guards the
    two-tier ladder the txome regression motivated (step.py FIX_DIV2)."""
    records, index, oracle = family_workload
    rng = np.random.default_rng(5)
    reads = _sample(rng, records, 2000, "core") + _sample(
        rng, records, 1946, "flank"
    )
    for _ in range(150):
        _, seq = records[rng.integers(0, len(records))]
        start = int(rng.integers(30, 90))  # straddles the boundary
        reads.append(seq[start : start + 90])
    assert len(reads) == 4096
    codes = _encode(reads)
    clf = Classifier(index, max_winners=8, c=0.6)
    res = _device(clf, codes)
    grp = (res[0] >> PACK_GRP_SHIFT) & 1
    assert int(grp.sum()) >= 1500, "tier-2 batch fell to the heavy branch"
    cfg = SharkConfig(c=0.6)
    ri, gi_ = _winner_pairs(
        cfg, index, res, len(reads), codes, 8, groups=clf.groups
    )
    want_r, want_g = _oracle_pairs(oracle, reads, 0.6, False)
    np.testing.assert_array_equal(ri, want_r)
    np.testing.assert_array_equal(gi_, want_g)


def test_impure_last_read_exact(family_workload):
    """An IMPURE read at the LAST batch index must get its re-scored
    verdict. The sub-batch scatter-back used clamped padding indices
    (min(sel, B-1)), and duplicate-index .at[].set is last-write-wins,
    so padding lanes (present whenever n_fix < FIX_CAP) overwrote read
    B-1's corrected verdict with its stale group verdict — emitting the
    pseudo-gene id n_genes. Regression for the mode='drop' fix; also
    checks position 0 (the always-correct control)."""
    records, index, oracle = family_workload
    rng = np.random.default_rng(9)
    for where in (-1, 0):
        reads = _sample(rng, records, 120, "core") + _sample(
            rng, records, 7, "flank"
        )
        # chimera across two different family cores: row hits with TWO
        # group ids -> need_fix
        _, s1 = records[0]
        _, s2 = records[39]  # a different family
        chimera = s1[110:155] + s2[110:155]
        if where == -1:
            reads.append(chimera)
        else:
            reads.insert(0, chimera)
        codes = _encode(reads)
        clf = Classifier(index, max_winners=8, c=0.6)
        res = _device(clf, codes)
        cfg = SharkConfig(c=0.6)
        ri, gi_ = _winner_pairs(
            cfg, index, res, len(reads), codes, 8, groups=clf.groups
        )
        want_r, want_g = _oracle_pairs(oracle, reads, 0.6, False)
        np.testing.assert_array_equal(ri, want_r, err_msg=f"where={where}")
        np.testing.assert_array_equal(gi_, want_g, err_msg=f"where={where}")
        assert (np.asarray(gi_) < index.n_genes).all()
