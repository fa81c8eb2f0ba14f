"""Checkpoint/resume (native path): an interrupted run restarts from the
<ssv>.progress sidecar and the final outputs are byte-identical to an
uninterrupted run. Capability beyond the reference (SURVEY §5: no
checkpoint/recovery story there)."""

import json
import os

import pytest

from shark_tpu.config import SharkConfig
from shark_tpu.io import native
from shark_tpu.pipeline import (
    Classifier,
    _load_progress,
    load_or_build_index,
    run_pipeline,
)
from shark_tpu.utils.timers import PhaseTimer

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not native.available(), reason="native engine unavailable"
    ),
]

EX = "/root/reference/example"
BATCH = 512


def _cfg(d, **kw):
    os.makedirs(d, exist_ok=True)
    return SharkConfig(
        fasta_path=f"{EX}/ENSG00000277117.fa",
        sample1_path=f"{EX}/sample_1.fq",
        sample2_path=f"{EX}/sample_2.fq",
        out1_path=f"{d}/out1.fq",
        out2_path=f"{d}/out2.fq",
        ssv_path=f"{d}/out.ssv",
        batch_size=BATCH,
        max_read_len=208,
        **kw,
    )


def _read_outputs(d):
    return tuple(
        open(f"{d}/{f}", "rb").read() for f in ("out.ssv", "out1.fq", "out2.fq")
    )


def test_resume_after_injected_crash(tmp_path):
    full_dir = str(tmp_path / "full")
    res_dir = str(tmp_path / "res")

    cfg0 = _cfg(full_dir)
    index = load_or_build_index(cfg0, PhaseTimer())
    clf = Classifier(index, max_winners=cfg0.max_winners, c=cfg0.c)

    stats_full = run_pipeline(_cfg(full_dir), classifier=clf)
    want = _read_outputs(full_dir)
    assert stats_full["n_associations"] > 0

    # crash after 4 dispatched batches; the shutdown path drains everything
    # queued, so the checkpoint lands at exactly 4 * BATCH reads
    with pytest.raises(RuntimeError, match="injected"):
        run_pipeline(
            _cfg(res_dir, resume=True, fail_after_batches=4), classifier=clf
        )
    sidecar = f"{res_dir}/out.ssv.progress"
    st = json.load(open(sidecar))
    assert st["reads_done"] == 4 * BATCH
    # the interrupted outputs are a proper prefix (close() may have
    # flushed a bit past the checkpoint; resume truncates to it)
    got_partial = _read_outputs(res_dir)
    assert all(len(g) <= len(w) for g, w in zip(got_partial, want))

    stats = run_pipeline(_cfg(res_dir, resume=True), classifier=clf)
    assert stats["resumed_reads"] == 4 * BATCH
    assert not os.path.exists(sidecar)
    assert _read_outputs(res_dir) == want
    # whole-sample totals (resumed prefix folded in from the sidecar)
    assert stats["n_reads"] == stats_full["n_reads"]
    assert stats["n_associations"] == stats_full["n_associations"]
    assert stats["n_reads_out"] == stats_full["n_reads_out"]


def test_resume_fresh_run_with_flag_matches(tmp_path):
    """--resume with no checkpoint is a plain run that leaves no sidecar."""
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    cfg0 = _cfg(d1)
    index = load_or_build_index(cfg0, PhaseTimer())
    clf = Classifier(index, max_winners=cfg0.max_winners, c=cfg0.c)
    run_pipeline(_cfg(d1), classifier=clf)
    run_pipeline(_cfg(d2, resume=True), classifier=clf)
    assert not os.path.exists(f"{d2}/out.ssv.progress")
    assert _read_outputs(d1) == _read_outputs(d2)


def test_resume_rejects_mismatched_checkpoint(tmp_path):
    d = str(tmp_path / "x")
    cfg = _cfg(d, resume=True)
    sidecar = f"{d}/out.ssv.progress"
    json.dump(
        {"identity": {"k": 99}, "reads_done": 512, "offsets": [0, 0, 0]},
        open(sidecar, "w"),
    )
    with pytest.raises(ValueError, match="different"):
        _load_progress(sidecar, cfg)


def test_resume_requires_native_fixed_len(tmp_path):
    cfg = _cfg(str(tmp_path / "y"), resume=True)
    cfg.max_read_len = 0  # auto-length -> python path
    with pytest.raises(ValueError, match="resume requires"):
        run_pipeline(cfg)


def test_resume_rejects_gz_outputs(tmp_path):
    d = str(tmp_path / "z")
    cfg = _cfg(d, resume=True)
    cfg.out1_path += ".gz"
    with pytest.raises(ValueError, match="uncompressed"):
        run_pipeline(cfg)


def test_resume_through_group_path(tmp_path):
    """Crash + resume on a homolog-family workload: the group fast path
    (device GROUP verdicts, host expansion, ordered emit) must survive
    the checkpoint boundary byte-identically — the expansion merge and
    the resumed association counters both cross it."""
    import numpy as np

    rng = np.random.default_rng(777)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    k = 15
    genes, cores = [], []
    for fam in range(4):
        core = bases[rng.integers(0, 4, size=120)].tobytes()
        cores.append(core)
        for m in range(5):
            genes.append(
                (
                    f"F{fam}M{m}",
                    bases[rng.integers(0, 4, size=60)].tobytes()
                    + core
                    + bases[rng.integers(0, 4, size=60)].tobytes(),
                )
            )
    fa = tmp_path / "fam.fa"
    fa.write_bytes(
        b"".join(b">%s\n%s\n" % (n.encode(), s) for n, s in genes)
    )
    reads = []
    for i in range(240):
        if i % 2 == 0:
            core = cores[int(rng.integers(0, len(cores)))]
            st = int(rng.integers(0, len(core) - 60))
            reads.append(core[st : st + 60])
        else:
            _, gs = genes[int(rng.integers(0, len(genes)))]
            reads.append(gs[: 60])
    fq = tmp_path / "s.fq"
    fq.write_bytes(
        b"".join(
            b"@r%04d\n%s\n+\n%s\n" % (i, r, b"I" * len(r))
            for i, r in enumerate(reads)
        )
    )

    def cfg(d, **kw):
        os.makedirs(d, exist_ok=True)
        return SharkConfig(
            fasta_path=str(fa), sample1_path=str(fq),
            out1_path=f"{d}/out1.fq", ssv_path=f"{d}/out.ssv",
            k=k, batch_size=32, max_read_len=64, **kw,
        )

    full_dir, res_dir = str(tmp_path / "full"), str(tmp_path / "res")
    cfg0 = cfg(full_dir)
    index = load_or_build_index(cfg0, PhaseTimer())
    clf = Classifier(index, max_winners=8, c=cfg0.c)
    assert clf.groups is not None
    stats_full = run_pipeline(cfg(full_dir), classifier=clf)
    assert stats_full["group_rows"] > 50, "group path never engaged"

    with pytest.raises(RuntimeError, match="injected"):
        run_pipeline(
            cfg(res_dir, resume=True, fail_after_batches=3), classifier=clf
        )
    stats = run_pipeline(cfg(res_dir, resume=True), classifier=clf)
    assert stats["resumed_reads"] == 3 * 32
    assert stats["group_rows"] > 0  # groups engaged after the boundary too
    assert stats["n_associations"] == stats_full["n_associations"]
    for f in ("out.ssv", "out1.fq"):
        assert (
            open(f"{res_dir}/{f}", "rb").read()
            == open(f"{full_dir}/{f}", "rb").read()
        ), f
