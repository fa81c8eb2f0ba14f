"""End-to-end pipeline on the shipped example: byte-exact golden equality.

Reproduces the reference acceptance contract (README.md:54-69): defaults
k=17, c=0.6, b=1 GB, q=0, paired input, outputs must equal the truth files.
"""

import io

import pytest

from shark_tpu.config import SharkConfig
from shark_tpu.pipeline import run_pipeline


@pytest.mark.slow
def test_pipeline_golden(example_dir, tmp_path):
    out1 = tmp_path / "sharked.1.fq"
    out2 = tmp_path / "sharked.2.fq"
    cfg = SharkConfig(
        fasta_path=str(example_dir / "ENSG00000277117.fa"),
        sample1_path=str(example_dir / "sample_1.fq"),
        sample2_path=str(example_dir / "sample_2.fq"),
        out1_path=str(out1),
        out2_path=str(out2),
        batch_size=2048,
    )
    ssv = io.StringIO()
    stats = run_pipeline(cfg, ssv_stream=ssv)

    assert stats["n_reads"] == 5000
    truth_ssv = (example_dir / "ENSG00000277117.truth.ssv").read_bytes()
    assert ssv.getvalue().encode() == truth_ssv
    assert out1.read_bytes() == (
        example_dir / "sharked.sample_1.truth.fq"
    ).read_bytes()
    assert out2.read_bytes() == (
        example_dir / "sharked.sample_2.truth.fq"
    ).read_bytes()


def test_pipeline_single_end_matches_oracle(example_dir, tmp_path):
    """Single-end run (Python I/O path) vs the per-read oracle, small BF
    to exercise collisions."""
    import itertools

    from shark_tpu.classify.oracle import (
        build_oracle_index,
        classify_read,
        fuse_pair,
    )
    from shark_tpu.io.fastx import read_fasta, read_fastq

    sample = tmp_path / "sub.fq"
    with open(sample, "wb") as f:
        for name, seq, qual in itertools.islice(
            read_fastq(str(example_dir / "sample_1.fq")), 400
        ):
            f.write(b"@" + name.encode() + b"\n" + seq + b"\n+\n" + qual + b"\n")

    cfg = SharkConfig(
        fasta_path=str(example_dir / "ENSG00000277117.fa"),
        sample1_path=str(sample),
        out1_path=str(tmp_path / "out1.fq"),
        batch_size=128,
        min_quality=35,  # exercise quality masking end to end
    )
    # drive the batch/classify/drain machinery against a small filter
    # (2^22 bits) so the CPU run stays fast while forcing collisions
    cfg_bits = 1 << 22
    from shark_tpu.classify.step import Classifier
    from shark_tpu.index.build import build_index
    from shark_tpu.io.writer import OutputWriter
    from shark_tpu.pipeline import _batches, _drain

    index = build_index(
        read_fasta(cfg.fasta_path), cfg.k, cfg_bits
    )
    oracle = build_oracle_index(read_fasta(cfg.fasta_path), cfg.k, cfg_bits)
    clf = Classifier(index, max_winners=8, c=cfg.c)
    ssv = io.StringIO()
    writer = OutputWriter(ssv, "")
    for batch in _batches(cfg):
        _drain(cfg, index, batch, clf(batch.codes), writer, 8)
    writer.close()

    want_lines = []
    from shark_tpu.io.fastx import read_fastq_pairs

    for r1, _ in read_fastq_pairs(str(sample), None):
        codes = fuse_pair(r1, None, cfg.min_quality)
        wins, _, _ = classify_read(oracle, codes, cfg.c, cfg.single)
        for g in wins:
            want_lines.append(f"{r1[0]} {oracle.gene_names[g]}\n")
    assert ssv.getvalue() == "".join(want_lines)


@pytest.mark.slow
def test_background_index_save_via_pipeline(example_dir, tmp_path):
    """--save-index runs on a background thread overlapped with classify;
    the pipeline must still publish a complete, loadable index and a
    load-index rerun must reproduce the outputs byte-for-byte."""
    from shark_tpu.index.structure import SharkIndex

    idx_dir = tmp_path / "idx.d"

    def cfg(d, **kw):
        d.mkdir(exist_ok=True)
        return SharkConfig(
            fasta_path=str(example_dir / "ENSG00000277117.fa"),
            sample1_path=str(example_dir / "sample_1.fq"),
            out1_path=str(d / "out.fq"),
            ssv_path=str(d / "out.ssv"),
            batch_size=2048,
            max_read_len=104,
            **kw,
        )

    d1, d2 = tmp_path / "a", tmp_path / "b"
    run_pipeline(cfg(d1, save_index=str(idx_dir)))
    idx = SharkIndex.load(str(idx_dir))  # complete and loadable
    assert idx.k == 17
    run_pipeline(cfg(d2, load_index=str(idx_dir)))
    for f in ("out.ssv", "out.fq"):
        assert (d1 / f).read_bytes() == (d2 / f).read_bytes()


def test_index_save_load_roundtrip(example_dir, tmp_path):
    from shark_tpu.index.build import build_index
    from shark_tpu.index.structure import SharkIndex
    from shark_tpu.io.fastx import read_fasta
    import numpy as np

    idx = build_index(
        read_fasta(str(example_dir / "ENSG00000277117.fa")), 17, 1 << 20
    )
    for name in ("index.npz", "index.d"):  # archive and mmap-dir formats
        path = tmp_path / name
        idx.save(str(path))
        idx2 = SharkIndex.load(str(path))
        assert idx2.k == idx.k and idx2.size_bits == idx.size_bits
        assert idx2.gene_names == idx.gene_names
        for f in ("bf_words", "word_rank", "offsets", "gene_ids"):
            np.testing.assert_array_equal(getattr(idx, f), getattr(idx2, f))


def test_gzip_output_fastq(example_dir, tmp_path):
    """A .gz out path produces gzip-compressed FASTQ in both writers."""
    import gzip

    import numpy as np

    from shark_tpu.io.writer import OutputWriter

    rec = ("r1", b"ACGT", b"IIII")
    gz_path = tmp_path / "o.fq.gz"
    w = OutputWriter(io.StringIO(), str(gz_path))
    w.emit_read(["G"], rec, None)
    w.close()
    assert gzip.open(gz_path).read() == b"@r1\nACGT\n+\nIIII\n"

    from shark_tpu.io import native

    if native.available():
        fq = tmp_path / "in.fq"
        fq.write_bytes(b"@r1\nACGT\n+\nIIII\n")
        ns = native.NativeStream(str(fq), "", 8, 16, 0)
        ns.set_output(1, str(tmp_path / "n.ssv"), str(tmp_path / "n.fq.gz"), "")
        ns.register_genes(["G"])
        codes, slot, n = ns.next_batch()
        ns.emit(slot, np.array([0], np.int32), np.array([0], np.int32))
        ns.close()
        assert gzip.open(tmp_path / "n.fq.gz").read() == b"@r1\nACGT\n+\nIIII\n"
