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


def test_index_save_load_roundtrip(example_dir, tmp_path):
    from shark_tpu.index.build import build_index
    from shark_tpu.index.structure import SharkIndex
    from shark_tpu.io.fastx import read_fasta
    import numpy as np

    idx = build_index(
        read_fasta(str(example_dir / "ENSG00000277117.fa")), 17, 1 << 20
    )
    path = tmp_path / "index.npz"
    idx.save(str(path))
    idx2 = SharkIndex.load(str(path))
    assert idx2.k == idx.k and idx2.size_bits == idx.size_bits
    assert idx2.gene_names == idx.gene_names
    for f in ("bf_words", "word_rank", "offsets", "gene_ids"):
        np.testing.assert_array_equal(getattr(idx, f), getattr(idx2, f))
