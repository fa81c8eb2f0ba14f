"""The acceptance spec: the pure-host oracle must reproduce the reference's
shipped golden outputs byte-for-byte (README.md:54-69 contract: defaults
k=17, c=0.6, b=1 GB, q=0, paired)."""

import numpy as np
import pytest

from shark_tpu.classify.oracle import (
    build_oracle_index,
    classify_read,
    fuse_pair,
)
from shark_tpu.io.fastx import read_fasta, read_fastq_pairs

SIZE_BITS = 1 << 33  # default -b 1


@pytest.fixture(scope="module")
def oracle_index(example_dir):
    return build_oracle_index(
        read_fasta(str(example_dir / "ENSG00000277117.fa")), 17, SIZE_BITS
    )


def test_oracle_reproduces_truth(example_dir, oracle_index):
    truth_ssv = (example_dir / "ENSG00000277117.truth.ssv").read_bytes()
    truth_fq1 = (example_dir / "sharked.sample_1.truth.fq").read_bytes()
    truth_fq2 = (example_dir / "sharked.sample_2.truth.fq").read_bytes()

    ssv_lines = []
    fq1 = []
    fq2 = []
    for r1, r2 in read_fastq_pairs(
        str(example_dir / "sample_1.fq"), str(example_dir / "sample_2.fq")
    ):
        codes = fuse_pair(r1, r2, 0)
        winners, _, _ = classify_read(oracle_index, codes, 0.6, False)
        if winners:
            for g in winners:
                ssv_lines.append(f"{r1[0]} {oracle_index.gene_names[g]}\n")
            fq1.append(b"@" + r1[0].encode() + b"\n" + r1[1] + b"\n+\n" + r1[2] + b"\n")
            fq2.append(b"@" + r2[0].encode() + b"\n" + r2[1] + b"\n+\n" + r2[2] + b"\n")

    assert "".join(ssv_lines).encode() == truth_ssv
    assert b"".join(fq1) == truth_fq1
    assert b"".join(fq2) == truth_fq2
