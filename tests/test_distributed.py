"""Multi-host helpers + pipeline-level data parallelism on the CPU mesh."""

import io

import numpy as np
import pytest

from shark_tpu.parallel.distributed import assign_files, merge_outputs


def test_assign_files_round_robin():
    pairs = [(f"a{i}.fq", f"b{i}.fq") for i in range(7)]
    out = assign_files(pairs, 3)
    assert [len(x) for x in out] == [3, 2, 2]
    assert out[0][0] == ("a0.fq", "b0.fq")
    assert out[1][0] == ("a1.fq", "b1.fq")
    # deterministic and disjoint-complete
    flat = [p for host in out for p in host]
    assert sorted(flat) == sorted(pairs)


def test_merge_outputs(tmp_path):
    parts = []
    for h in range(3):
        p = tmp_path / f"part{h}"
        p.write_bytes(f"host{h}\n".encode())
        parts.append(str(p))
    dest = tmp_path / "merged"
    merge_outputs(parts, str(dest))
    assert dest.read_bytes() == b"host0\nhost1\nhost2\n"


@pytest.mark.slow
def test_pipeline_data_parallel_golden(example_dir, tmp_path):
    """run_pipeline with --devices 8 on the CPU mesh: byte-exact truth."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from shark_tpu.config import SharkConfig
    from shark_tpu.pipeline import run_pipeline

    out1 = tmp_path / "dp1.fq"
    out2 = tmp_path / "dp2.fq"
    cfg = SharkConfig(
        fasta_path=str(example_dir / "ENSG00000277117.fa"),
        sample1_path=str(example_dir / "sample_1.fq"),
        sample2_path=str(example_dir / "sample_2.fq"),
        out1_path=str(out1),
        out2_path=str(out2),
        batch_size=1024,
        devices=8,
    )
    ssv = io.StringIO()
    stats = run_pipeline(cfg, ssv_stream=ssv)
    assert stats["n_reads"] == 5000
    assert ssv.getvalue().encode() == (
        example_dir / "ENSG00000277117.truth.ssv"
    ).read_bytes()
    assert out1.read_bytes() == (
        example_dir / "sharked.sample_1.truth.fq"
    ).read_bytes()
