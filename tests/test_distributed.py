"""Multi-host helpers + pipeline-level data parallelism on the CPU mesh,
including a REAL 2-process jax.distributed run through the CLI."""

import io
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from shark_tpu.parallel.distributed import (
    assign_files,
    host_suffixed,
    merge_outputs,
    merge_parts,
)


def test_assign_files_round_robin():
    pairs = [(f"a{i}.fq", f"b{i}.fq") for i in range(7)]
    out = assign_files(pairs, 3)
    assert [len(x) for x in out] == [3, 2, 2]
    assert out[0][0] == (0, ("a0.fq", "b0.fq"))
    assert out[1][0] == (1, ("a1.fq", "b1.fq"))
    assert out[0][1] == (3, ("a3.fq", "b3.fq"))
    # deterministic and disjoint-complete, with global indices preserved
    flat = sorted(p for host in out for p in host)
    assert flat == list(enumerate(pairs))


def test_host_suffixed():
    assert host_suffixed("out.ssv", 0) == "out.ssv.0"
    assert host_suffixed("x.fq.gz", 3) == "x.fq.3.gz"
    assert host_suffixed("x.fq.gz", "part7") == "x.fq.part7.gz"


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
def test_run_files_per_pair_parts_and_merge(example_dir, tmp_path):
    """Multi-file-per-host recipe: one part per file PAIR (no overwrite),
    merged in GLOBAL index order == single-host order. Two hosts, three
    pairs round-robin — host 0 gets pairs {0, 2}, host 1 gets {1}."""
    from shark_tpu.config import SharkConfig
    from shark_tpu.parallel.distributed import run_files

    # split the example sample into 3 file pairs
    lines1 = (example_dir / "sample_1.fq").read_bytes().splitlines(True)
    lines2 = (example_dir / "sample_2.fq").read_bytes().splitlines(True)
    pairs = []
    cuts = [(0, 1600), (1600, 8000), (8000, 20000)]
    for i, (lo, hi) in enumerate(cuts):
        f1 = tmp_path / f"s1_{i}.fq"
        f2 = tmp_path / f"s2_{i}.fq"
        f1.write_bytes(b"".join(lines1[lo:hi]))
        f2.write_bytes(b"".join(lines2[lo:hi]))
        pairs.append((str(f1), str(f2)))

    base = SharkConfig(
        fasta_path=str(example_dir / "ENSG00000277117.fa"),
        sample1_path="",  # per-pair, set by run_files
        bf_gb=1,
        batch_size=1024,
        max_read_len=256,
        ssv_path=str(tmp_path / "out.ssv"),
        out1_path=str(tmp_path / "out1.fq"),
        out2_path=str(tmp_path / "out2.fq"),
    )
    for host in (0, 1):
        from dataclasses import replace

        run_files(replace(base), pairs, host, 2)

    for path in ("out.ssv", "out1.fq", "out2.fq"):
        merge_parts(str(tmp_path / path), len(pairs))
    got = (tmp_path / "out.ssv").read_bytes()
    want = (example_dir / "ENSG00000277117.truth.ssv").read_bytes()
    assert got == want
    assert (tmp_path / "out1.fq").read_bytes() == (
        example_dir / "sharked.sample_1.truth.fq"
    ).read_bytes()
    assert (tmp_path / "out2.fq").read_bytes() == (
        example_dir / "sharked.sample_2.truth.fq"
    ).read_bytes()


@pytest.mark.slow
def test_two_process_jax_distributed_cli(example_dir, tmp_path):
    """SURVEY §4 multi-host-without-a-cluster: two real OS processes join
    one jax.distributed runtime via the CLI's --coordinator/--num-hosts/
    --host-id flags on the CPU backend, each classifies half the sample,
    and the merged per-host outputs are byte-identical to the truth."""
    lines1 = (example_dir / "sample_1.fq").read_bytes().splitlines(True)
    lines2 = (example_dir / "sample_2.fq").read_bytes().splitlines(True)
    halves = []
    for h, (lo, hi) in enumerate([(0, 10000), (10000, 20000)]):
        f1 = tmp_path / f"h{h}_1.fq"
        f2 = tmp_path / f"h{h}_2.fq"
        f1.write_bytes(b"".join(lines1[lo:hi]))
        f2.write_bytes(b"".join(lines2[lo:hi]))
        halves.append((str(f1), str(f2)))

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    # the package is run from the source tree, not installed: the child
    # processes need the repo root on their import path
    import os

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")

    procs = []
    for h in range(2):
        out_ssv = tmp_path / "out.ssv"
        cmd = [
            sys.executable, "-m", "shark_tpu",
            "-r", str(example_dir / "ENSG00000277117.fa"),
            "-1", halves[h][0], "-2", halves[h][1],
            "-o", str(tmp_path / "o1.fq"), "-p", str(tmp_path / "o2.fq"),
            "--ssv", str(out_ssv),
            "--backend", "cpu",
            "--batch-size", "1024", "--max-read-len", "256",
            "--coordinator", f"localhost:{port}",
            "--num-hosts", "2", "--host-id", str(h),
        ]
        procs.append(
            subprocess.Popen(
                cmd,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                cwd=str(tmp_path),
                env=env,
            )
        )
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, err.decode()[-2000:]

    # per-host parts carry the CLI's .{host_id} suffix; host order ==
    # file order here, so the merge reproduces the single-host output
    for name in ("out.ssv", "o1.fq", "o2.fq"):
        merge_outputs(
            [str(tmp_path / f"{name}.{h}") for h in range(2)],
            str(tmp_path / name),
        )
    assert (tmp_path / "out.ssv").read_bytes() == (
        example_dir / "ENSG00000277117.truth.ssv"
    ).read_bytes()
    assert (tmp_path / "o1.fq").read_bytes() == (
        example_dir / "sharked.sample_1.truth.fq"
    ).read_bytes()
    assert (tmp_path / "o2.fq").read_bytes() == (
        example_dir / "sharked.sample_2.truth.fq"
    ).read_bytes()


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
