"""CLI surface parity with the reference (argument_parser.hpp:29-174)."""

import pytest

from shark_tpu.cli import build_parser, config_from_args
from shark_tpu.config import SharkConfig


def _cfg(argv):
    return config_from_args(build_parser().parse_args(argv))


BASE = ["-r", "ref.fa", "-1", "s1.fq"]


def test_defaults_match_reference():
    cfg = _cfg(BASE)
    assert cfg.k == 17
    assert cfg.c == 0.6
    assert cfg.bf_gb == 1
    assert cfg.bf_bits == 1 << 33  # 1 "GB" unit = 2**33 bits
    assert cfg.min_quality == 0
    assert cfg.single is False
    assert cfg.threads == 1
    assert not cfg.paired


def test_output_defaults():
    cfg = _cfg(BASE + ["-2", "s2.fq"])
    cfg.finalize_outputs()
    assert cfg.out1_path == "sharked_sample.1"
    assert cfg.out2_path == "sharked_sample.2"
    assert cfg.paired

    cfg1 = _cfg(BASE)
    cfg1.finalize_outputs()
    assert cfg1.out1_path == "sharked_sample.1"
    assert cfg1.out2_path == ""


@pytest.mark.parametrize(
    "args,msg",
    [
        (dict(k=0), "k"),
        (dict(k=32), "k"),
        (dict(c=1.5), "c"),
        (dict(c=-0.1), "c"),
        (dict(min_quality=-1), "q"),
        (dict(threads=0), "thread"),
        (dict(bf_gb=0), "bf"),
    ],
)
def test_validation_rejects(args, msg):
    cfg = SharkConfig(fasta_path="r", sample1_path="s", **args)
    with pytest.raises(ValueError, match=msg):
        cfg.validate()


def test_resume_flag_plumbed():
    assert _cfg(BASE).resume is False
    cfg = _cfg(BASE + ["--resume", "--ssv", "o.ssv", "--max-read-len", "104"])
    assert cfg.resume is True
    assert cfg.ssv_path == "o.ssv"


def test_short_and_long_flags_agree():
    a = _cfg(BASE + ["-k", "21", "-c", "0.8", "-b", "2", "-q", "20", "-s", "-t", "4"])
    b = _cfg([
        "--reference", "ref.fa", "--sample1", "s1.fq",
        "--kmer-size", "21", "--confidence", "0.8", "--bf-size", "2",
        "--min-base-quality", "20", "--single", "--threads", "4",
    ])
    assert a == b
    assert a.bf_bits == 2 << 33


def test_missing_required_exits(capsys):
    with pytest.raises(SystemExit):
        build_parser().parse_args(["-r", "only_ref.fa"])


def test_multihost_flag_validation(capsys):
    from shark_tpu.cli import main

    # bad host id
    rc = main(BASE + ["--num-hosts", "2", "--host-id", "2"])
    assert rc == 1
    assert "host-id" in capsys.readouterr().err
    # multi-host without coordinator
    rc = main(BASE + ["--num-hosts", "2", "--host-id", "0"])
    assert rc == 1
    assert "coordinator" in capsys.readouterr().err


def test_stats_json_flag(tmp_path, capsys):
    """--stats-json writes one machine-readable JSON object with the run's
    counters (no reference analogue; observability extra)."""
    import json

    from shark_tpu.cli import main

    fa = tmp_path / "g.fa"
    core = b"ACGTTGCAAGGCTTAGCCGATTCAGGCATTCGA" * 3
    fa.write_bytes(b">g0\n" + core + b"\n")
    fq = tmp_path / "s.fq"
    fq.write_bytes(
        b"@r0\n" + core[:60] + b"\n+\n" + b"I" * 60 + b"\n"
        b"@r1\n" + b"T" * 60 + b"\n+\n" + b"I" * 60 + b"\n"
    )
    stats_path = tmp_path / "stats.json"
    rc = main([
        "-r", str(fa), "-1", str(fq),
        "-o", str(tmp_path / "o.fq"),
        "--ssv", str(tmp_path / "o.ssv"),
        "--stats-json", str(stats_path),
        "--backend", "cpu", "--batch-size", "64",
    ])
    capsys.readouterr()
    assert rc == 0
    st = json.loads(stats_path.read_text())
    assert st["n_reads"] == 2
    assert st["n_associations"] == 1  # only r0 maps to g0
    assert st["n_genes"] == 1
    assert st["reads_per_sec"] > 0
    ssv = (tmp_path / "o.ssv").read_text()
    assert ssv == "r0 g0\n"


def test_missing_input_file_fails_fast(tmp_path):
    from shark_tpu.pipeline import run_pipeline

    cfg = SharkConfig(
        fasta_path=str(tmp_path / "missing.fa"),
        sample1_path=str(tmp_path / "missing.fq"),
    )
    with pytest.raises(FileNotFoundError):
        run_pipeline(cfg)


def test_probe_flag():
    assert _cfg(BASE).probe == "auto"
    assert _cfg(BASE + ["--probe", "classic"]).probe == "classic"
    assert _cfg(BASE + ["--probe", "hashed"]).probe == "hashed"
    with pytest.raises(SystemExit):  # argparse choices reject unknowns
        _cfg(BASE + ["--probe", "fast"])
    with pytest.raises(ValueError, match="probe"):
        SharkConfig(probe="fast").validate()


def test_compile_cache_flag():
    from shark_tpu.cli import build_parser, config_from_args

    args = build_parser().parse_args(
        ["-r", "g.fa", "-1", "s.fq", "--compile-cache", "/tmp/x"]
    )
    assert config_from_args(args).compile_cache == "/tmp/x"
    args = build_parser().parse_args(
        ["-r", "g.fa", "-1", "s.fq", "--compile-cache", ""]
    )
    assert config_from_args(args).compile_cache == ""
    # default on
    args = build_parser().parse_args(["-r", "g.fa", "-1", "s.fq"])
    assert config_from_args(args).compile_cache
