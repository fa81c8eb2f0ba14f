"""Long-running end-to-end differential fuzz soak (round-closing gate).

Replays tests/test_e2e_fuzz.py's three-way differential (native-engine
device path vs Python device path vs --backend native C++ classify, all
against the oracle ssv) over many FRESH random seeds on the CPU backend.
Previous rounds closed with 134+ seeds / 0 failures; run this before
shipping a round.

Usage: python scripts/fuzz_soak.py [n_seeds=100] [start_seed=10000]
Prints one progress line per seed and a final summary; exits non-zero on
any failure (with the failing seed number for reproduction).
"""

import importlib.util
import os
import sys
import tempfile
import time
import traceback

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from shark_tpu.config import SharkConfig  # noqa: E402
from shark_tpu.io import native  # noqa: E402
from shark_tpu.pipeline import run_pipeline  # noqa: E402


def _load_fuzz_mod():
    spec = importlib.util.spec_from_file_location(
        "e2e_fuzz_mod", os.path.join(ROOT, "tests", "test_e2e_fuzz.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def run_seed(fuzz, seed: int, tmp) -> None:
    from pathlib import Path

    tmp_path = Path(tmp)
    rng = np.random.default_rng(seed)
    w = fuzz._random_workload(rng, tmp_path, seed)
    want = fuzz._oracle_ssv(w)
    probe = str(rng.choice(["auto", "classic", "xl"]))
    outs = {}
    for mode in ("native", "python", "host"):
        cfg = SharkConfig(
            fasta_path=str(w["fa"]),
            sample1_path=str(w["fq1"]),
            sample2_path=str(w["fq2"]) if w["fq2"] else "",
            out1_path=str(tmp_path / f"{mode}.1.fq"),
            out2_path=str(tmp_path / f"{mode}.2.fq") if w["fq2"] else "",
            ssv_path=str(tmp_path / f"{mode}.ssv"),
            k=w["k"],
            min_quality=w["minq"],
            batch_size=32,
            max_read_len=256,
            use_native=(mode != "python"),
            backend="native" if mode == "host" else "",
            probe=probe,
            threads=int(rng.integers(1, 4)) if mode == "host" else 1,
        )
        run_pipeline(cfg)
        outs[mode] = {
            "ssv": (tmp_path / f"{mode}.ssv").read_text(),
            "fq1": (tmp_path / f"{mode}.1.fq").read_bytes(),
            "fq2": (
                (tmp_path / f"{mode}.2.fq").read_bytes() if w["fq2"] else b""
            ),
        }
    for mode in outs:
        assert outs[mode]["ssv"] == want, f"{mode} ssv != oracle"
    for mode in ("python", "host"):
        assert outs[mode]["fq1"] == outs["native"]["fq1"], f"{mode} fq1"
        assert outs[mode]["fq2"] == outs["native"]["fq2"], f"{mode} fq2"


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    start = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
    if not native.available():
        print("native engine unavailable; soak needs all three modes")
        return 2
    fuzz = _load_fuzz_mod()
    t0 = time.time()
    fails = 0
    for i in range(n):
        seed = start + i
        with tempfile.TemporaryDirectory() as tmp:
            try:
                run_seed(fuzz, seed, tmp)
                print(
                    f"[soak] seed {seed} ok "
                    f"({i + 1}/{n}, {time.time() - t0:.0f}s)",
                    flush=True,
                )
            except Exception:
                fails += 1
                print(f"[soak] seed {seed} FAILED", flush=True)
                traceback.print_exc()
    print(
        f"[soak] done: {n} seeds, {fails} failures, "
        f"{time.time() - t0:.0f}s",
        flush=True,
    )
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
