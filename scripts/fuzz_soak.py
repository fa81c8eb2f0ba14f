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

from shark_tpu.io import native  # noqa: E402


def _load_fuzz_mod():
    """The per-seed differential body lives in tests/test_e2e_fuzz.py
    (run_three_way) — ONE implementation for the pytest gate and this
    soak, so the soak can never drift into certifying less."""
    spec = importlib.util.spec_from_file_location(
        "e2e_fuzz_mod", os.path.join(ROOT, "tests", "test_e2e_fuzz.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


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
                fuzz.run_three_way(tmp, seed)
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
