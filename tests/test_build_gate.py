"""Non-skippable native build gate.

Round 3 shipped an uncompilable shark_native.cpp and NOTHING failed: every
native test skips behind `skipif(not native.available())`, ci.sh passed on
the Python fallback, and the bench silently measured the wrong path (see
VERDICT.md round 3). The reference's analogue is trivial — `make` fails
loudly (reference Makefile:1-3). This test is that loud failure: when a
compiler is present, the native engine MUST build. No skipif on
availability — a compile regression fails the fast suite.
"""

import os
import shutil
import subprocess


def test_native_source_compiles():
    if shutil.which("g++") is None:
        import pytest

        pytest.skip("no g++ on PATH (compiler-less deployment)")
    src = os.path.join(
        os.path.dirname(__file__), "..", "shark_tpu", "native",
        "shark_native.cpp",
    )
    assert os.path.exists(src), "native engine source missing"
    # -fsyntax-only: full frontend pass in ~1s without relinking the .so
    # (get_lib() builds/caches the real artifact; this guards the SOURCE
    # so a stale prebuilt .so can never mask a broken tree again)
    proc = subprocess.run(
        ["g++", "-fsyntax-only", "-std=c++17", src],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, (
        "shark_native.cpp does not compile:\n" + proc.stderr[:4000]
    )


def test_native_engine_available():
    """With a compiler present, get_lib() must produce a working .so —
    asserting, not skipping (the skipif pattern turned a broken build into
    51 silent skips in round 3)."""
    if shutil.which("g++") is None:
        import pytest

        pytest.skip("no g++ on PATH (compiler-less deployment)")
    from shark_tpu.io import native

    assert native.available(), (
        "native engine failed to build/load with g++ on PATH — run "
        "`g++ -fsyntax-only shark_tpu/native/shark_native.cpp` for details"
    )
