#!/usr/bin/env bash
# CI-style gate: fast suite + golden CLI equality on CPU, then (optional)
# a one-batch TPU smoke in the same process to bound tunneled session-init
# cost. Usage: scripts/ci.sh [--tpu]
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== native engine gate =="
# Fail LOUDLY if the native engine cannot build while g++ exists (round 3:
# a broken .cpp passed CI green because every native test skips and the
# golden run silently fell back to the Python path).
python - <<'EOF'
import shutil, sys
if shutil.which("g++") is None:
    print("no g++ on PATH; Python fallback (correctness-only) mode")
else:
    from shark_tpu.io import native
    if not native.available():
        print("FATAL: g++ present but the native engine failed to build",
              file=sys.stderr)
        sys.exit(1)
    print("native engine: OK")
EOF

echo "== fast suite (CPU) =="
python -m pytest tests/ -q -m "not slow"

echo "== golden CLI equality (CPU backend) =="
tmp=$(mktemp -d)
trap 'rm -rf "$tmp"' EXIT
python -m shark_tpu --backend cpu \
  -r /root/reference/example/ENSG00000277117.fa \
  -1 /root/reference/example/sample_1.fq \
  -2 /root/reference/example/sample_2.fq \
  -o "$tmp/out1.fq" -p "$tmp/out2.fq" > "$tmp/out.ssv"
diff "$tmp/out.ssv" /root/reference/example/ENSG00000277117.truth.ssv
diff "$tmp/out1.fq" /root/reference/example/sharked.sample_1.truth.fq
diff "$tmp/out2.fq" /root/reference/example/sharked.sample_2.truth.fq
echo "golden: OK"

if [[ "${1:-}" == "--tpu" ]]; then
  echo "== TPU golden: shipped example end-to-end on the serving backend =="
  # The acceptance contract (reference README.md:54-69) executed on the
  # REAL chip: byte-equality of all three truth files. Warmup-dominated:
  # first jit per process pays the tunneled session init (~150-600 s) —
  # warm with the compile cache it is ~1 min. The 40 min timeout covers
  # the worst cold case without hanging CI forever.
  tput=$(mktemp -d)
  trap 'rm -rf "$tmp" "$tput"' EXIT
  python - <<'EOF'
import jax
plat = jax.devices()[0].platform
assert plat != "cpu", "no accelerator: the TPU golden would silently test cpu"
print(f"serving backend: {plat}")
EOF
  timeout 2400 python -m shark_tpu \
    -r /root/reference/example/ENSG00000277117.fa \
    -1 /root/reference/example/sample_1.fq \
    -2 /root/reference/example/sample_2.fq \
    -o "$tput/out1.fq" -p "$tput/out2.fq" > "$tput/out.ssv"
  diff "$tput/out.ssv" /root/reference/example/ENSG00000277117.truth.ssv
  diff "$tput/out1.fq" /root/reference/example/sharked.sample_1.truth.fq
  diff "$tput/out2.fq" /root/reference/example/sharked.sample_2.truth.fq
  echo "TPU golden: OK"
fi
echo "CI gate passed"
