"""Multi-host deployment helpers.

The reference is single-process shared-memory only (SURVEY.md §2); scaling
beyond one host is new, TPU-native design:

- **Runtime**: `jax.distributed` (one process per host, all hosts join one
  mesh). The replicated-index classifier then runs unchanged — the index is
  replicated into every chip's HBM and each host feeds its own chips, with
  zero collectives on the probe path. The sharded-BF classifier's
  all_to_all rides ICI within a slice.
- **Input sharding**: by FILE. RNA-Seq samples arrive as (pairs of) FASTQ
  files; each host streams its assigned files through its local chips and
  writes host-local outputs (`out.ssv.<host>`, `sharked.1.<host>.fq`, ...).
  Concatenating per-host outputs in host order reproduces the
  deterministic single-host order per file.

Typical launch (per host):

    shark_tpu.parallel.distributed.initialize(coordinator, n_hosts, host_id)
    files = assign_files(all_pairs, n_hosts)[host_id]
    for fq1, fq2 in files:
        run_pipeline(replace(cfg, sample1_path=fq1, sample2_path=fq2,
                             ssv_path=f"{out}.ssv.{host_id}", ...))
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

FilePair = Tuple[str, str]


def host_suffixed(path: str, part: int | str) -> str:
    """Insert a per-host/per-part suffix BEFORE a trailing '.gz' so the
    gzip-by-extension detection in both output engines still fires
    ('x.fq.gz' -> 'x.fq.0.gz', 'x.fq' -> 'x.fq.0')."""
    if path.endswith(".gz"):
        return f"{path[:-3]}.{part}.gz"
    return f"{path}.{part}"


def initialize(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Join the multi-host jax runtime (idempotent per process)."""
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def assign_files(
    pairs: Sequence[FilePair], num_hosts: int
) -> List[List[FilePair]]:
    """Deterministic round-robin assignment of input file pairs to hosts.

    Round-robin (not contiguous blocks) so heterogeneous file sizes spread
    evenly; assignment depends only on (pairs order, num_hosts), so every
    host computes the same global view without communication.
    """
    out: List[List[FilePair]] = [[] for _ in range(num_hosts)]
    for i, p in enumerate(pairs):
        out[i % num_hosts].append(p)
    return out


def merge_outputs(part_paths: Sequence[str], dest: str) -> None:
    """Concatenate per-host output parts (ssv or FASTQ) in host order."""
    with open(dest, "wb") as out:
        for p in part_paths:
            with open(p, "rb") as f:
                while True:
                    chunk = f.read(1 << 20)
                    if not chunk:
                        break
                    out.write(chunk)
