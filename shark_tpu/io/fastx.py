"""Streaming FASTA/FASTQ readers (plain or gzip).

Parsing semantics follow kseq (reference: kseq.h:177-218 via main.cpp:31-32):
record names are the header token up to the first whitespace; FASTA sequences
may span multiple lines; FASTQ records are name/seq/+/qual with multi-line
seq and qual (qual read until its length reaches the sequence length).
"""

from __future__ import annotations

import gzip
import io
from typing import BinaryIO, Iterator, Optional, Tuple

FastaRecord = Tuple[str, bytes]  # (name, seq)
FastqRecord = Tuple[str, bytes, bytes]  # (name, seq, qual)

_BUF = 4 << 20


def open_maybe_gzip(path: str) -> BinaryIO:
    f = open(path, "rb", buffering=_BUF)
    magic = f.peek(2)[:2]
    if magic == b"\x1f\x8b":
        return io.BufferedReader(gzip.GzipFile(fileobj=f), buffer_size=_BUF)  # type: ignore[arg-type]
    return f


def _name_of(header: bytes) -> str:
    return header.split(None, 1)[0].decode() if header.strip() else ""


def read_fasta(path: str) -> Iterator[FastaRecord]:
    with open_maybe_gzip(path) as f:
        name: Optional[str] = None
        chunks = []
        for raw in f:
            line = raw.rstrip(b"\r\n")
            if line.startswith(b">") or line.startswith(b"@"):
                if name is not None:
                    yield name, b"".join(chunks)
                name = _name_of(line[1:])
                chunks = []
            elif name is not None:
                chunks.append(line)
        if name is not None:
            yield name, b"".join(chunks)


def read_fastq(path: str) -> Iterator[FastqRecord]:
    with open_maybe_gzip(path) as f:
        it = iter(f)
        for raw in it:
            line = raw.rstrip(b"\r\n")
            if not line:
                continue
            if not line.startswith(b"@"):
                raise ValueError(f"malformed FASTQ header in {path}: {line[:80]!r}")
            name = _name_of(line[1:])
            seq_chunks = []
            qual_chunks = []
            plus_seen = False
            for raw2 in it:
                l2 = raw2.rstrip(b"\r\n")
                if not plus_seen:
                    if l2.startswith(b"+"):
                        plus_seen = True
                    else:
                        seq_chunks.append(l2)
                else:
                    qual_chunks.append(l2)
                    if sum(map(len, qual_chunks)) >= sum(map(len, seq_chunks)):
                        break
            seq = b"".join(seq_chunks)
            qual = b"".join(qual_chunks)
            if len(qual) != len(seq):
                raise ValueError(
                    f"FASTQ seq/qual length mismatch for read {name} in {path}"
                )
            yield name, seq, qual


def read_fastq_pairs(
    path1: str, path2: Optional[str]
) -> Iterator[Tuple[FastqRecord, Optional[FastqRecord]]]:
    """Paired iteration; stops when either file is exhausted (the reference
    loops while both kseq_read calls succeed, FastqSplitter.hpp:61)."""
    it1 = read_fastq(path1)
    if path2 is None:
        for rec in it1:
            yield rec, None
        return
    it2 = read_fastq(path2)
    while True:
        r1 = next(it1, None)
        if r1 is None:
            return
        r2 = next(it2, None)
        if r2 is None:
            return
        yield r1, r2
