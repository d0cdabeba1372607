"""FASTQ reader/writer + fixed-shape batch iterator.

Reference equivalent: htsjdk FASTQ parsing inside the Java toolkit
(SURVEY.md §2 component 9). Here parsing is a host-side streaming pass that
emits ReadBatch objects sized for the device (pad-to-L, pad-to-B), which is
the contract the TPU pipeline needs.

A C++ fast path (native/parasuite_native) can replace the Python tokenizer;
the Python version is the always-available fallback with identical output.
"""

from __future__ import annotations

import gzip
from pathlib import Path
from typing import Iterator

import numpy as np

from parasuite_tpu.io.batch import ReadBatch
from parasuite_tpu.utils.dna import decode_seq, encode_seq


def _open(path, mode="rb"):
    path = Path(path)
    if path.suffix == ".gz":
        return gzip.open(path, mode)
    return open(path, mode)


def _iter_records(path) -> Iterator[tuple[str, bytes, bytes]]:
    """Yield (name, seq_ascii, qual_ascii) triples."""
    with _open(path) as fh:
        while True:
            hdr = fh.readline()
            if not hdr:
                return
            hdr = hdr.strip()
            if not hdr:
                continue
            if not hdr.startswith(b"@"):
                raise ValueError(f"bad FASTQ header line: {hdr[:50]!r}")
            seq = fh.readline().strip()
            plus = fh.readline()
            if not plus.startswith(b"+"):
                raise ValueError("bad FASTQ separator line")
            qual = fh.readline().strip()
            name = hdr[1:].split()[0].decode("ascii")
            yield name, seq, qual


def iter_fastq_batches(path, batch_size: int, max_len: int,
                       start_record: int = 0,
                       stride_shards: int = 1,
                       shard_index: int = 0) -> Iterator[ReadBatch]:
    """Stream FASTQ as fixed-shape ReadBatches.

    Multi-host sharding (SURVEY.md §2 component 12): host h of H takes records
    with (record_index // batch_size) % H == h, i.e. whole batches round-robin,
    so every shard count yields the same set of (read, global index) pairs and
    merged output order is derivable from read indices alone (determinism test
    SURVEY.md §4.5).
    """
    names: list[str] = []
    seqs: list[np.ndarray] = []
    quals: list[bytes] = []

    def flush():
        batch = ReadBatch.from_arrays(seqs, names, quals, max_len, pad_to=batch_size)
        names.clear(), seqs.clear(), quals.clear()
        return batch

    for rec_idx, (name, seq, qual) in enumerate(_iter_records(path)):
        if rec_idx < start_record:
            continue
        local_idx = rec_idx - start_record
        if (local_idx // batch_size) % stride_shards != shard_index:
            continue
        names.append(name)
        seqs.append(encode_seq(seq))
        quals.append(qual)
        if len(names) == batch_size:
            yield flush()
    if names:
        yield flush()


def read_fastq(path, max_len: int, batch_size: int | None = None) -> ReadBatch:
    """Read an entire FASTQ into one ReadBatch (pad count to batch multiple)."""
    names, seqs, quals = [], [], []
    for name, seq, qual in _iter_records(path):
        names.append(name)
        seqs.append(encode_seq(seq))
        quals.append(qual)
    n = len(names)
    if batch_size:
        pad = ((n + batch_size - 1) // batch_size) * batch_size
    else:
        pad = n
    return ReadBatch.from_arrays(seqs, names, quals, max_len, pad_to=max(pad, 1))


def write_fastq(path, names: list[str], codes: np.ndarray,
                lengths: np.ndarray, quals: list[bytes] | None = None) -> None:
    with _open(path, "wb") as fh:
        for i, name in enumerate(names):
            ln = int(lengths[i])
            seq = decode_seq(codes[i, :ln]).encode("ascii")
            q = quals[i] if quals is not None else b"I" * ln
            fh.write(b"@" + name.encode("ascii") + b"\n" + seq + b"\n+\n" + q + b"\n")
