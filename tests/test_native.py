"""C++ fast-path parity: native outputs must be bit-identical to the numpy
fallbacks (the contract that makes them interchangeable)."""

import numpy as np
import pytest

from parasuite_tpu import native
from parasuite_tpu.index.kmer import KmerIndex
from parasuite_tpu.io.fastq import write_fastq

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_kmer_index_parity(tiny_ref, small_cfg):
    k = small_cfg.kmer_size
    idx_np = KmerIndex.build(tiny_ref.seq, k, use_native="never")
    starts, positions = native.kmer_index_build(tiny_ref.seq, k)
    np.testing.assert_array_equal(starts, idx_np.bucket_starts)
    np.testing.assert_array_equal(positions, idx_np.positions)


def test_kmer_index_parity_with_n_runs():
    rng = np.random.default_rng(9)
    seq = rng.integers(0, 4, 5000).astype(np.int8)
    seq[100:130] = 4
    seq[0:3] = 4
    seq[-2:] = 4
    for k in (4, 8, 11):
        idx_np = KmerIndex.build(seq, k, use_native="never")
        starts, positions = native.kmer_index_build(seq, k)
        np.testing.assert_array_equal(starts, idx_np.bucket_starts)
        np.testing.assert_array_equal(positions, idx_np.positions)


def test_fastq_scan_parity(tmp_path):
    rng = np.random.default_rng(10)
    n, L = 23, 37
    codes = rng.integers(0, 4, size=(n, L)).astype(np.int8)
    codes[3, 5] = 4  # an N
    lengths = np.full(n, L, dtype=np.int32)
    names = [f"read_{i}/1" for i in range(n)]
    quals = [bytes(rng.integers(33, 74, L).astype(np.uint8)) for _ in range(n)]
    p = tmp_path / "r.fastq"
    write_fastq(p, names, codes, lengths, quals)

    buf = p.read_bytes()
    got_n, consumed, gcodes, glens, gnames, gquals = native.fastq_scan_chunk(
        buf, max_reads=64, max_len=50)
    assert got_n == n
    assert consumed == len(buf)
    assert gnames == names
    np.testing.assert_array_equal(glens[:n], lengths)
    np.testing.assert_array_equal(gcodes[:n, :L], codes)
    assert np.all(gcodes[:n, L:] == 4)
    for i in range(n):
        assert gquals[i, :L].tobytes() == quals[i]
    assert np.all(gquals[:n, L:] == ord("I"))


def test_fastq_scan_partial_chunk(tmp_path):
    """A chunk ending mid-record must report only complete records."""
    body = b"@r1\nACGT\n+\nIIII\n@r2\nGGGG\n+\nII"
    got_n, consumed, codes, lens, names, quals = native.fastq_scan_chunk(
        body, max_reads=8, max_len=10)
    assert got_n == 1
    assert names == ["r1"]
    assert consumed == body.index(b"@r2")


def test_fastq_scan_malformed():
    with pytest.raises(ValueError):
        native.fastq_scan_chunk(b"not a fastq\nxx\nyy\nzz\n", 4, 10)


def test_sam_formatter_parity(tiny_ref, tiny_index, small_cfg):
    """Native batch SAM formatting must be byte-identical to the Python
    formatter across mapped fwd/rev, mismatches, and unmapped records."""
    from parasuite_tpu.io.batch import ReadBatch
    from parasuite_tpu.pipeline import AlignerEngine
    from conftest import sample_reads

    rng = np.random.default_rng(700)
    codes, lengths, _ = sample_reads(rng, tiny_ref, 40, 50, mutate=2)
    codes[35:] = rng.integers(0, 4, size=(5, 50)).astype(np.int8)  # unmapped
    names = [f"q{i}" for i in range(40)]
    quals = [bytes(rng.integers(35, 74, 50).astype(np.uint8)) for _ in range(40)]
    batch = ReadBatch(codes=codes, lengths=lengths, names=names, quals=quals)
    engine = AlignerEngine(tiny_ref, tiny_index, small_cfg)
    host = engine.align_to_host(batch)

    class Collect:
        def __init__(self, with_block):
            self.text = []
            if with_block:
                self.write_block = lambda t: self.text.append(
                    t.decode("ascii") if isinstance(t, bytes) else t)

        def write(self, line):
            self.text.append(line + "\n")

        def result(self):
            return "".join(self.text)

    py_w = Collect(with_block=False)   # forces Python formatter
    nat_w = Collect(with_block=True)   # native fast path
    engine.emit_sam(batch, host, py_w)
    engine.emit_sam(batch, host, nat_w)
    assert nat_w.result() == py_w.result()
    assert py_w.result().count("\n") == 40


def test_sam_cluster_scan_parity(tmp_path, tiny_ref, tiny_index, small_cfg):
    """Native SAM cluster ingestion must match the Python record loop on a
    SAM containing fwd/rev, mismatched, junction (N), gapped (I/D), and
    unmapped records (SURVEY.md §3.5; VERDICT r2 weak #6)."""
    from parasuite_tpu.cli import cluster_columns_python
    from parasuite_tpu.io.batch import ReadBatch
    from parasuite_tpu.io.sam import SamWriter, format_record
    from parasuite_tpu.pipeline import AlignerEngine
    from conftest import sample_reads

    if not native.available():
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(701)
    codes, lengths, _ = sample_reads(rng, tiny_ref, 60, 50, mutate=3)
    codes[55:] = rng.integers(0, 4, size=(5, 50)).astype(np.int8)
    names = [f"q{i}" for i in range(60)]
    batch = ReadBatch(codes=codes, lengths=lengths, names=names,
                      quals=[b"I" * 50] * 60)
    engine = AlignerEngine(tiny_ref, tiny_index, small_cfg)
    host = engine.align_to_host(batch)
    sam = tmp_path / "mix.sam"
    with SamWriter(sam, tiny_ref) as w:
        engine.emit_sam(batch, host, w)
        # hand-built junction + gapped records exercise N/I/D walks
        jread = np.concatenate([tiny_ref.seq[100:125], tiny_ref.seq[325:350]])
        w.write(format_record(
            "junc", jread, 50, b"I" * 50, tiny_ref, mapped=True, strand=0,
            packed_pos=100, mapq=37,
            cigar=[("M", 25), ("N", 200), ("M", 25)], score=100, nm=0,
            x0=1, x1=0))
        gread = np.concatenate([tiny_ref.seq[500:525], tiny_ref.seq[527:552]])
        w.write(format_record(
            "gap", gread, 50, b"I" * 50, tiny_ref, mapped=True, strand=0,
            packed_pos=500, mapq=37,
            cigar=[("M", 25), ("D", 2), ("M", 25)], score=90, nm=2,
            x0=1, x1=0))

    pos_py, span_py, tc_py = cluster_columns_python(sam, tiny_ref)
    pos_n, span_n, tc_n, skipped = native.sam_cluster_columns(
        sam, tiny_ref, chunk_bytes=777)  # tiny chunks: boundary handling
    np.testing.assert_array_equal(pos_n, pos_py)
    np.testing.assert_array_equal(span_n, span_py)
    np.testing.assert_array_equal(tc_n, tc_py)
    n_unmapped = int((~host.mapped[:60]).sum())
    assert skipped == n_unmapped
    assert span_py[pos_py == 100][0] == 250  # junction span includes N


def test_sam_cluster_scan_speed_perf_mode(tmp_path, tiny_ref):
    """Config-5-scale ingestion check: 1M records in seconds, gated behind
    PARASUITE_PERF=1 (VERDICT r2 next-round #7)."""
    import os
    import time

    if not os.environ.get("PARASUITE_PERF"):
        pytest.skip("set PARASUITE_PERF=1 for perf assertions")
    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(702)
    n = 1_000_000
    starts = rng.integers(int(tiny_ref.starts[0]),
                          int(tiny_ref.ends[0]) - 50, n)
    sam = tmp_path / "big.sam"
    from parasuite_tpu.utils.dna import decode_seq

    with open(sam, "w") as fh:
        for i in range(0, n, 10000):
            lines = []
            for k in range(i, min(i + 10000, n)):
                p = int(starts[k])
                seq = decode_seq(tiny_ref.seq[p:p + 50])
                lines.append(f"q{k}\t0\tchrA\t{p - int(tiny_ref.starts[0]) + 1}"
                             f"\t37\t50M\t*\t0\t0\t{seq}\t{'I' * 50}\tNM:i:0")
            fh.write("\n".join(lines) + "\n")
    t0 = time.perf_counter()
    pos, span, tc, skipped = native.sam_cluster_columns(sam, tiny_ref)
    dt = time.perf_counter() - t0
    assert pos.shape[0] == n and skipped == 0
    assert dt < 10.0, f"1M-record ingestion took {dt:.1f}s"
    print(f"1M records ingested in {dt:.2f}s "
          f"({n / dt / 1e6:.2f}M rec/s)")


def test_bam_formatter_parity(tiny_ref, tiny_index, small_cfg):
    """Native BAM record formatting must be byte-identical to
    encode_bam_record applied to the native SAM text, record for record
    (mapped fwd/rev with mismatches, unmapped)."""
    from conftest import sample_reads

    from parasuite_tpu import native
    from parasuite_tpu.io.bam import encode_bam_record
    from parasuite_tpu.io.batch import ReadBatch
    from parasuite_tpu.pipeline import AlignerEngine

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(701)
    codes, lengths, _ = sample_reads(rng, tiny_ref, 40, 50, mutate=2)
    codes[35:] = rng.integers(0, 4, size=(5, 50)).astype(np.int8)
    names = [f"q{i}" for i in range(40)]
    quals = [bytes(rng.integers(35, 74, 50).astype(np.uint8))
             for _ in range(40)]
    batch = ReadBatch(codes=codes, lengths=lengths, names=names, quals=quals)
    engine = AlignerEngine(tiny_ref, tiny_index, small_cfg)
    host = engine.align_to_host(batch)

    sam_text = engine._format_native_run(batch, host, 0, 40).decode("ascii")
    rid_of = {nm: i for i, nm in enumerate(tiny_ref.names)}
    expect = b"".join(encode_bam_record(l.split("\t"), rid_of)
                      for l in sam_text.rstrip("\n").split("\n"))
    got = engine._format_native_run(batch, host, 0, 40,
                                    fmt=native.bam_format_batch)
    assert got == expect


def test_bgzf_compress_matches_python_writer(tmp_path):
    """Native BGZF framing must equal io.bam.BgzfWriter byte-for-byte
    (same zlib parameters, same 65280-byte block cuts) minus the EOF
    marker the file writer appends."""
    from parasuite_tpu import native
    from parasuite_tpu.io.bam import BGZF_EOF, BgzfWriter

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(8)
    payload = rng.integers(0, 256, 200_001, dtype=np.uint8).tobytes()
    p = tmp_path / "py.bgzf"
    with BgzfWriter(p) as w:
        w.write(payload)
    py_bytes = p.read_bytes()
    assert py_bytes.endswith(BGZF_EOF)
    nat = native.bgzf_compress(payload, 6)
    assert nat == py_bytes[: -len(BGZF_EOF)]
    import gzip

    assert gzip.decompress(nat) == payload


def test_bam_cluster_scan_parity(tmp_path, tiny_ref, tiny_index, small_cfg):
    """BAM cluster ingestion (BGZF -> C++ record scan) must produce the
    same columns as the SAM scanner over the same records, including
    junction (N) and gapped CIGARs."""
    from conftest import sample_reads

    from parasuite_tpu import native
    from parasuite_tpu.io.bam import sam_to_bam
    from parasuite_tpu.io.batch import ReadBatch
    from parasuite_tpu.io.sam import SamWriter
    from parasuite_tpu.pipeline import AlignerEngine

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(702)
    codes, lengths, _ = sample_reads(rng, tiny_ref, 64, 50, mutate=2,
                                     indel=True)
    batch = ReadBatch(codes=codes, lengths=lengths,
                      names=[f"q{i}" for i in range(64)],
                      quals=[b"I" * 50] * 64)
    engine = AlignerEngine(tiny_ref, tiny_index, small_cfg)
    host = engine.align_to_host(batch)
    sam = tmp_path / "c.sam"
    with SamWriter(sam, tiny_ref) as w:
        engine.emit_sam(batch, host, w)
    bam = tmp_path / "c.bam"
    sam_to_bam(sam, bam)

    pos_s, span_s, tc_s, sk_s = native.sam_cluster_columns(sam, tiny_ref)
    pos_b, span_b, tc_b, sk_b = native.bam_cluster_columns(bam, tiny_ref)
    np.testing.assert_array_equal(pos_s, pos_b)
    np.testing.assert_array_equal(span_s, span_b)
    np.testing.assert_array_equal(tc_s, tc_b)
    assert sk_s == sk_b


def test_formatter_full_cigar_parity(tiny_ref, tiny_index, small_cfg):
    """Gapped (I/D) records must format natively in the same single call as
    everyone else, byte-identical to the Python formatter (SAM) and to
    encode_bam_record over that text (BAM) — the full-CIGAR C++ path."""
    from conftest import sample_reads

    from parasuite_tpu import native
    from parasuite_tpu.io.bam import encode_bam_record
    from parasuite_tpu.io.batch import ReadBatch
    from parasuite_tpu.pipeline import AlignerEngine

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(703)
    codes, lengths, _ = sample_reads(rng, tiny_ref, 64, 50, mutate=1,
                                     indel=True)
    batch = ReadBatch(codes=codes, lengths=lengths,
                      names=[f"g{i}" for i in range(64)],
                      quals=[bytes(rng.integers(35, 74, 50).astype(np.uint8))
                             for _ in range(64)])
    engine = AlignerEngine(tiny_ref, tiny_index, small_cfg)
    host = engine.align_to_host(batch)
    n_gapped = sum(1 for i in range(64)
                   if host.mapped[i] and not host.ug_equal[i])
    assert n_gapped >= 5, "need gapped records in this test"

    class Collect:
        def __init__(self, with_block):
            self.parts = []
            if with_block:
                self.write_block = lambda t: self.parts.append(
                    t if isinstance(t, bytes) else t.encode())

        def write(self, line):
            self.parts.append((line + "\n").encode())

        def result(self):
            return b"".join(self.parts)

    py_w, nat_w = Collect(False), Collect(True)
    engine.emit_sam(batch, host, py_w)
    engine.emit_sam(batch, host, nat_w)
    assert nat_w.result() == py_w.result()
    assert len(nat_w.parts) == 1  # ONE native call for the whole batch

    bam_w = Collect(True)
    engine.emit_bam(batch, host, bam_w)
    rid_of = {nm: i for i, nm in enumerate(tiny_ref.names)}
    expect = b"".join(
        encode_bam_record(l.split("\t"), rid_of)
        for l in py_w.result().decode().rstrip("\n").split("\n"))
    assert bam_w.result() == expect


def test_bam_cluster_scan_malformed_bounds(tiny_ref):
    """A BGZF-valid but malformed BAM record whose l_name/n_cig/l_seq claim
    more bytes than its block_size must raise ValueError('malformed BAM
    chunk'), not read out of bounds (ADVICE r4 medium)."""
    import struct

    if not native.available():
        pytest.skip("native library unavailable")
    # fixed 32-byte section + 4 payload bytes, but fields claim
    # 32 + l_name(2) + 4*n_cig(4) + (l_seq+1)//2(50) = 100 > bsz = 36
    body = struct.pack("<iiBBHHHiiii", 0, 10, 2, 37, 0, 4, 0, 100,
                       -1, -1, 0) + b"q\x00\x00\x00"
    chunk = struct.pack("<i", len(body)) + body
    starts = np.asarray([0], dtype=np.int64)
    with pytest.raises(ValueError, match="malformed BAM chunk"):
        native.bam_cluster_scan(chunk, tiny_ref.seq, starts, max_recs=4)


def test_emit_native_failure_falls_back(tiny_ref, tiny_index, small_cfg,
                                        monkeypatch):
    """When the C++ batch formatter rejects a run (-1 -> RuntimeError: long
    name, MD buffer overflow), _emit must fall back to the per-record Python
    formatter for that run instead of aborting the stream (ADVICE r4 low)."""
    from conftest import sample_reads

    from parasuite_tpu.io.batch import ReadBatch
    from parasuite_tpu.pipeline import AlignerEngine

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(704)
    codes, lengths, _ = sample_reads(rng, tiny_ref, 32, 50, mutate=1)
    batch = ReadBatch(codes=codes, lengths=lengths,
                      names=[f"f{i}" for i in range(32)],
                      quals=[b"I" * 50] * 32)
    engine = AlignerEngine(tiny_ref, tiny_index, small_cfg)
    host = engine.align_to_host(batch)

    class Collect:
        def __init__(self, with_block):
            self.parts = []
            if with_block:
                self.write_block = lambda t: self.parts.append(
                    t if isinstance(t, bytes) else t.encode())

        def write(self, line):
            self.parts.append((line + "\n").encode())

        def result(self):
            return b"".join(self.parts)

    py_w = Collect(False)
    engine.emit_sam(batch, host, py_w)

    def boom(*a, **k):
        raise RuntimeError("ps_sam_format_batch failed (buffer/input)")

    monkeypatch.setattr(native, "sam_format_batch", boom)
    fb_w = Collect(True)
    engine.emit_sam(batch, host, fb_w)  # must not raise
    assert fb_w.result() == py_w.result()
