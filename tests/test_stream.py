"""Streaming alignment with checkpoint/resume (SURVEY.md §5): an interrupted
run resumed must produce byte-identical output to an uninterrupted one."""

import json

import numpy as np
import pytest

from parasuite_tpu.io.fastq import write_fastq
from parasuite_tpu.pipeline import AlignerEngine
from parasuite_tpu.pipeline.stream import StreamCheckpoint, streaming_align
from parasuite_tpu.sim import simulate_reads
from parasuite_tpu.utils.runlog import RunLog


@pytest.fixture(scope="module")
def engine(tiny_ref, tiny_index, small_cfg):
    return AlignerEngine(tiny_ref, tiny_index, small_cfg.replace(batch_size=32))


@pytest.fixture(scope="module")
def fastq(tmp_path_factory, tiny_ref, small_cfg):
    d = tmp_path_factory.mktemp("stream")
    codes, lengths, truth = simulate_reads(tiny_ref, 100, 50, small_cfg,
                                           seed=21, tc_rate=0.1)
    p = d / "reads.fastq"
    write_fastq(p, truth.names(), codes, lengths)
    return p


def test_streaming_align_basic(engine, fastq, tmp_path):
    out = tmp_path / "out.sam"
    log_path = tmp_path / "stats.jsonl"
    n, counts, n_prof = streaming_align(
        engine, fastq, out, with_profile_counts=True,
        log=RunLog(log_path), command_line="test")
    assert n == 100
    assert counts.sum() > 0
    assert n_prof > 90
    recs = [l for l in out.read_text().splitlines() if not l.startswith("@")]
    assert len(recs) == 100
    # progress manifest marks completion
    state = json.loads((tmp_path / "out.sam.progress.json").read_text())
    assert state["complete"] and state["records"] == 100
    # JSONL log has per-batch events
    events = [json.loads(l) for l in log_path.read_text().splitlines()]
    assert sum(1 for e in events if e["stage"] == "align.batch") == 4  # 100/32


@pytest.mark.parametrize("crash", ["exact", "ahead"])
def test_resume_produces_identical_bytes(engine, fastq, tmp_path, crash):
    """Two crash shapes (VERDICT r1 item 4):

    * "exact"  — SAM file truncated exactly at the checkpoint (convenient)
    * "ahead"  — records were flushed AFTER the last manifest save, so the
      file is ahead of the manifest; resume must truncate back to the
      committed `sam_bytes` offset or those records duplicate.
    """
    full = tmp_path / "full.sam"
    streaming_align(engine, fastq, full, with_profile_counts=True)

    # simulate a crash: run all 4 batches, rewind the checkpoint to batch 2
    part = tmp_path / f"part_{crash}.sam"
    streaming_align(engine, fastq, part, with_profile_counts=True)
    lines = part.read_bytes().splitlines(keepends=True)
    header = [l for l in lines if l.startswith(b"@")]
    body = [l for l in lines if not l.startswith(b"@")]
    committed = b"".join(header + body[:64])
    if crash == "exact":
        part.write_bytes(committed)
    # "ahead": leave the whole file on disk — flushed past the manifest
    ckpt = StreamCheckpoint(part, engine.cfg)
    # recompute partial counts for first 2 batches honestly
    from parasuite_tpu.io.fastq import iter_fastq_batches

    counts2 = np.zeros((engine.cfg.max_read_len, 4, 4), dtype=np.int64)
    n_prof2 = 0
    for bi, batch in enumerate(iter_fastq_batches(fastq, 32, 50)):
        if bi >= 2:
            break
        res = engine.align_device(batch.codes, batch.lengths)
        counts2 += np.asarray(engine.profile_counts_device(
            batch.codes, batch.lengths, res), dtype=np.int64)
        n_prof2 += int(np.asarray(res.mapped & res.ug_equal
                                  & (batch.lengths > 0)).sum())
    ckpt.save(2, 64, counts=counts2, profiled=n_prof2,
              sam_bytes=len(committed), batch_records=[32, 32])

    n, counts, n_prof = streaming_align(engine, fastq, part, resume=True,
                                        with_profile_counts=True)
    assert n == 100
    assert part.read_bytes() == full.read_bytes()
    np.testing.assert_array_equal(counts,
                                  np.load(str(full) + ".counts.npy"))


def test_resume_ignores_pre_v2_manifest(engine, fastq, tmp_path):
    """A manifest without the committed-offset fields must trigger a clean
    restart, never a bad truncate."""
    import json

    out = tmp_path / "old.sam"
    streaming_align(engine, fastq, out)
    state = json.loads((tmp_path / "old.sam.progress.json").read_text())
    before = out.read_bytes()
    del state["sam_bytes"], state["batch_records"]
    state["complete"] = False
    state["batches_done"] = 2
    (tmp_path / "old.sam.progress.json").write_text(json.dumps(state))
    n, _, _ = streaming_align(engine, fastq, out, resume=True)
    assert n == 100
    assert out.read_bytes() == before


def test_resume_completed_run_is_noop(engine, fastq, tmp_path):
    out = tmp_path / "o.sam"
    streaming_align(engine, fastq, out)
    before = out.read_text()
    n, _, _ = streaming_align(engine, fastq, out, resume=True)
    assert n == 100
    assert out.read_text() == before


def test_config_change_invalidates_checkpoint(engine, fastq, tmp_path):
    out = tmp_path / "o2.sam"
    streaming_align(engine, fastq, out)
    ckpt = StreamCheckpoint(out, engine.cfg.replace(band_width=4))
    assert ckpt.load() is None  # cfg hash mismatch -> restart


def test_depth_is_the_single_inflight_knob(engine, fastq, tmp_path):
    """VERDICT r3 weak #4: `depth` must bound the dispatched-not-drained
    window AND size both queues — the documented N-deep window has to exist
    as written. With depth=3 and 4 batches of input the pending high-water
    mark must reach exactly 3; with depth=1 it must stay at 1."""
    stats3: dict = {}
    out3 = tmp_path / "d3.sam"
    streaming_align(engine, fastq, out3, depth=3, stats_out=stats3)
    assert stats3["pending_high"] == 3

    stats1: dict = {}
    out1 = tmp_path / "d1.sam"
    streaming_align(engine, fastq, out1, depth=1, stats_out=stats1)
    assert stats1["pending_high"] == 1
    # output bytes are depth-independent (ordering is by batch index)
    assert out1.read_bytes() == out3.read_bytes()


def test_simulated_quals_roundtrip_reverse_strand(engine, tiny_ref,
                                                  small_cfg, tmp_path):
    """Simulator emits non-constant decay-model qualities (VERDICT r3 weak
    #8); SAM emission must reverse QUAL for reverse-strand records, on both
    the native and Python formatter paths."""
    from parasuite_tpu.sim.generate import simulate_quality

    codes, lengths, truth = simulate_reads(tiny_ref, 60, 50, small_cfg,
                                           seed=33, tc_rate=0.1)
    quals = simulate_quality(60, 50, seed=33)
    assert len(set(quals[0].tobytes())) > 3  # non-constant
    fq = tmp_path / "q.fastq"
    write_fastq(fq, truth.names(), codes, lengths, quals=quals)
    out = tmp_path / "q.sam"
    streaming_align(engine, fq, out)
    recs = [l.split("\t") for l in out.read_text().splitlines()
            if not l.startswith("@")]
    n_rev = 0
    for i, f in enumerate(recs):
        q_in = quals[i, : int(lengths[i])].tobytes().decode()
        if int(f[1]) & 0x10:
            assert f[10] == q_in[::-1]
            n_rev += 1
        else:
            assert f[10] == q_in
    assert n_rev > 5  # both strands exercised

    # Python formatter path must agree byte-for-byte
    import parasuite_tpu.native as native
    avail = native.available
    try:
        native.available = lambda: False
        out_py = tmp_path / "q_py.sam"
        streaming_align(engine, fq, out_py)
    finally:
        native.available = avail
    assert out_py.read_bytes() == out.read_bytes()


def test_bam_streaming_resume_identical(engine, fastq, tmp_path):
    """Direct BAM streaming (no .tmp.sam) must honor the same
    truncate-to-committed-offset resume contract: a run resumed after batch
    2 — with stray bytes flushed past the manifest — produces a .bam
    byte-identical to the uninterrupted run."""
    import gzip
    import json

    from parasuite_tpu.io.bam import BGZF_EOF

    full = tmp_path / "full.bam"
    streaming_align(engine, fastq, full)
    assert full.read_bytes().endswith(BGZF_EOF)

    # committed prefix for batches 1-2 = a complete run over the first 64
    # reads (identical records AND identical per-batch BGZF block cuts)
    fq64 = tmp_path / "first64.fastq"
    lines = fastq.read_bytes().splitlines(keepends=True)
    fq64.write_bytes(b"".join(lines[: 64 * 4]))
    part = tmp_path / "part.bam"
    streaming_align(engine, fq64, part)
    state = json.loads((tmp_path / "part.bam.progress.json").read_text())
    committed = state["sam_bytes"]
    with open(part, "r+b") as fh:
        fh.truncate(committed)       # drop the EOF marker
        fh.seek(committed)
        fh.write(b"\x1f\x8b junkjunkjunk")  # "ahead" crash shape
    (tmp_path / "part.bam.progress.json").write_text(json.dumps(
        {**state, "complete": False, "batches_done": 2, "records": 64,
         "batch_records": [32, 32]}))

    n, _, _ = streaming_align(engine, fastq, part, resume=True)
    assert n == 100
    assert part.read_bytes() == full.read_bytes()
    # and the stream is valid BGZF end to end
    assert gzip.decompress(part.read_bytes())


def test_mixed_length_streaming(tiny_ref, tiny_index, tmp_path):
    """A FASTQ mixing 36-100bp reads must stream end to end (VERDICT r3
    missing #6): every read emitted, lengths preserved in SEQ, and the
    packed and unpacked wire paths must produce identical SAM bytes."""
    from parasuite_tpu.config import AlignConfig
    from parasuite_tpu.pipeline import AlignerEngine

    cfg = AlignConfig(max_read_len=100, batch_size=32, kmer_size=8,
                      max_seeds=5, max_occ=32, max_candidates=8,
                      band_width=3, chrom_spacer=128)
    rng = np.random.default_rng(607)
    n = 96
    codes = np.full((n, 100), 4, dtype=np.int8)
    lengths = np.zeros(n, dtype=np.int32)
    for i in range(n):
        ln = int(rng.choice([36, 50, 75, 100]))
        p = int(rng.integers(0, 4800 - ln))
        frag = tiny_ref.seq[p : p + ln].copy()
        while np.any(frag == 4):
            p = int(rng.integers(0, 4800 - ln))
            frag = tiny_ref.seq[p : p + ln].copy()
        codes[i, :ln] = frag
        lengths[i] = ln
    fq = tmp_path / "mixed.fastq"
    write_fastq(fq, [f"m{i}" for i in range(n)], codes, lengths)
    eng = AlignerEngine(tiny_ref, tiny_index, cfg)
    assert eng.supports_packed
    out = tmp_path / "mixed.sam"
    n_rec, _, _ = streaming_align(eng, fq, out)
    assert n_rec == n
    recs = [l.split("\t") for l in out.read_text().splitlines()
            if not l.startswith("@")]
    assert len(recs) == n
    for i, f in enumerate(recs):
        assert len(f[9]) == int(lengths[i])
    assert sum(1 for f in recs if not (int(f[1]) & 4)) > n * 0.9

    # unpacked path must agree byte-for-byte
    eng.supports_packed = False
    out2 = tmp_path / "mixed_unpacked.sam"
    streaming_align(eng, fq, out2)
    assert out2.read_bytes() == out.read_bytes()


def test_rescue_profile_counts_in_stream(tiny_ref, tiny_index, small_cfg,
                                         tmp_path):
    """With config.rescue_kmer on, streaming profile counts must include the
    rescued rows' substitutions/indels (every emitted record contributes,
    SURVEY.md §3.3) — i.e. equal the rescue-off counts plus exactly the
    rescued rows' CIGAR-walk contributions."""
    from conftest import sample_reads

    from parasuite_tpu.errormodel.infer import (count_indels_from_cigar,
                                                count_substitutions_from_cigar)
    from parasuite_tpu.io.batch import ReadBatch
    from parasuite_tpu.io.fastq import write_fastq
    from parasuite_tpu.pipeline import AlignerEngine
    from parasuite_tpu.pipeline.stream import streaming_align
    from parasuite_tpu.utils.dna import revcomp_codes

    cfg_on = small_cfg.replace(rescue_kmer=6)
    rng = np.random.default_rng(909)
    codes, lengths, _ = sample_reads(rng, tiny_ref, 128, 36, mutate=5)
    pad = np.full((128, 50 - 36), 4, dtype=np.int8)
    codes = np.concatenate([codes, pad], axis=1)
    fq = tmp_path / "rescue.fastq"
    write_fastq(fq, [f"q{i}" for i in range(128)], codes, lengths)

    eng_off = AlignerEngine(tiny_ref, tiny_index, small_cfg)
    eng_on = AlignerEngine(tiny_ref, tiny_index, cfg_on)
    n1, c_off, p_off = streaming_align(eng_off, fq, tmp_path / "off.sam",
                                       with_profile_counts=True)
    n2, c_on, p_on = streaming_align(eng_on, fq, tmp_path / "on.sam",
                                     with_profile_counts=True)
    assert n1 == n2 == 128
    # rescue output is deterministic run-to-run (the property batch-granular
    # resume relies on): a second full run produces identical bytes
    streaming_align(eng_on, fq, tmp_path / "on2.sam",
                    with_profile_counts=True)
    assert ((tmp_path / "on2.sam").read_bytes()
            == (tmp_path / "on.sam").read_bytes())

    # recompute the rescued rows' contributions directly
    batch = ReadBatch(codes=codes, lengths=lengths,
                      names=[f"q{i}" for i in range(128)])
    host_off = eng_off.align_to_host(batch)
    host_on = eng_on.align_to_host(batch)
    rescued = np.nonzero(host_on.mapped & ~host_off.mapped)[0]
    assert rescued.shape[0] >= 3
    L = c_off.shape[0]
    delta = np.zeros((L, 4, 4), dtype=np.int64)
    ins_d = np.zeros(L, dtype=np.int64)
    del_d = np.zeros(L, dtype=np.int64)
    for b in rescued:
        b = int(b)
        ln = int(lengths[b])
        st = int(host_on.strand[b])
        oriented = (codes[b, :ln] if st == 0
                    else revcomp_codes(codes[b, :ln]))
        count_substitutions_from_cigar(tiny_ref.seq, int(host_on.pos[b]),
                                       oriented, ln, st, host_on.cigars[b],
                                       delta)
        if not host_on.ug_equal[b]:
            count_indels_from_cigar(host_on.cigars[b], ln, st, ins_d, del_d)
    np.testing.assert_array_equal(c_on, c_off + delta)
    assert p_on == p_off + rescued.shape[0]
