"""Error-profile inference + scoring tensors (SURVEY.md §2 component 3)."""

import numpy as np

from parasuite_tpu.errormodel import (ErrorProfile, counts_to_profile,
                                      flat_score_tensor, infer_counts_numpy,
                                      profile_score_tensor,
                                      complement_score_tensor)
from parasuite_tpu.errormodel.scoring import flat_score_tensor
from parasuite_tpu.oracle.align import align_batch_oracle
from parasuite_tpu.utils.dna import C, G, T, A

from conftest import sample_reads


def test_flat_tensor_shape_and_values(small_cfg):
    s = flat_score_tensor(small_cfg, 50)
    assert s.shape == (50, 5, 5)
    assert s[0, 0, 0] == small_cfg.match_score
    assert s[10, 0, 1] == small_cfg.mismatch_score
    assert s[0, 4, 2] == small_cfg.n_score
    assert s[0, 2, 4] == small_cfg.n_score


def test_complement_tensor_involution(small_cfg):
    s = flat_score_tensor(small_cfg, 50)
    # make it asymmetric so the test is meaningful
    s = s.copy()
    s[:, T, C] = -3  # cheap T->C
    sc = complement_score_tensor(s)
    assert sc[0, A, G] == -3  # comp(T)=A, comp(C)=G
    np.testing.assert_array_equal(complement_score_tensor(sc), s)


def test_profile_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    counts = rng.integers(0, 1000, size=(30, 4, 4)).astype(np.int64)
    ins = rng.integers(0, 9, size=30).astype(np.int64)
    dels = rng.integers(0, 9, size=30).astype(np.int64)
    p = ErrorProfile(counts=counts, n_reads=123, ins_counts=ins,
                     del_counts=dels, n_gapped=7)
    p.save(tmp_path / "x.errorprofile")
    back = ErrorProfile.load(tmp_path / "x.errorprofile")
    np.testing.assert_array_equal(back.counts, counts)
    np.testing.assert_array_equal(back.ins_counts, ins)
    np.testing.assert_array_equal(back.del_counts, dels)
    assert back.n_reads == 123
    assert back.n_gapped == 7


def test_indel_counting_and_rates(small_cfg):
    from parasuite_tpu.errormodel.infer import count_indels_from_cigar

    L = 50
    ins = np.zeros(L, dtype=np.int64)
    dels = np.zeros(L, dtype=np.int64)
    # forward: 10M 2I 38M -> inserted bases at machine cycles 10, 11
    count_indels_from_cigar([("M", 10), ("I", 2), ("M", 38)], 50, 0, ins, dels)
    assert ins[10] == 1 and ins[11] == 1 and ins.sum() == 2
    # reverse: 5M 1D 45M -> deletion attributed to oriented offset 5 ->
    # machine cycle 50-1-5 = 44
    count_indels_from_cigar([("M", 5), ("D", 1), ("M", 45)], 50, 1, ins, dels)
    assert dels[44] == 1 and dels.sum() == 1

    # 100 aligned reads, gapped included in counts (new SURVEY §3.3
    # semantics): the insertion read contributes no M base at its inserted
    # cycles 10/11, so counts there are 99 and ins_counts restores the
    # denominator to the aligned-read count
    counts = np.zeros((L, 4, 4), dtype=np.int64)
    counts[:, 0, 0] = 100
    counts[10, 0, 0] = 99
    counts[11, 0, 0] = 99
    p = ErrorProfile(counts=counts, n_reads=100, ins_counts=ins,
                     del_counts=dels, n_gapped=2)
    ir, dr = p.indel_rates()
    assert abs(ir[10] - 1 / 100) < 1e-12
    assert abs(dr[44] - 1 / 100) < 1e-12
    go, ge = p.gap_penalties(small_cfg)
    assert 1 <= ge <= go <= 127
    # rarer indels must cost more
    p2 = ErrorProfile(counts=counts * 100, n_reads=9800, ins_counts=ins,
                      del_counts=dels, n_gapped=2)
    go2, _ = p2.gap_penalties(small_cfg)
    assert go2 > go


def test_two_pass_collects_indels(tiny_ref, tiny_index, small_cfg):
    """Streaming pass-1 inference picks up indel events from gapped reads."""
    from parasuite_tpu.io.batch import ReadBatch
    from parasuite_tpu.pipeline.align import AlignerEngine
    from parasuite_tpu.pipeline.two_pass import infer_profile_streaming

    rng = np.random.default_rng(77)
    codes, lengths, _ = sample_reads(rng, tiny_ref, 32, 50, mutate=1)
    # force deletions: drop base 20 from some reads (shift tail up, pad N)
    for b in range(0, 32, 4):
        codes[b, 20:-1] = codes[b, 21:]
        codes[b, int(lengths[b]) - 1] = 4
        lengths[b] -= 1
    batch = ReadBatch(names=[f"r{i}" for i in range(32)], codes=codes,
                      lengths=lengths,
                      quals=[b"I" * int(l) for l in lengths])
    engine = AlignerEngine(tiny_ref, tiny_index, small_cfg)
    prof = infer_profile_streaming(engine, [batch])
    assert prof.n_gapped > 0
    assert prof.del_counts.sum() > 0


def test_inference_recovers_tc_conversions(tiny_ref, tiny_index, small_cfg):
    """Reads with injected T->C conversions produce a profile whose T->C rate
    dominates other substitution rates, and the learned tensor scores T->C
    above other mismatches."""
    rng = np.random.default_rng(48)
    L = 50
    codes, lengths, truth = sample_reads(rng, tiny_ref, 120, L, mutate=0)
    # inject T->C in machine frame with 20% probability per T
    is_t = codes == T
    conv = is_t & (rng.random(codes.shape) < 0.2)
    codes = np.where(conv, C, codes).astype(np.int8)

    s_flat = flat_score_tensor(small_cfg, L)
    alns = align_batch_oracle(codes, lengths, tiny_ref, tiny_index, s_flat,
                              small_cfg)
    mapped = np.asarray([a.mapped for a in alns])
    strand = np.asarray([a.strand for a in alns])
    pos = np.asarray([a.packed_pos for a in alns])
    ug = np.asarray([a.ug_equal for a in alns])
    assert mapped.sum() > 100

    prof = infer_counts_numpy(codes, lengths, mapped, strand, pos, tiny_ref,
                              L, ungapped_only=ug)
    probs = prof.probs()
    tc_rate = probs[:, T, C].mean()
    other = (probs[:, A, C].mean() + probs[:, G, C].mean() +
             probs[:, C, G].mean()) / 3
    assert tc_rate > 0.1
    assert other < 0.05

    s_learned = counts_to_profile(prof, small_cfg)
    assert s_learned.shape == (L, 5, 5)
    # T->C scored well above a normal mismatch, below a match
    assert s_learned[:, T, C].mean() > s_learned[:, A, C].mean() + 5
    assert s_learned[10, T, T] > s_learned[10, T, C]


def test_inference_strand_symmetry(tiny_ref, tiny_index, small_cfg):
    """A T->C conversion on a reverse-strand read must land in the T->C cell
    (not A->G): counts are machine-frame."""
    rng = np.random.default_rng(49)
    L = 50
    # forward-extracted fragments, all reported on reverse strand
    codes, lengths, truth = sample_reads(rng, tiny_ref, 40, L, mutate=0,
                                         revcomp_frac=1.0)
    is_t = codes == T
    conv = is_t & (rng.random(codes.shape) < 0.25)
    codes = np.where(conv, C, codes).astype(np.int8)

    s_flat = flat_score_tensor(small_cfg, L)
    alns = align_batch_oracle(codes, lengths, tiny_ref, tiny_index, s_flat,
                              small_cfg)
    mapped = np.asarray([a.mapped for a in alns])
    strand = np.asarray([a.strand for a in alns])
    assert (strand[mapped] == 1).all()
    prof = infer_counts_numpy(codes, lengths, mapped, strand,
                              np.asarray([a.packed_pos for a in alns]),
                              tiny_ref, L,
                              ungapped_only=np.asarray([a.ug_equal for a in alns]))
    off_diag = prof.counts.sum(axis=0) * (1 - np.eye(4, dtype=np.int64))
    # the dominant substitution must be T->C
    assert off_diag.argmax() == 4 * T + C


def test_gapped_reads_feed_substitution_counts(tiny_ref, tiny_index,
                                               small_cfg):
    """Gapped alignments' M segments must enter the substitution profile
    (SURVEY.md §3.3: the reference counts every aligned read; VERDICT r2
    missing #6) — both through infer_profile_streaming and through the
    streaming_align drain."""
    import tempfile
    from pathlib import Path

    from parasuite_tpu.io.batch import ReadBatch
    from parasuite_tpu.io.fastq import write_fastq
    from parasuite_tpu.pipeline.align import AlignerEngine
    from parasuite_tpu.pipeline.stream import streaming_align
    from parasuite_tpu.pipeline.two_pass import infer_profile_streaming

    rng = np.random.default_rng(78)
    codes, lengths, _ = sample_reads(rng, tiny_ref, 32, 50, mutate=0,
                                     revcomp_frac=0.5)
    # half the reads carry a deletion at offset 20 (gapped winners)
    for b in range(0, 32, 2):
        codes[b, 20:-1] = codes[b, 21:]
        codes[b, int(lengths[b]) - 1] = 4
        lengths[b] -= 1
    batch = ReadBatch(names=[f"r{i}" for i in range(32)], codes=codes,
                      lengths=lengths,
                      quals=[b"I" * int(l) for l in lengths])
    engine = AlignerEngine(tiny_ref, tiny_index, small_cfg)
    host = engine.align_to_host(batch)
    gapped = host.mapped & ~host.ug_equal
    assert gapped.sum() >= 10

    prof = infer_profile_streaming(engine, [batch])
    # per-cycle totals must include the gapped reads: without them cycle 0
    # would hold only the ungapped mapped count
    n_mapped = int(host.mapped.sum())
    assert prof.counts.sum(axis=(1, 2))[0] == n_mapped
    assert prof.n_reads == n_mapped

    # matches on the M segments: total bases ~ sum of aligned M lengths
    m_bases = sum(
        sum(ln for op, ln in host.cigars[b] if op == "M")
        for b in range(32) if host.mapped[b])
    assert prof.counts.sum() == m_bases

    # the streaming_align drain path must produce the identical profile
    with tempfile.TemporaryDirectory() as td:
        fastq = Path(td) / "r.fastq"
        write_fastq(fastq, [f"r{i}" for i in range(32)], codes, lengths)
        _n, counts2, n_prof2 = streaming_align(
            engine, fastq, Path(td) / "out.sam", with_profile_counts=True)
    np.testing.assert_array_equal(counts2, prof.counts)
    assert n_prof2 == prof.n_reads
