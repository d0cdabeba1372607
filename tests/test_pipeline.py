"""End-to-end pipeline tests: simulate -> align -> SAM / profile / clusters
(SURVEY.md §4.3 simulator round-trip; BASELINE.json configs 1-2 in miniature)."""

import numpy as np
import pytest

from parasuite_tpu.benchkit import evaluate_against_truth
from parasuite_tpu.errormodel.infer import ErrorProfile
from parasuite_tpu.io.batch import ReadBatch
from parasuite_tpu.io.sam import SamWriter
from parasuite_tpu.pipeline import AlignerEngine, call_clusters, two_pass_align
from parasuite_tpu.sim import simulate_reads, simulate_binding_sites
from parasuite_tpu.utils.dna import T, C


@pytest.fixture(scope="module")
def engine(tiny_ref, tiny_index, small_cfg):
    return AlignerEngine(tiny_ref, tiny_index, small_cfg)


def _mk_batch(codes, lengths, prefix="r"):
    names = [f"{prefix}{i}" for i in range(codes.shape[0])]
    quals = [b"I" * int(lengths[i]) for i in range(codes.shape[0])]
    return ReadBatch(codes=codes, lengths=lengths, names=names, quals=quals)


def test_simulator_roundtrip(engine, tiny_ref, small_cfg):
    codes, lengths, truth = simulate_reads(tiny_ref, 200, 50, small_cfg,
                                           seed=7, tc_rate=0.08)
    assert truth.n_conversions.sum() > 50  # conversions actually injected
    host = engine.align_to_host(_mk_batch(codes, lengths))
    rep = evaluate_against_truth(truth, host.mapped, host.strand, host.pos)
    assert rep.sensitivity >= 0.97
    assert rep.precision >= 0.99


def test_simulator_indel_roundtrip(engine, tiny_ref, small_cfg):
    """Indel injection (SURVEY.md §3.4; VERDICT r1 missing #5): with
    per-cycle ins/del rates on, injected reads must come back as gapped
    alignments with 1I/1D CIGARs at unchanged genome starts."""
    codes, lengths, truth = simulate_reads(tiny_ref, 300, 50, small_cfg,
                                           seed=9, tc_rate=0.05,
                                           ins_rate=0.004, del_rate=0.004)
    n_indel = int((truth.indel_kind > 0).sum())
    assert n_indel >= 40  # ~16% per-read at 0.4%/cycle over ~42 cycles x2
    host = engine.align_to_host(_mk_batch(codes, lengths))
    # interior single-base indels leave the genome start unchanged, but give
    # the DP band_width of slack for equal-score placements near the event
    rep = evaluate_against_truth(truth, host.mapped, host.strand, host.pos,
                                 tolerance=small_cfg.band_width)
    assert rep.sensitivity >= 0.95
    assert rep.precision >= 0.97
    # the injected events actually exercise gapped DP + host traceback
    gapped = [i for i in range(300)
              if host.mapped[i] and not host.ug_equal[i]]
    assert len(gapped) >= n_indel // 2
    ops = {op for i in gapped for op, _ in host.cigars[i]}
    assert "I" in ops and "D" in ops
    # exact-start check on unambiguously-placed indel reads
    k = truth.indel_kind > 0
    ok = (host.mapped[:300] & k
          & (host.pos[:300] == truth.packed_pos)).sum()
    assert ok >= n_indel * 2 // 3


def test_simulator_no_indels_stream_unchanged(tiny_ref, small_cfg):
    """ins/del rates of 0 must reproduce the pre-indel random stream
    bit-exactly (fold_in key derivation, not a re-split)."""
    c1, _, t1 = simulate_reads(tiny_ref, 60, 50, small_cfg, seed=21)
    c2, _, t2 = simulate_reads(tiny_ref, 60, 50, small_cfg, seed=21,
                               ins_rate=0.0, del_rate=0.0)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(t1.packed_pos, t2.packed_pos)


def test_simulator_determinism(tiny_ref, small_cfg):
    c1, _, t1 = simulate_reads(tiny_ref, 50, 50, small_cfg, seed=11)
    c2, _, t2 = simulate_reads(tiny_ref, 50, 50, small_cfg, seed=11)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(t1.packed_pos, t2.packed_pos)
    c3, _, _ = simulate_reads(tiny_ref, 50, 50, small_cfg, seed=12)
    assert not np.array_equal(c1, c3)


def test_sam_emission(engine, tiny_ref, small_cfg, tmp_path):
    codes, lengths, truth = simulate_reads(tiny_ref, 40, 50, small_cfg, seed=8)
    batch = _mk_batch(codes, lengths)
    host = engine.align_to_host(batch)
    out = tmp_path / "out.sam"
    with SamWriter(out, tiny_ref, command_line="test") as w:
        engine.emit_sam(batch, host, w)
    lines = out.read_text().splitlines()
    headers = [l for l in lines if l.startswith("@")]
    records = [l for l in lines if not l.startswith("@")]
    assert len(headers) == 4  # @HD + 2 @SQ + @PG
    assert len(records) == 40
    for rec in records:
        f = rec.split("\t")
        assert len(f) >= 11
        if f[1] != "4":
            assert f[2] in tiny_ref.names
            assert int(f[3]) >= 1
            assert f[5].endswith("M")


def test_two_pass_improves_scoring(engine, tiny_ref, small_cfg, tmp_path):
    """Config 2 in miniature: learned profile makes T->C cheap; conversion-
    heavy reads that fail the flat threshold become mappable."""
    heavy_cfg = small_cfg
    codes, lengths, truth = simulate_reads(tiny_ref, 300, 50, heavy_cfg,
                                           seed=9, tc_rate=0.15)
    batch = _mk_batch(codes, lengths)

    # pass 1 (flat)
    host1 = engine.align_to_host(batch)
    scores1 = host1.score[host1.mapped]

    def source():
        yield batch

    profile = two_pass_align(engine, lambda: source(),
                             profile_path=tmp_path / "p.errorprofile")
    try:
        # profile recovered the T->C signal
        tc = profile.conversion_rate(T, C)
        assert tc.mean() > 0.05
        # saved profile round-trips
        back = ErrorProfile.load(tmp_path / "p.errorprofile")
        np.testing.assert_array_equal(back.counts, profile.counts)

        # pass 2: conversion positions now score higher
        host2 = engine.align_to_host(batch)
        rep2 = evaluate_against_truth(truth, host2.mapped, host2.strand,
                                      host2.pos)
        assert rep2.sensitivity >= 0.97
        both = host1.mapped & host2.mapped
        # learned scores for converted reads dominate flat scores
        gained = (host2.score[both].astype(int) - host1.score[both].astype(int))
        assert np.median(gained[truth.n_conversions[both] > 2]) > 0
    finally:
        from parasuite_tpu.errormodel.scoring import flat_score_tensor
        engine.set_profile(flat_score_tensor(small_cfg, small_cfg.max_read_len))


def test_cluster_calling(engine, tiny_ref, small_cfg):
    """Binding-site mode: reads pile up at sites; clusters recover them."""
    sites = simulate_binding_sites(tiny_ref, 6, 50, seed=3)
    codes, lengths, truth = simulate_reads(tiny_ref, 240, 50, small_cfg,
                                           seed=10, tc_rate=0.9,
                                           site_positions=sites)
    host = engine.align_to_host(_mk_batch(codes, lengths))
    m = host.mapped
    span = np.full(m.sum(), 50, dtype=np.int32)  # ungapped reads span 50
    clusters = call_clusters(tiny_ref, host.pos[m].astype(np.int64), span,
                             host.tc_count[m], small_cfg)
    assert 4 <= len(clusters) <= 6  # sites recovered (some may get <2 reads)
    total_reads = sum(c.n_reads for c in clusters)
    assert total_reads >= 0.9 * int(m.sum())
    for c in clusters:
        assert c.n_tc >= 1
        assert 0 <= c.conversion_specificity <= 1
        assert c.end - c.start >= 50
        # each cluster must contain a simulated site
        ci = tiny_ref.names.index(c.chrom)
        local_sites = sites - int(tiny_ref.starts[ci])
        assert np.any((local_sites >= c.start - 5) & (local_sites < c.end + 5))


def test_tc_count_strand_correct(engine, tiny_ref, small_cfg):
    """tc_count must count machine-frame T->C on both strands."""
    codes, lengths, truth = simulate_reads(tiny_ref, 100, 50, small_cfg,
                                           seed=13, tc_rate=0.2)
    host = engine.align_to_host(_mk_batch(codes, lengths))
    ok = host.mapped & host.ug_equal & (host.nm == truth.n_conversions + truth.n_errors)
    # for reads where all mismatches are conversions, tc_count == n_conversions
    pure = ok & (truth.n_errors == 0)
    assert pure.sum() > 20
    np.testing.assert_array_equal(host.tc_count[pure], truth.n_conversions[pure])
    assert (host.strand[pure] == 1).any() and (host.strand[pure] == 0).any()


def test_tc_count_from_cigar_gapped():
    """T->C recount must walk the CIGAR: I/D/N shift the ref/read frames
    (VERDICT r1 weak #3 — the flat ref[p:p+len] comparison was wrong for
    every base after a gap)."""
    from parasuite_tpu.pipeline.clusters import tc_count_from_cigar

    # codes: A=0 C=1 G=2 T=3
    ref = np.array([3, 0, 3, 2, 1, 1, 3, 0, 2, 2, 3, 3], dtype=np.int8)

    # 4M 2D 3M at pos 0: M1 vs ref[0:4]=TATG, M2 vs ref[6:9]=TAG
    read = np.array([1, 0, 1, 2, 1, 0, 2], dtype=np.int8)  # CACG | CAG
    assert tc_count_from_cigar(ref, 0, read, 0,
                               [("M", 4), ("D", 2), ("M", 3)]) == 3

    # 2M 2I 2M at pos 0: inserted bases carry no conversions
    read = np.array([1, 0, 1, 1, 1, 2], dtype=np.int8)  # CA ++CC CG
    assert tc_count_from_cigar(ref, 0, read, 0,
                               [("M", 2), ("I", 2), ("M", 2)]) == 2

    # 2M 4N 2M (junction skip) behaves like D for framing
    read = np.array([1, 0, 1, 0], dtype=np.int8)
    assert tc_count_from_cigar(ref, 0, read, 0,
                               [("M", 2), ("N", 4), ("M", 2)]) == 2

    # reverse strand: conversions appear as (ref A, read G)
    read = np.array([3, 2, 3, 2, 3, 2, 2], dtype=np.int8)  # vs TATG / TAG
    assert tc_count_from_cigar(ref, 0, read, 1,
                               [("M", 4), ("D", 2), ("M", 3)]) == 2


def test_xa_alternative_hits(tiny_ref, tiny_index, small_cfg):
    """XA:Z alternates for multi-hit reads (BWA samse convention)."""
    from parasuite_tpu.index import KmerIndex, PackedReference

    rng = np.random.default_rng(900)
    core = rng.integers(0, 4, 300).astype(np.int8)
    seq = np.concatenate([core, rng.integers(0, 4, 400).astype(np.int8), core])
    ref = PackedReference.from_dict({"dup": seq}, spacer=small_cfg.chrom_spacer)
    idx = KmerIndex.build(ref.seq, small_cfg.kmer_size)
    eng = AlignerEngine(ref, idx, small_cfg, xa_tags=True)
    codes = np.stack([core[20:70], rng.integers(0, 4, 50).astype(np.int8)])
    lengths = np.full(2, 50, dtype=np.int32)
    host = eng.align_to_host(_mk_batch(codes, lengths))
    assert host.mapped[0] and host.x0[0] == 2
    # winner at 20, alternate at 700+20=720 (1-based 721)
    assert host.xa[0] == "XA:Z:dup,+721,50M,0;"
    assert host.xa[1] is None  # unmapped: no alternates

    # XA makes it into the SAM record
    from parasuite_tpu.io.sam import SamWriter
    import io as _io
    class W:
        def __init__(self): self.lines = []
        def write(self, l): self.lines.append(l)
    w = W()
    eng.emit_sam(_mk_batch(codes, lengths), host, w)
    assert "XA:Z:dup,+721,50M,0;" in w.lines[0]


def test_xa_gapped_alternate_and_drop_count(small_cfg):
    """Gapped alternates carry a real traceback CIGAR in XA (VERDICT r1 weak
    #7), and alternates beyond xa_limit are counted in engine.xa_dropped
    instead of being silently dropped (SURVEY.md §7 "no silent caps")."""
    from parasuite_tpu.index import KmerIndex, PackedReference

    rng = np.random.default_rng(901)
    core = rng.integers(0, 4, 80).astype(np.int8)
    gapped_copy = np.concatenate([core[:35], core[36:]])  # drop ref base 35
    seq = np.concatenate([rng.integers(0, 4, 200).astype(np.int8), core,
                          rng.integers(0, 4, 150).astype(np.int8),
                          gapped_copy,
                          rng.integers(0, 4, 100).astype(np.int8)])
    ref = PackedReference.from_dict({"dup": seq}, spacer=small_cfg.chrom_spacer)
    idx = KmerIndex.build(ref.seq, small_cfg.kmer_size)
    eng = AlignerEngine(ref, idx, small_cfg, xa_tags=True)
    codes = core[:50][None, :].astype(np.int8)
    lengths = np.full(1, 50, dtype=np.int32)
    host = eng.align_to_host(_mk_batch(codes, lengths))
    assert host.mapped[0] and host.ug_equal[0]
    ci, local = ref.locate(np.asarray(host.pos))
    assert int(local[0]) == 200                    # exact copy wins
    assert host.xa[0] is not None
    # the gapped alternate at the deleted copy: read base 35 is an insertion
    assert host.xa[0] == "XA:Z:dup,+431,35M1I14M,1;"
    assert eng.xa_dropped == 0

    # overflow accounting: 5 identical placements, limit 2 -> 2 emitted,
    # 2 counted as dropped (winner is the 5th)
    rng2 = np.random.default_rng(902)
    core2 = rng2.integers(0, 4, 120).astype(np.int8)
    parts = []
    for _ in range(5):
        parts.append(core2)
        parts.append(rng2.integers(0, 4, 200).astype(np.int8))
    ref2 = PackedReference.from_dict({"rep": np.concatenate(parts)},
                                     spacer=small_cfg.chrom_spacer)
    idx2 = KmerIndex.build(ref2.seq, small_cfg.kmer_size)
    eng2 = AlignerEngine(ref2, idx2, small_cfg, xa_tags=True, xa_limit=2)
    host2 = eng2.align_to_host(_mk_batch(core2[20:70][None, :].astype(np.int8),
                                         np.full(1, 50, dtype=np.int32)))
    assert host2.mapped[0] and int(host2.x0[0]) == 5
    assert host2.xa[0] is not None
    assert host2.xa[0].count(";") == 2   # exactly xa_limit alternates
    assert eng2.xa_dropped == 2


def test_batched_traceback_parity(tiny_ref, tiny_index, small_cfg):
    """host_tracebacks_batch (one vectorized DP for all gapped reads) must
    be bit-identical to the per-read host_traceback oracle path — (pos,
    cigar, nm) for every gapped winner on an indel-rich read set."""
    from conftest import sample_reads

    from parasuite_tpu.io.batch import ReadBatch
    from parasuite_tpu.pipeline.align import (AlignerEngine, host_traceback,
                                              host_tracebacks_batch)
    from parasuite_tpu.utils.dna import revcomp_codes

    rng = np.random.default_rng(4242)
    codes, lengths, _ = sample_reads(rng, tiny_ref, 160, 50, mutate=1,
                                     indel=True)
    eng = AlignerEngine(tiny_ref, tiny_index, small_cfg)
    res = eng.align_device(codes, lengths)
    import jax

    res = jax.device_get(res)
    mapped = np.asarray(res.mapped)
    ug = np.asarray(res.ug_equal)
    strand = np.asarray(res.strand)
    diag = np.asarray(res.diag)
    grows = np.nonzero(mapped & ~ug)[0]
    assert grows.shape[0] >= 10, "need gapped winners to compare"

    om = np.full((grows.shape[0], 50), 4, dtype=np.int8)
    for k, b in enumerate(grows):
        ln = int(lengths[b])
        om[k, :ln] = (codes[b, :ln] if strand[b] == 0
                      else revcomp_codes(codes[b, :ln]))
    got = host_tracebacks_batch(tiny_ref.seq, eng.s_tensor, eng.s_comp,
                                small_cfg, om, lengths[grows],
                                strand[grows], diag[grows])
    for k, b in enumerate(grows):
        ln = int(lengths[b])
        exp = host_traceback(tiny_ref.seq, eng.s_tensor, eng.s_comp,
                             small_cfg, om[k, :ln], ln, int(strand[b]),
                             int(diag[b]))
        assert got[k] == exp, f"read {b}: {got[k]} != {exp}"

    # variable lengths through the batched path too
    lengths2 = lengths[grows].copy()
    lengths2[::2] = 40
    om2 = om.copy()
    for k in range(0, om2.shape[0], 2):
        om2[k, 40:] = 4
    got2 = host_tracebacks_batch(tiny_ref.seq, eng.s_tensor, eng.s_comp,
                                 small_cfg, om2, lengths2, strand[grows],
                                 diag[grows])
    for k in range(om2.shape[0]):
        ln = int(lengths2[k])
        exp = host_traceback(tiny_ref.seq, eng.s_tensor, eng.s_comp,
                             small_cfg, om2[k, :ln], ln,
                             int(strand[grows][k]), int(diag[grows][k]))
        assert got2[k] == exp


def test_rescue_kmer_two_tier(tiny_ref, small_cfg):
    """config.rescue_kmer (VERDICT r4 weak #5): unmapped primary-pass reads
    retry at the smaller k; rescued rows must equal a plain engine running
    wholly at that k (both passes are oracle-exact under their configs), and
    non-rescued rows must be bit-identical to the rescue-off engine."""
    from conftest import sample_reads

    from parasuite_tpu.index import KmerIndex

    cfg = small_cfg.replace(rescue_kmer=6)
    rng = np.random.default_rng(808)
    # 36bp reads with heavy mutation: some have no clean 8-mer seed window
    # but still map at k=6
    codes, lengths, _ = sample_reads(rng, tiny_ref, 128, 36, mutate=5)
    pad = np.full((128, 50 - 36), 4, dtype=np.int8)
    codes = np.concatenate([codes, pad], axis=1)
    batch = ReadBatch(codes=codes, lengths=lengths)

    idx8 = KmerIndex.build(tiny_ref.seq, cfg.kmer_size)
    eng_off = AlignerEngine(tiny_ref, idx8, small_cfg)
    eng_on = AlignerEngine(tiny_ref, idx8, cfg)
    host_off = eng_off.align_to_host(batch)
    host_on = eng_on.align_to_host(batch)

    rescued = host_on.mapped & ~host_off.mapped
    assert rescued.sum() >= 3, "need rescued reads for this test"
    assert eng_on.rescue_mapped == int(rescued.sum())
    # primary results unchanged where the primary pass mapped
    keep = host_off.mapped
    for f in ("mapped", "strand", "pos", "score", "mapq", "x0", "x1", "nm"):
        np.testing.assert_array_equal(getattr(host_on, f)[keep],
                                      getattr(host_off, f)[keep], err_msg=f)
    # rescued rows equal the all-k6 engine's result for those reads
    cfg6 = cfg.replace(kmer_size=6, rescue_kmer=0,
                       max_seeds=max(cfg.rescue_seeds, cfg.max_seeds))
    idx6 = KmerIndex.build(tiny_ref.seq, 6)
    eng6 = AlignerEngine(tiny_ref, idx6, cfg6)
    host6 = eng6.align_to_host(batch)
    rows = np.nonzero(rescued)[0]
    for f in ("mapped", "strand", "pos", "score", "mapq", "x0", "x1", "nm"):
        np.testing.assert_array_equal(getattr(host_on, f)[rows],
                                      getattr(host6, f)[rows], err_msg=f)
    for b in rows:
        assert host_on.cigars[int(b)] == host6.cigars[int(b)]
