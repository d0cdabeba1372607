"""Combined genome+transcriptome reference (SURVEY.md §2 component 7;
BASELINE.json config 3): splicing, projection, junction reads, dedup."""

import numpy as np
import pytest

from parasuite_tpu.index import KmerIndex
from parasuite_tpu.io.batch import ReadBatch
from parasuite_tpu.pipeline.combined import (CombinedEngine,
                                             CombinedReference, Transcript,
                                             parse_annotation,
                                             project_to_genome,
                                             splice_transcript)
from parasuite_tpu.utils.dna import revcomp_codes


@pytest.fixture(scope="module")
def genome():
    rng = np.random.default_rng(77)
    return {"chrA": rng.integers(0, 4, 6000).astype(np.int8)}


@pytest.fixture(scope="module")
def tx_plus():
    return Transcript("tx1", "chrA", "+",
                      np.asarray([1000, 2000, 3000], dtype=np.int64),
                      np.asarray([1200, 2200, 3100], dtype=np.int64))


@pytest.fixture(scope="module")
def tx_minus():
    return Transcript("tx2", "chrA", "-",
                      np.asarray([4000, 4500], dtype=np.int64),
                      np.asarray([4150, 4650], dtype=np.int64))


def test_splice_plus(genome, tx_plus):
    s = splice_transcript(genome, tx_plus)
    assert s.shape[0] == 500
    np.testing.assert_array_equal(s[:200], genome["chrA"][1000:1200])
    np.testing.assert_array_equal(s[200:400], genome["chrA"][2000:2200])


def test_splice_minus(genome, tx_minus):
    s = splice_transcript(genome, tx_minus)
    assert s.shape[0] == 300
    fwd = np.concatenate([genome["chrA"][4000:4150], genome["chrA"][4500:4650]])
    np.testing.assert_array_equal(s, revcomp_codes(fwd))


def test_project_exonic_plus(tx_plus):
    chrom, gpos, cigar, strand = project_to_genome(tx_plus, 50, [("M", 100)], 0)
    assert (chrom, gpos, cigar, strand) == ("chrA", 1050, [("M", 100)], 0)


def test_project_junction_plus(tx_plus):
    chrom, gpos, cigar, strand = project_to_genome(tx_plus, 150, [("M", 100)], 0)
    assert (chrom, gpos, strand) == ("chrA", 1150, 0)
    assert cigar == [("M", 50), ("N", 800), ("M", 50)]


def test_project_double_junction_plus(tx_plus):
    # 250 bases starting at tx 100: exon0[100:200], exon1[0:200], exon2 junction
    chrom, gpos, cigar, strand = project_to_genome(tx_plus, 100, [("M", 250)], 0)
    assert gpos == 1100
    assert cigar == [("M", 100), ("N", 800), ("M", 150)]


def test_project_minus_strand(tx_minus):
    chrom, gpos, cigar, strand = project_to_genome(tx_minus, 0, [("M", 100)], 0)
    assert (chrom, gpos, cigar, strand) == ("chrA", 4550, [("M", 100)], 1)
    chrom, gpos, cigar, strand = project_to_genome(tx_minus, 100, [("M", 100)], 0)
    assert (chrom, gpos, strand) == ("chrA", 4100, 1)
    assert cigar == [("M", 50), ("N", 350), ("M", 50)]
    # reverse read on minus transcript comes out forward on genome
    _, _, _, strand = project_to_genome(tx_minus, 100, [("M", 100)], 1)
    assert strand == 0


def test_project_with_indels(tx_plus):
    # deletion at the junction boundary region
    chrom, gpos, cigar, strand = project_to_genome(
        tx_plus, 150, [("M", 30), ("D", 2), ("M", 68)], 0)
    assert gpos == 1150
    # 30M 2D 18M  | junction | 50M
    assert cigar == [("M", 30), ("D", 2), ("M", 18), ("N", 800), ("M", 50)]
    chrom, gpos, cigar, strand = project_to_genome(
        tx_plus, 150, [("M", 50), ("I", 3), ("M", 47)], 0)
    assert cigar == [("M", 50), ("I", 3), ("N", 800), ("M", 47)]


def test_project_out_of_bounds(tx_plus):
    with pytest.raises(ValueError):
        project_to_genome(tx_plus, 450, [("M", 100)], 0)


def test_annotation_roundtrip(tmp_path, tx_plus, tx_minus):
    p = tmp_path / "ann.tsv"
    p.write_text("#header\n"
                 "tx1\tchrA\t+\t1000,2000,3000\t1200,2200,3100\n"
                 "tx2\tchrA\t-\t4000,4500\t4150,4650\n")
    txs = parse_annotation(p)
    assert [t.tx_id for t in txs] == ["tx1", "tx2"]
    np.testing.assert_array_equal(txs[0].exon_starts, tx_plus.exon_starts)
    assert txs[1].strand == "-"


@pytest.fixture(scope="module")
def comb_engine(genome, tx_plus, tx_minus, small_cfg):
    comb = CombinedReference.build(genome, [tx_plus, tx_minus],
                                   spacer=small_cfg.chrom_spacer)
    idx = KmerIndex.build(comb.ref.seq, small_cfg.kmer_size)
    return CombinedEngine(comb, idx, small_cfg)


def _mk_batch(codes, lengths):
    n = codes.shape[0]
    return ReadBatch(codes=codes, lengths=lengths,
                     names=[f"r{i}" for i in range(n)],
                     quals=[b"I" * int(lengths[i]) for i in range(n)])


def test_combined_align_junction_and_dedup(comb_engine, genome, tx_plus,
                                           tx_minus, small_cfg):
    spliced1 = splice_transcript(genome, tx_plus)
    spliced2 = splice_transcript(genome, tx_minus)
    reads = [
        spliced1[175:225],               # junction exon0/exon1 of tx1
        spliced1[370:420],               # junction exon1/exon2 of tx1
        revcomp_codes(spliced1[175:225]),  # junction read, reverse
        spliced2[125:175],               # junction read on '-' transcript
        genome["chrA"][1050:1100],       # exonic: hits genome AND tx1
        genome["chrA"][5000:5050],       # plain genomic (no transcript)
    ]
    codes = np.stack(reads)
    lengths = np.full(6, 50, dtype=np.int32)
    host = comb_engine.align_to_host(_mk_batch(codes, lengths))
    gref = comb_engine.genome_ref
    assert host.mapped.all()

    ci, local = gref.locate(host.pos)
    # read 0: junction, genomic start 1175, 25M800N25M
    assert (int(local[0]), host.cigars[0]) == (1175, [("M", 25), ("N", 800), ("M", 25)])
    assert host.strand[0] == 0 and host.nm[0] == 0
    # read 1: exon1/exon2 junction: tx 370 -> exon1 off 170 -> 2170
    assert (int(local[1]), host.cigars[1]) == (2170, [("M", 30), ("N", 800), ("M", 20)])
    # read 2: same locus, reverse strand
    assert (int(local[2]), int(host.strand[2])) == (1175, 1)
    # read 3: '-' tx junction: tx 125..175 -> spliced-plus 125..175:
    #   exon0[125:150] -> 4125..4150, exon1[0:25] -> 4500..4525; strand flips
    assert (int(local[3]), int(host.strand[3])) == (4125, 1)
    assert host.cigars[3] == [("M", 25), ("N", 350), ("M", 25)]
    # read 4: exonic twin must be deduped: unique hit, mapq > 0
    assert (int(local[4]), int(host.x0[4])) == (1050, 1)
    assert host.mapq[4] > 0
    assert host.cigars[4] == [("M", 50)]
    # read 5: plain genomic
    assert int(local[5]) == 5000 and host.x0[5] == 1

    # junction reads must report x0 == 1 as well (tx hit only)
    assert host.x0[0] == 1 and host.mapq[0] > 0


def test_combined_sam_emission(comb_engine, genome, tx_plus, small_cfg, tmp_path):
    from parasuite_tpu.io.sam import SamWriter, read_sam

    spliced1 = splice_transcript(genome, tx_plus)
    codes = np.stack([spliced1[175:225]])
    lengths = np.full(1, 50, dtype=np.int32)
    batch = _mk_batch(codes, lengths)
    host = comb_engine.align_to_host(batch)
    out = tmp_path / "comb.sam"
    with SamWriter(out, comb_engine.sam_ref) as w:
        comb_engine.emit_sam(batch, host, w)
    headers, records = read_sam(out)
    # header lists only genome chromosomes, no tx:: entries
    sq = [h for h in headers if h.startswith("@SQ")]
    assert len(sq) == 1 and "chrA" in sq[0] and "tx::" not in sq[0]
    assert records[0]["rname"] == "chrA"
    assert records[0]["pos"] == 1176  # 1-based
    assert records[0]["cigar"] == [("M", 25), ("N", 800), ("M", 25)]


def test_combined_roundtrip_save_load(genome, tx_plus, tx_minus, small_cfg,
                                      tmp_path):
    comb = CombinedReference.build(genome, [tx_plus, tx_minus],
                                   spacer=small_cfg.chrom_spacer)
    comb.save(tmp_path / "c")
    back = CombinedReference.load(tmp_path / "c")
    assert back.genome_names == ["chrA"]
    assert set(back.transcripts) == {"tx1", "tx2"}
    np.testing.assert_array_equal(back.ref.seq, comb.ref.seq)


def test_parse_gtf(tmp_path, tx_plus):
    from parasuite_tpu.pipeline.combined import parse_gtf, load_annotation

    gtf = tmp_path / "ann.gtf"
    gtf.write_text(
        '#comment\n'
        'chrA\tsrc\ttranscript\t1001\t3100\t.\t+\t.\ttranscript_id "tx1";\n'
        'chrA\tsrc\texon\t2001\t2200\t.\t+\t.\ttranscript_id "tx1"; exon_number "2";\n'
        'chrA\tsrc\texon\t1001\t1200\t.\t+\t.\ttranscript_id "tx1"; exon_number "1";\n'
        'chrA\tsrc\texon\t3001\t3100\t.\t+\t.\ttranscript_id "tx1"; exon_number "3";\n'
        'chrA\tsrc\texon\t4001\t4150\t.\t-\t.\ttranscript_id "tx2";\n'
        'chrA\tsrc\texon\t4501\t4650\t.\t-\t.\ttranscript_id "tx2";\n')
    txs = parse_gtf(gtf)
    by_id = {t.tx_id: t for t in txs}
    np.testing.assert_array_equal(by_id["tx1"].exon_starts, tx_plus.exon_starts)
    np.testing.assert_array_equal(by_id["tx1"].exon_ends, tx_plus.exon_ends)
    assert by_id["tx2"].strand == "-"
    # extension dispatch
    assert len(load_annotation(gtf)) == 2


def _reference_refinalize(engine, batch, res, table):
    """Per-read reference implementation of CombinedEngine's genome-space
    re-finalization (the pre-vectorization round-2 code, kept here as the
    executable spec for the lexsort/reduceat slow path)."""
    import math

    from parasuite_tpu.pipeline.align import host_traceback
    from parasuite_tpu.pipeline.combined import TX_PREFIX, project_to_genome

    cfg = engine.cfg
    cref = engine.combined.ref
    valid = np.asarray(table.valid)
    strand = np.asarray(table.strand)
    pos = np.asarray(table.pos)
    score = np.asarray(table.score)
    ug_eq = np.asarray(table.ug_equal)
    diag = np.asarray(table.diag)
    B, n = valid.shape
    lens = np.asarray(batch.lengths)
    any_tx = (valid & (pos >= engine._tx_boundary)).any(axis=1)
    out = {}
    tx_rows = np.nonzero(any_tx & (lens > 0))[0]
    if tx_rows.shape[0] == 0:
        return out
    ci_all, local_all = cref.locate(pos[tx_rows].reshape(-1).astype(np.int64))
    ci_all = ci_all.reshape(-1, n)
    local_all = local_all.reshape(-1, n)
    for row_i, b in enumerate(tx_rows):
        ln = int(lens[b])
        recs = []
        for t in range(n):
            if not valid[b, t]:
                continue
            ci = int(ci_all[row_i, t])
            if ci < 0:
                continue
            st = int(strand[b, t])
            oriented = (batch.codes[b, :ln] if st == 0
                        else revcomp_codes(batch.codes[b, :ln]))
            name = cref.names[ci]
            if ci < engine._n_genome:
                if ug_eq[b, t]:
                    p = int(pos[b, t])
                    if not (p >= cref.starts[ci]
                            and p + ln - 1 < cref.ends[ci]):
                        continue
                    rb = cref.seq[p : p + ln]
                    nm = int(np.sum((rb != oriented) | (rb == 4)
                                    | (oriented == 4)))
                    recs.append((int(score[b, t]), st, ci, p, 0,
                                 [("M", ln)], nm))
                else:
                    p, cigar, nm = host_traceback(
                        cref.seq, engine.s_tensor, engine.s_comp, cfg,
                        oriented, ln, st, int(diag[b, t]))
                    span = sum(l for op, l in cigar if op in "MD")
                    if not (p >= cref.starts[ci]
                            and p + span - 1 < cref.ends[ci]):
                        continue
                    recs.append((int(score[b, t]), st, ci, p, 0, cigar, nm))
            else:
                tx = engine.combined.transcripts[name[len(TX_PREFIX):]]
                if ug_eq[b, t]:
                    txp = int(local_all[row_i, t])
                    cigar0 = [("M", ln)]
                    p0 = int(pos[b, t])
                    rb = cref.seq[p0 : p0 + ln]
                    nm = int(np.sum((rb != oriented) | (rb == 4)
                                    | (oriented == 4)))
                else:
                    p_packed, cigar0, nm = host_traceback(
                        cref.seq, engine.s_tensor, engine.s_comp, cfg,
                        oriented, ln, st, int(diag[b, t]))
                    txp = int(p_packed - cref.starts[ci])
                    span = sum(l for op, l in cigar0 if op in "MD")
                    if txp < 0 or txp + span > tx.spliced_len:
                        continue
                try:
                    chrom, gpos, gcigar, gstrand = project_to_genome(
                        tx, txp, cigar0, st)
                except ValueError:
                    continue
                gci = engine.genome_ref.names.index(chrom)
                gpacked = int(engine.genome_ref.starts[gci]) + gpos
                recs.append((int(score[b, t]), gstrand, gci, gpacked, 1,
                             gcigar, nm))
        if not recs:
            continue
        seen = {}
        for idx_r, r in enumerate(recs):
            key = (r[1], r[2], r[3])
            prev = seen.get(key)
            if prev is None or r[0] > recs[prev][0] or (
                    r[0] == recs[prev][0] and r[4] < recs[prev][4]):
                seen[key] = idx_r
        uniq = [recs[i] for i in sorted(seen.values())]
        uniq.sort(key=lambda r: (-r[0], r[1], r[2], r[3], r[4]))
        best = uniq[0]
        best_score = best[0]
        x0 = sum(1 for r in uniq if r[0] == best_score)
        x1 = len(uniq) - x0
        mapq = (0 if x0 > 1 else
                (37 if x1 == 0 else max(0, 23 - int(4.343 * math.log(x1)))))
        from parasuite_tpu.pipeline.clusters import tc_count_from_cigar

        st = best[1]
        oriented = (batch.codes[b, :ln] if st == 0
                    else revcomp_codes(batch.codes[b, :ln]))
        tc = tc_count_from_cigar(engine.genome_ref.seq, best[3], oriented,
                                 st, best[5])
        out[int(b)] = dict(strand=best[1], pos=best[3], score=best_score,
                           x0=x0, x1=x1, mapq=mapq, nm=best[6],
                           cigar=best[5], tc=tc)
    return out


def test_slow_path_parity_randomized(genome, tx_plus, tx_minus, small_cfg):
    """Vectorized _slow_path == per-read reference implementation on a
    randomized soup of genomic / exonic / junction / mutated / revcomp
    reads (the pin for VERDICT r2 #2's vectorization)."""
    import jax

    comb = CombinedReference.build(genome, [tx_plus, tx_minus],
                                   spacer=small_cfg.chrom_spacer)
    idx = KmerIndex.build(comb.ref.seq, small_cfg.kmer_size)
    engine = CombinedEngine(comb, idx, small_cfg)
    rng = np.random.default_rng(99)
    spl = {0: splice_transcript(genome, tx_plus),
           1: splice_transcript(genome, tx_minus)}
    reads = []
    for _ in range(96):
        kind = rng.integers(0, 3)
        if kind == 0:       # genomic
            p = int(rng.integers(0, 6000 - 50))
            r = genome["chrA"][p : p + 50].copy()
        else:               # transcript (often junction-spanning)
            s = spl[int(rng.integers(0, 2))]
            p = int(rng.integers(0, len(s) - 50))
            r = s[p : p + 50].copy()
        # T->C-ish mutations
        for _m in range(int(rng.integers(0, 3))):
            q = int(rng.integers(0, 50))
            r[q] = rng.integers(0, 4)
        if rng.random() < 0.5:
            r = revcomp_codes(r)
        reads.append(r)
    codes = np.stack(reads)
    lengths = np.full(len(reads), 50, dtype=np.int32)
    batch = _mk_batch(codes, lengths)
    res, table = jax.device_get(
        engine.align_device(batch.codes, batch.lengths))
    host = engine.to_host(batch, (res, table))
    ref_out = _reference_refinalize(engine, batch, res, table)

    valid = np.asarray(table.valid)
    pos = np.asarray(table.pos)
    any_tx = (valid & (pos >= engine._tx_boundary)).any(axis=1)
    n_slow = int(any_tx.sum())
    assert n_slow >= 10, "test world must exercise the slow path"
    for b in range(len(reads)):
        if not any_tx[b]:
            continue
        if b not in ref_out:
            assert not host.mapped[b], f"read {b}: expected unmapped"
            continue
        e = ref_out[b]
        got = dict(strand=int(host.strand[b]), pos=int(host.pos[b]),
                   score=int(host.score[b]), x0=int(host.x0[b]),
                   x1=int(host.x1[b]), mapq=int(host.mapq[b]),
                   nm=int(host.nm[b]), cigar=host.cigars[b],
                   tc=int(host.tc_count[b]))
        assert host.mapped[b], f"read {b}: expected mapped"
        assert got == e, f"read {b}: {got} != {e}"


def test_md_tag():
    from parasuite_tpu.io.sam import md_tag
    from parasuite_tpu.utils.dna import encode_seq

    ref = encode_seq("AACGTACGTTAAGGCC")
    # perfect 8M at pos 2
    assert md_tag(ref, 2, [("M", 8)], ref[2:10].copy()) == "8"
    # mismatch at offset 2 (ref T) of an 8M
    read = ref[2:10].copy(); read[2] = 0
    assert md_tag(ref, 2, [("M", 8)], read) == "2T5"
    # deletion of 2 ref bases after 3M, then 3M
    read = np.concatenate([ref[2:5], ref[7:10]])
    assert md_tag(ref, 2, [("M", 3), ("D", 2), ("M", 3)], read) == "3^AC3"
    # insertion consumes no MD
    read = np.concatenate([ref[2:5], encode_seq("GG"), ref[5:8]])
    assert md_tag(ref, 2, [("M", 3), ("I", 2), ("M", 3)], read) == "6"
    # N (intron) skipped silently: 3M 4N 3M over matching segments
    read = np.concatenate([ref[2:5], ref[9:12]])
    assert md_tag(ref, 2, [("M", 3), ("N", 4), ("M", 3)], read) == "6"


def _random_soup(genome, tx_plus, tx_minus, n=96, seed=99):
    rng = np.random.default_rng(seed)
    spl = {0: splice_transcript(genome, tx_plus),
           1: splice_transcript(genome, tx_minus)}
    reads = []
    for _ in range(n):
        kind = rng.integers(0, 3)
        if kind == 0:
            p = int(rng.integers(0, 6000 - 50))
            r = genome["chrA"][p : p + 50].copy()
        else:
            s = spl[int(rng.integers(0, 2))]
            p = int(rng.integers(0, len(s) - 50))
            r = s[p : p + 50].copy()
        for _m in range(int(rng.integers(0, 3))):
            q = int(rng.integers(0, 50))
            r[q] = rng.integers(0, 4)
        if rng.random() < 0.5:
            r = revcomp_codes(r)
        reads.append(r)
    codes = np.stack(reads)
    return codes, np.full(len(reads), 50, dtype=np.int32)


def _hosts_equal(a, b, n):
    np.testing.assert_array_equal(a.mapped[:n], b.mapped[:n])
    for f in ("strand", "pos", "score", "mapq", "x0", "x1", "nm",
              "ug_equal", "tc_count"):
        np.testing.assert_array_equal(getattr(a, f)[:n], getattr(b, f)[:n],
                                      err_msg=f)
    for i in range(n):
        assert a.cigars[i] == b.cigars[i], i


def test_packed_wire_parity(comb_engine, genome, tx_plus, tx_minus):
    """The entry-compacted wire path (align_device_packed ->
    PackedCandidates) must reproduce the unpacked path bit-for-bit —
    VERDICT r3 next-round #1's correctness contract."""
    import jax

    assert comb_engine.supports_packed
    codes, lengths = _random_soup(genome, tx_plus, tx_minus)
    batch = _mk_batch(codes, lengths)
    host_u = comb_engine.to_host(
        batch, comb_engine.align_device(codes, lengths))
    out = comb_engine.align_device_packed(codes, lengths)
    pc, pj = jax.device_get((out[1], out[2]))
    assert int(pj.n_jun) > 5, "soup must exercise device junction winners"
    assert int(pc.n_sel) <= pc.row.shape[0], "no overflow expected here"
    assert int(pj.n_jun) <= pj.row.shape[0]
    host_p = comb_engine.to_host(batch, out)
    _hosts_equal(host_u, host_p, len(codes))


def test_packed_wire_overflow_fallback(genome, tx_plus, tx_minus, small_cfg):
    """combined_wire_cap too small for the batch -> n_sel exceeds the cap ->
    to_host re-runs the unpacked step; output identical (the cap is a
    throughput knob, never a correctness knob)."""
    import jax

    cfg = small_cfg.replace(combined_wire_cap=0.02,
                            combined_wire_jun_cap=0.02)
    comb = CombinedReference.build(genome, [tx_plus, tx_minus],
                                   spacer=cfg.chrom_spacer)
    idx = KmerIndex.build(comb.ref.seq, cfg.kmer_size)
    engine = CombinedEngine(comb, idx, cfg)
    codes, lengths = _random_soup(genome, tx_plus, tx_minus, seed=7)
    batch = _mk_batch(codes, lengths)
    out = engine.align_device_packed(codes, lengths)
    pc, pj = jax.device_get((out[1], out[2]))
    assert (int(pc.n_sel) > pc.row.shape[0]
            or int(pj.n_jun) > pj.row.shape[0]), \
        "a wire cap must overflow in this test"
    host_p = engine.to_host(batch, out)
    host_u = engine.to_host(batch, engine.align_device(codes, lengths))
    _hosts_equal(host_u, host_p, len(codes))


def test_combined_profile_counts_from_emitted_records(
        genome, tx_plus, tx_minus, small_cfg, tmp_path):
    """Combined twopass profile counts must equal a recount from the SAM
    records actually emitted (VERDICT r3 weak #2 / next-round #4): the
    invariant is 'counts come from the emitted record', like the
    reference's htsjdk record loop (SURVEY.md §3.3)."""
    from parasuite_tpu.errormodel.infer import (
        count_substitutions_from_cigar)
    from parasuite_tpu.io.fastq import write_fastq
    from parasuite_tpu.io.sam import read_sam
    from parasuite_tpu.pipeline.stream import streaming_align
    from parasuite_tpu.utils.dna import encode_seq

    cfg = small_cfg.replace(batch_size=32)
    comb = CombinedReference.build(genome, [tx_plus, tx_minus],
                                   spacer=cfg.chrom_spacer)
    idx = KmerIndex.build(comb.ref.seq, cfg.kmer_size)
    engine = CombinedEngine(comb, idx, cfg)
    codes, lengths = _random_soup(genome, tx_plus, tx_minus, seed=13)
    fq = tmp_path / "soup.fastq"
    write_fastq(fq, [f"s{i}" for i in range(len(codes))], codes, lengths)
    out = tmp_path / "soup.sam"
    n, counts, n_prof = streaming_align(engine, fq, out,
                                        with_profile_counts=True)
    assert n == len(codes)

    # recount from the SAM text itself
    gref = engine.genome_ref
    name_to_ci = {nm: i for i, nm in enumerate(gref.names)}
    counts2 = np.zeros_like(counts)
    n_mapped = 0
    _, records = read_sam(out)
    for r in records:
        if r["flag"] & 0x4:
            continue
        n_mapped += 1
        packed = int(gref.starts[name_to_ci[r["rname"]]]) + r["pos"] - 1
        seq = encode_seq(r["seq"])  # genome-frame, as emitted
        count_substitutions_from_cigar(
            gref.seq, packed, seq, len(r["seq"]),
            1 if r["flag"] & 0x10 else 0, r["cigar"], counts2)
    assert n_prof == n_mapped
    np.testing.assert_array_equal(counts, counts2)


def test_projection_failure_not_counted(comb_engine, genome, tx_plus):
    """A transcript winner whose projection fails must end unmapped AND
    contribute nothing to the profile (the device-winner fusion this
    replaced would still have counted it)."""
    from parasuite_tpu.ops.aligner import AlignResult, CandidateTable

    cref = comb_engine.combined.ref
    tx_ci = comb_engine._n_genome  # tx1 pseudo-chrom
    tlen = tx_plus.spliced_len
    # candidate starting 10 bases before the transcript end: txp + 50 > tlen
    bad_pos = int(cref.starts[tx_ci]) + tlen - 10
    B, n = 1, 2 * comb_engine.cfg.max_candidates
    z = np.zeros((B, n), dtype=np.int32)
    table = CandidateTable(
        valid=np.zeros((B, n), dtype=bool), strand=z.copy(), pos=z.copy(),
        score=z.copy(), ug_equal=np.ones((B, n), dtype=bool), diag=z.copy())
    table.valid[0, 0] = True
    table.pos[0, 0] = bad_pos
    table.diag[0, 0] = bad_pos + comb_engine.cfg.band_width
    table.score[0, 0] = 300
    zb = np.zeros(B, dtype=np.int32)
    res = AlignResult(mapped=np.zeros(B, bool), strand=zb, pos=zb - 1,
                      score=zb, mapq=zb, x0=zb, x1=zb,
                      ug_equal=np.ones(B, bool), nm=zb, diag=zb,
                      n_candidates=zb, tc_count=zb)
    codes = np.zeros((B, 50), dtype=np.int8)
    batch = _mk_batch(codes, np.full(B, 50, dtype=np.int32))
    host = comb_engine.to_host(batch, (res, table))
    assert not host.mapped[0]
    counts = np.zeros((comb_engine.cfg.max_read_len, 4, 4), dtype=np.int64)
    ins = np.zeros(comb_engine.cfg.max_read_len, dtype=np.int64)
    dels = np.zeros_like(ins)
    n_prof, n_gap = comb_engine.accumulate_profile_host(batch, host, counts,
                                                        ins, dels)
    assert n_prof == 0 and n_gap == 0 and counts.sum() == 0


def test_combined_xa_junction_alternate(small_cfg):
    """--xa on a combined index (VERDICT r3 missing #5): alternates are
    projected to genome space; a junction-spanning alternate carries its
    N CIGAR; fast-path (genome-only-candidate) rows get plain-engine XA."""
    rng = np.random.default_rng(424)
    chrA = rng.integers(0, 4, 6000).astype(np.int8)
    tx = Transcript("txj", "chrA", "+",
                    np.asarray([1000, 2000], dtype=np.int64),
                    np.asarray([1200, 2200], dtype=np.int64))
    genome = {"chrA": chrA}
    spliced = splice_transcript(genome, tx)
    junction_read = spliced[175:225]           # 25 bases each side
    # plant the junction 50-mer at a LOWER genomic coordinate -> it wins the
    # equal-score tie (pos asc) and the junction hit becomes the alternate
    chrA[100:150] = junction_read
    # plant a plain genomic duplicate pair far from the transcript
    chrA[4000:4050] = chrA[5000:5050]
    comb = CombinedReference.build(genome, [tx],
                                   spacer=small_cfg.chrom_spacer)
    idx = KmerIndex.build(comb.ref.seq, small_cfg.kmer_size)
    eng = CombinedEngine(comb, idx, small_cfg, xa_tags=True)
    assert not eng.supports_packed  # XA needs the unpacked table

    codes = np.stack([junction_read, chrA[4000:4050]])
    lengths = np.full(2, 50, dtype=np.int32)
    host = eng.align_to_host(_mk_batch(codes, lengths))
    gref = eng.genome_ref
    ci, local = gref.locate(host.pos)

    # read 0: winner = planted copy at 100, alternate = junction at 1175
    assert host.mapped[0] and int(local[0]) == 100 and host.x0[0] == 2
    assert host.cigars[0] == [("M", 50)]
    assert host.xa[0] == "XA:Z:chrA,+1176,25M800N25M,0;"

    # read 1: fast-path genomic duplicate -> plain-engine-style XA
    assert host.mapped[1] and host.x0[1] == 2
    assert host.xa[1] in ("XA:Z:chrA,+4001,50M,0;", "XA:Z:chrA,+5001,50M,0;")

    # XA reaches the emitted record (junction alternates in SAM text)
    class W:
        def __init__(self):
            self.lines = []

        def write(self, l):
            self.lines.append(l)

        def write_block(self, d):
            self.lines.extend(d.decode().rstrip("\n").split("\n"))

    w = W()
    eng.emit_sam(_mk_batch(codes, lengths), host, w)
    assert "XA:Z:chrA,+1176,25M800N25M,0;" in w.lines[0]
