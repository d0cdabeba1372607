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
