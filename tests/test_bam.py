"""BAM/BGZF codec + coordinate sort (io/bam.py; SURVEY.md §2 component 9 —
the reference's htsjdk BAM surface — and §3.1's final merge/sort stage)."""

import gzip
import json
import struct

import numpy as np
import pytest

from parasuite_tpu.io.bam import (BGZF_EOF, BgzfWriter, bam_to_sam,
                                  coordinate_sort, sam_to_bam)

SAM = """\
@HD\tVN:1.6\tSO:unsorted
@SQ\tSN:chrA\tLN:5000
@SQ\tSN:chrB\tLN:3000
@PG\tID:parasuite_tpu\tPN:parasuite_tpu\tVN:0.1.0\tCL:align i f o
r1\t0\tchrB\t42\t37\t50M\t*\t0\t0\t{seq}\t{qual}\tXT:A:U\tNM:i:0\tX0:i:1\tX1:i:0\tAS:i:300\tMD:Z:50
r2\t16\tchrA\t900\t23\t20M2D28M\t*\t0\t0\t{seq48}\t{qual48}\tXT:A:U\tNM:i:3\tX0:i:1\tX1:i:2\tAS:i:255\tMD:Z:20^AC27T0
r3\t4\t*\t0\t0\t*\t*\t0\t0\t{seqn}\t{qual}
r4\t0\tchrA\t7\t0\t25M100N25M\t*\t0\t0\t{seq}\t{qual}\tXT:A:R\tNM:i:1\tX0:i:2\tX1:i:0\tAS:i:290\tMD:Z:50\tXA:Z:chrB,+17,50M,2;
r5\t0\tchrA\t7\t11\t50M\t*\t0\t0\t{seq}\t*\tXT:A:U\tNM:i:0\tX0:i:1\tX1:i:0\tAS:i:300\tMD:Z:50
"""


def _sam_text():
    rng = np.random.default_rng(5)
    mk = lambda n: "".join("ACGT"[i] for i in rng.integers(0, 4, n))
    seq = mk(50)
    return SAM.format(seq=seq, qual="I" * 50, seq48=mk(48), qual48="J" * 48,
                      seqn=seq[:20] + "N" + seq[21:])


def test_bgzf_roundtrip_and_eof(tmp_path):
    """Blocks must be valid multi-member gzip and end with the spec's
    28-byte EOF marker (what htsjdk/samtools use to detect truncation)."""
    rng = np.random.default_rng(0)
    payload = rng.integers(0, 256, 200_000, dtype=np.uint8).tobytes()
    p = tmp_path / "x.bgzf"
    with BgzfWriter(p) as w:
        for i in range(0, len(payload), 7013):  # uneven writes
            w.write(payload[i : i + 7013])
    raw = p.read_bytes()
    assert raw.endswith(BGZF_EOF)
    assert gzip.decompress(raw) == payload
    # every member must carry the BC extra subfield with a consistent BSIZE
    bsize = struct.unpack_from("<H", raw, 16)[0]
    assert raw[12:16] == b"\x42\x43\x02\x00"
    assert bsize < len(raw)


def test_sam_bam_sam_roundtrip(tmp_path):
    """SAM -> BAM -> SAM must be byte-identical (mapped fwd/rev, unmapped,
    D and N CIGARs, missing QUAL, N bases, A/i/Z tags)."""
    text = _sam_text()
    sam1 = tmp_path / "a.sam"
    sam1.write_text(text)
    bam = tmp_path / "a.bam"
    n = sam_to_bam(sam1, bam)
    assert n == 5
    sam2 = tmp_path / "b.sam"
    assert bam_to_sam(bam, sam2) == 5
    assert sam2.read_text() == text


@pytest.mark.parametrize("via", ["sam", "bam"])
def test_coordinate_sort(tmp_path, via):
    """(refid, pos) ascending, unmapped last, stable, SO:coordinate."""
    text = _sam_text()
    src = tmp_path / "in.sam"
    src.write_text(text)
    if via == "bam":
        b = tmp_path / "in.bam"
        sam_to_bam(src, b)
        src = b
    out = tmp_path / "out.sam"
    n = coordinate_sort(src, out)
    assert n == 5
    lines = [l for l in out.read_text().splitlines() if not l.startswith("@")]
    names = [l.split("\t")[0] for l in lines]
    # chrA pos7 (r4 before r5: stable), chrA 900, chrB 42, unmapped last
    assert names == ["r4", "r5", "r2", "r1", "r3"]
    hd = out.read_text().splitlines()[0]
    assert hd.startswith("@HD") and "SO:coordinate" in hd
    # and sorted BAM out round-trips
    outb = tmp_path / "out.bam"
    coordinate_sort(src, outb)
    back = tmp_path / "back.sam"
    bam_to_sam(outb, back)
    assert back.read_text() == out.read_text()


@pytest.mark.parametrize("via", ["sam", "bam"])
def test_sort_filters(tmp_path, via):
    """min_mapq drops low-MAPQ mapped records (r4 mapq 0, r5 mapq 11);
    mapped_only drops unmapped (r3)."""
    src = tmp_path / "in.sam"
    src.write_text(_sam_text())
    if via == "bam":
        b = tmp_path / "in.bam"
        sam_to_bam(src, b)
        src = b
    out = tmp_path / "f.sam"
    n = coordinate_sort(src, out, min_mapq=20, mapped_only=True)
    lines = [l for l in out.read_text().splitlines() if not l.startswith("@")]
    assert n == 2 and [l.split("\t")[0] for l in lines] == ["r2", "r1"]
    n = coordinate_sort(src, out, min_mapq=20)
    assert n == 3  # unmapped r3 survives a mapq-only filter


def test_cli_bam_output_and_cluster_ingest(tmp_path, tiny_ref, tiny_index,
                                           small_cfg):
    """align -> .bam directly; cluster consumes the .bam; convert+sort CLI."""
    from conftest import sample_reads

    from parasuite_tpu.cli import main
    from parasuite_tpu.io.fastq import write_fastq

    prefix = tmp_path / "idx"
    tiny_ref.save(prefix)
    tiny_index.save(prefix)
    rng = np.random.default_rng(77)
    codes, lengths, _ = sample_reads(rng, tiny_ref, 48, 50, mutate=2)
    fq = tmp_path / "r.fastq"
    write_fastq(fq, [f"q{i}" for i in range(48)], codes, lengths)

    cfgf = ["--kmer-size", str(small_cfg.kmer_size), "--max-read-len", "50",
            "--batch-size", "16", "--band-width",
            str(small_cfg.band_width)]
    bam = tmp_path / "out.bam"
    assert main(["align", str(prefix), str(fq), str(bam)] + cfgf) == 0
    assert bam.exists() and not (tmp_path / "out.bam.tmp.sam").exists()
    assert bam.read_bytes().endswith(BGZF_EOF)

    # the BAM must round-trip to the exact SAM the text path would emit
    sam = tmp_path / "out.sam"
    assert main(["align", str(prefix), str(fq), str(sam)] + cfgf) == 0
    rt = tmp_path / "rt.sam"
    assert main(["convert", str(bam), str(rt)]) == 0
    assert rt.read_text() == sam.read_text()

    clusters_b = tmp_path / "cb.tsv"
    clusters_s = tmp_path / "cs.tsv"
    assert main(["cluster", str(prefix), str(bam), str(clusters_b)]
                + cfgf + ["--cluster-min-reads", "1"]) == 0
    assert main(["cluster", str(prefix), str(sam), str(clusters_s)]
                + cfgf + ["--cluster-min-reads", "1"]) == 0
    assert clusters_b.read_text() == clusters_s.read_text()

    sortedb = tmp_path / "sorted.bam"
    assert main(["sort", str(bam), str(sortedb)]) == 0
    s2 = tmp_path / "sorted.sam"
    assert main(["sort", str(sam), str(s2)]) == 0
    rt2 = tmp_path / "rt2.sam"
    assert main(["convert", str(sortedb), str(rt2)]) == 0
    assert rt2.read_text() == s2.read_text()


PAIRED_SAM = """\
@HD\tVN:1.6\tSO:unsorted
@SQ\tSN:chrA\tLN:5000
@SQ\tSN:chrB\tLN:3000
p1\t99\tchrA\t100\t60\t10M\t=\t200\t110\tACGTACGTAC\tIIIIIIIIII
p2\t147\tchrA\t200\t60\t10M\t=\t100\t-110\tACGTACGTAC\tIIIIIIIIII
p3\t97\tchrA\t300\t60\t10M\tchrB\t50\t0\tACGTACGTAC\tIIIIIIIIII
p4\t65\tchrB\t50\t60\t10M\t*\t0\t0\tACGTACGTAC\tIIIIIIIIII\tZF:f:3.1415927\tZG:f:1e-12
"""


def test_paired_mate_fields_roundtrip(tmp_path):
    """RNEXT/PNEXT/TLEN (SAM cols 7-9) survive SAM->BAM->SAM byte-exactly,
    including '=' same-ref mates, cross-ref mates, and '*' (ADVICE r3
    medium: these were hardcoded to */0/0). Float tags round-trip at full
    float32 precision (ADVICE r3: '%g' truncated to 6 sig digits)."""
    sam1 = tmp_path / "p.sam"
    sam1.write_text(PAIRED_SAM)
    bam = tmp_path / "p.bam"
    assert sam_to_bam(sam1, bam) == 4
    sam2 = tmp_path / "p2.sam"
    assert bam_to_sam(bam, sam2) == 4
    assert sam2.read_text() == PAIRED_SAM


@pytest.mark.parametrize("out_ext", ["sam", "bam"])
def test_chunked_sort_matches_in_memory(tmp_path, out_ext):
    """External spill-and-merge sort (max_in_memory tiny -> many runs) must
    produce byte-identical output to the in-memory path, including stability
    on equal keys (ADVICE r3: config-5 inputs must not materialize in RAM)."""
    rng = np.random.default_rng(9)
    header = ("@HD\tVN:1.6\tSO:unsorted\n"
              "@SQ\tSN:chrA\tLN:5000\n@SQ\tSN:chrB\tLN:3000\n")
    lines = []
    for i in range(200):
        chrom = "chrA" if rng.random() < 0.5 else "chrB"
        pos = int(rng.integers(1, 50))  # few positions -> many key ties
        if rng.random() < 0.1:
            lines.append(f"u{i}\t4\t*\t0\t0\t*\t*\t0\t0\tACGT\tIIII")
        else:
            lines.append(f"m{i}\t0\t{chrom}\t{pos}\t37\t4M\t*\t0\t0"
                         f"\tACGT\tIIII\tNM:i:0")
    src = tmp_path / "big.sam"
    src.write_text(header + "\n".join(lines) + "\n")
    out_mem = tmp_path / f"mem.{out_ext}"
    out_ext_p = tmp_path / f"ext.{out_ext}"
    n1 = coordinate_sort(src, out_mem)
    n2 = coordinate_sort(src, out_ext_p, max_in_memory=17)
    assert n1 == n2 == 200
    assert out_mem.read_bytes() == out_ext_p.read_bytes()
    # and from a BAM source too
    srcb = tmp_path / "big.bam"
    sam_to_bam(src, srcb)
    outb1 = tmp_path / f"bmem.{out_ext}"
    outb2 = tmp_path / f"bext.{out_ext}"
    coordinate_sort(srcb, outb1)
    coordinate_sort(srcb, outb2, max_in_memory=17)
    assert outb1.read_bytes() == outb2.read_bytes()


def test_native_sort_parity(tmp_path):
    """The C++ BAM->BAM external sort must be byte-identical to the Python
    path — same records, same stability, same filters, same BGZF framing —
    in-memory AND with spilled runs (VERDICT r4 next-round #3)."""
    from parasuite_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    # a bigger, tie-heavy input: many records on few (refid, pos) keys so
    # stability is load-bearing, plus unmapped + gapped shapes from _sam_text
    rng = np.random.default_rng(77)
    mk = lambda n: "".join("ACGT"[i] for i in rng.integers(0, 4, n))
    lines = _sam_text().rstrip("\n").split("\n")
    hdr = [l for l in lines if l.startswith("@")]
    recs = [l for l in lines if not l.startswith("@")]
    for i in range(500):
        chrom = "chrA" if i % 3 else "chrB"
        pos = int(rng.integers(1, 40))  # heavy ties
        if i % 17 == 0:
            recs.append(f"u{i}\t4\t*\t0\t0\t*\t*\t0\t0\t{mk(30)}\t" +
                        "K" * 30)
        else:
            recs.append(f"m{i}\t{16 if i % 2 else 0}\t{chrom}\t{pos}\t"
                        f"{int(rng.integers(0, 60))}\t30M\t*\t0\t0\t"
                        f"{mk(30)}\t{'I' * 30}\tNM:i:0\tAS:i:180")
    src_sam = tmp_path / "big.sam"
    src_sam.write_text("\n".join(hdr + recs) + "\n")
    src = tmp_path / "big.bam"
    sam_to_bam(src_sam, src)

    for kwargs in ({}, {"max_in_memory": 37},
                   {"min_mapq": 20, "mapped_only": True},
                   {"min_mapq": 25, "max_in_memory": 41}):
        out_n = tmp_path / "n.bam"
        out_p = tmp_path / "p.bam"
        n1 = coordinate_sort(src, out_n, **kwargs)
        n2 = coordinate_sort(src, out_p, native_ok=False, **kwargs)
        assert n1 == n2, kwargs
        assert out_n.read_bytes() == out_p.read_bytes(), kwargs


def test_native_sort_rejects_truncated(tmp_path):
    """A truncated BAM must raise, not silently drop records (mirrors
    iter_bam_records)."""
    from parasuite_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    src_sam = tmp_path / "t.sam"
    src_sam.write_text(_sam_text())
    src = tmp_path / "t.bam"
    sam_to_bam(src_sam, src)
    # re-deflate a truncated payload so the gzip layer stays valid
    payload = gzip.decompress(src.read_bytes())
    cut = tmp_path / "cut.bam"
    with BgzfWriter(cut) as w:
        w.write(payload[:-30])
    with pytest.raises(ValueError):
        coordinate_sort(cut, tmp_path / "o.bam")


def test_native_sort_parity_fuzz(tmp_path):
    """Randomized byte-identity fuzz of the C++ sort vs the Python path:
    random record mixes (tie density, unmapped fraction, CIGAR shapes,
    filters, spill thresholds) across several seeds."""
    from parasuite_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    hdr = ["@HD\tVN:1.6\tSO:unsorted", "@SQ\tSN:c1\tLN:100000",
           "@SQ\tSN:c2\tLN:50000", "@SQ\tSN:c3\tLN:5000"]
    for seed in range(6):
        rng = np.random.default_rng(1000 + seed)
        mk = lambda n: "".join("ACGT"[i] for i in rng.integers(0, 4, n))
        n_rec = int(rng.integers(50, 400))
        pos_span = int(rng.choice([10, 1000, 90000]))  # tie density knob
        recs = []
        for i in range(n_rec):
            if rng.random() < 0.15:
                ln = int(rng.integers(20, 60))
                recs.append(f"u{i}\t4\t*\t0\t0\t*\t*\t0\t0\t{mk(ln)}\t"
                            + "I" * ln)
                continue
            chrom = f"c{int(rng.integers(1, 4))}"
            pos = int(rng.integers(1, pos_span + 1))
            ln = int(rng.integers(20, 60))
            cig = (f"{ln}M" if rng.random() < 0.7 else
                   f"{ln // 2}M2D{ln - ln // 2}M" if rng.random() < 0.5
                   else f"{ln // 2}M100N{ln - ln // 2}M")
            recs.append(f"m{i}\t{16 if i % 2 else 0}\t{chrom}\t{pos}\t"
                        f"{int(rng.integers(0, 61))}\t{cig}\t*\t0\t0\t"
                        f"{mk(ln)}\t{'I' * ln}\tNM:i:0\tAS:i:100")
        src_sam = tmp_path / f"fz{seed}.sam"
        src_sam.write_text("\n".join(hdr + recs) + "\n")
        src = tmp_path / f"fz{seed}.bam"
        sam_to_bam(src_sam, src)
        kwargs = {"min_mapq": int(rng.choice([0, 0, 25])),
                  "mapped_only": bool(rng.random() < 0.3),
                  "max_in_memory": int(rng.choice([23, 101, 4_000_000]))}
        out_n = tmp_path / "fn.bam"
        out_p = tmp_path / "fp.bam"
        n1 = coordinate_sort(src, out_n, **kwargs)
        n2 = coordinate_sort(src, out_p, native_ok=False, **kwargs)
        assert n1 == n2, (seed, kwargs)
        assert out_n.read_bytes() == out_p.read_bytes(), (seed, kwargs)
