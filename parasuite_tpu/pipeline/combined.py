"""Combined genome+transcriptome reference (SURVEY.md §2 component 7;
BASELINE.json config 3).

Reference mechanism: PARA-suite aligns reads against genome and transcriptome,
projects transcript-space hits back to genomic coordinates through the exon
structure, and keeps the best record per read in a merged BAM.

TPU-native design: transcripts are packed as extra "chromosomes"
(name prefix "tx::") into ONE PackedReference, so a single index and a single
device align pass covers both spaces — no second pipeline. Projection back to
genome is a host-side exon-table walk (vectorized cumulative-length
searchsorted per SURVEY.md §2; per-record only for the transcript-hit
minority), emitting spliced CIGARs with N (intron skip) ops for
junction-spanning reads.

Annotation input: TSV with columns
    tx_id  chrom  strand(+/-)  exon_starts(comma,0-based)  exon_ends(comma)
(a BED12-ish exon table; GTF parsing can sit on top).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path

import numpy as np

from parasuite_tpu.config import AlignConfig
from parasuite_tpu.index.kmer import KmerIndex
from parasuite_tpu.index.reference import PackedReference
from parasuite_tpu.utils.dna import revcomp_codes

TX_PREFIX = "tx::"


@dataclass
class Transcript:
    tx_id: str
    chrom: str
    strand: str                 # '+' or '-'
    exon_starts: np.ndarray     # int64 [n_exons], 0-based, ascending
    exon_ends: np.ndarray       # int64 [n_exons], exclusive

    @property
    def spliced_len(self) -> int:
        return int((self.exon_ends - self.exon_starts).sum())

    @property
    def cumlens(self) -> np.ndarray:
        """Spliced-plus offsets of each exon start: [n_exons + 1]."""
        return np.concatenate([[0], np.cumsum(self.exon_ends - self.exon_starts)])


def parse_annotation(path) -> list[Transcript]:
    out = []
    for line in Path(path).read_text().splitlines():
        if not line or line.startswith("#"):
            continue
        tx_id, chrom, strand, starts, ends = line.split("\t")
        s = np.asarray([int(x) for x in starts.split(",") if x], dtype=np.int64)
        e = np.asarray([int(x) for x in ends.split(",") if x], dtype=np.int64)
        if not (len(s) == len(e) and np.all(e > s) and np.all(np.diff(s) > 0)):
            raise ValueError(f"bad exon structure for {tx_id}")
        out.append(Transcript(tx_id, chrom, strand, s, e))
    return out


def parse_gtf(path) -> list[Transcript]:
    """Minimal GTF/GFF2 exon parser -> Transcripts (the reference consumes
    annotation the same way for its combiner; SURVEY.md §2 component 7).

    Uses 'exon' features grouped by transcript_id; start is converted from
    GTF's 1-based inclusive to 0-based half-open.
    """
    import re

    tx_id_re = re.compile(r'transcript_id\s+"([^"]+)"')
    acc: dict[str, dict] = {}
    for line in Path(path).read_text().splitlines():
        if not line or line.startswith("#"):
            continue
        f = line.split("\t")
        if len(f) < 9 or f[2] != "exon":
            continue
        m = tx_id_re.search(f[8])
        if not m:
            raise ValueError(f"exon without transcript_id: {line[:80]}")
        tid = m.group(1)
        rec = acc.setdefault(tid, {"chrom": f[0], "strand": f[6],
                                   "starts": [], "ends": []})
        if rec["chrom"] != f[0] or rec["strand"] != f[6]:
            raise ValueError(f"transcript {tid} spans chroms/strands")
        rec["starts"].append(int(f[3]) - 1)
        rec["ends"].append(int(f[4]))
    out = []
    for tid, rec in acc.items():
        order = np.argsort(rec["starts"])
        out.append(Transcript(
            tid, rec["chrom"], rec["strand"],
            np.asarray(rec["starts"], dtype=np.int64)[order],
            np.asarray(rec["ends"], dtype=np.int64)[order]))
    return out


def load_annotation(path) -> list[Transcript]:
    """Dispatch on extension: .gtf/.gff -> GTF parser, else exon-table TSV."""
    suffix = Path(path).suffix.lower()
    if suffix in (".gtf", ".gff"):
        return parse_gtf(path)
    return parse_annotation(path)


def splice_transcript(genome: dict[str, np.ndarray], tx: Transcript) -> np.ndarray:
    chrom = genome[tx.chrom]
    parts = [chrom[int(s):int(e)] for s, e in zip(tx.exon_starts, tx.exon_ends)]
    spliced = np.concatenate(parts)
    return revcomp_codes(spliced) if tx.strand == "-" else spliced


@dataclass
class CombinedReference:
    """PackedReference over genome chroms + tx:: pseudo-chroms, plus the exon
    tables needed for projection."""

    ref: PackedReference
    transcripts: dict  # tx_id -> Transcript
    genome_names: list

    @classmethod
    def build(cls, genome: dict[str, np.ndarray],
              transcripts: list[Transcript], spacer: int) -> "CombinedReference":
        seqs = dict(genome)
        for tx in transcripts:
            seqs[TX_PREFIX + tx.tx_id] = splice_transcript(genome, tx)
        ref = PackedReference.from_dict(seqs, spacer=spacer)
        return cls(ref=ref, transcripts={t.tx_id: t for t in transcripts},
                   genome_names=list(genome.keys()))

    # --- serialization ---
    def save(self, prefix) -> None:
        self.ref.save(prefix)
        meta = {
            "genome_names": self.genome_names,
            "transcripts": [
                {"tx_id": t.tx_id, "chrom": t.chrom, "strand": t.strand,
                 "exon_starts": t.exon_starts.tolist(),
                 "exon_ends": t.exon_ends.tolist()}
                for t in self.transcripts.values()],
        }
        Path(str(prefix) + ".combined.json").write_text(json.dumps(meta))

    @classmethod
    def load(cls, prefix) -> "CombinedReference":
        ref = PackedReference.load(prefix)
        meta = json.loads(Path(str(prefix) + ".combined.json").read_text())
        txs = {d["tx_id"]: Transcript(
            d["tx_id"], d["chrom"], d["strand"],
            np.asarray(d["exon_starts"], dtype=np.int64),
            np.asarray(d["exon_ends"], dtype=np.int64))
            for d in meta["transcripts"]}
        return cls(ref=ref, transcripts=txs, genome_names=meta["genome_names"])


def project_to_genome(tx: Transcript, tx_pos: int,
                      cigar: list[tuple[str, int]], read_strand: int
                      ) -> tuple[str, int, list[tuple[str, int]], int]:
    """Project a transcript-space alignment to genome space.

    tx_pos: 0-based start in transcript orientation; cigar: M/I/D ops in
    transcript space. Returns (chrom, genomic_start_0based, genomic_cigar
    with N ops for skipped introns, genomic_strand).

    For '-' transcripts the spliced sequence was reverse-complemented, so the
    alignment interval flips to the spliced-plus frame, the CIGAR reverses,
    and the strand toggles (read fwd on a '-' transcript = genome reverse).
    """
    span = sum(ln for op, ln in cigar if op in "MD")
    T = tx.spliced_len
    if tx.strand == "-":
        s_start = T - (tx_pos + span)
        walk_cigar = list(reversed(cigar))
        g_strand = 1 - read_strand
    else:
        s_start = tx_pos
        walk_cigar = list(cigar)
        g_strand = read_strand
    if s_start < 0 or tx_pos + span > T:
        raise ValueError("alignment outside transcript")

    cum = tx.cumlens
    out: list[tuple[str, int]] = []

    def emit(op: str, ln: int) -> None:
        if ln == 0:
            return
        if out and out[-1][0] == op:
            out[-1] = (op, out[-1][1] + ln)
        else:
            out.append((op, ln))

    s = s_start  # position in spliced-plus coords
    genomic_start = None
    prev_gend = None  # genomic end of the last ref-consuming segment
    for op, ln in walk_cigar:
        if op == "I":
            emit("I", ln)
            continue
        # M or D consume spliced bases; split across exons, emitting an N op
        # for every genomic gap (intron) between consecutive segments
        remaining = ln
        while remaining > 0:
            e = int(np.searchsorted(cum, s, side="right")) - 1
            take = min(remaining, int(cum[e + 1] - s))
            gpos = int(tx.exon_starts[e] + (s - cum[e]))
            if genomic_start is None:
                genomic_start = gpos
            if prev_gend is not None and gpos > prev_gend:
                emit("N", gpos - prev_gend)
            emit(op, take)
            prev_gend = gpos + take
            s += take
            remaining -= take
    if genomic_start is None:
        raise ValueError("cigar consumes no reference bases")
    return tx.chrom, genomic_start, out, g_strand


# ---------------------------------------------------------------------------
# combined alignment engine
# ---------------------------------------------------------------------------

def _mapq_host(x0: int, x1: int) -> int:
    """oracle._mapq (kept in sync; BWA bwase.c shape)."""
    import math
    if x0 > 1:
        return 0
    if x1 == 0:
        return 37
    return max(0, 23 - int(4.343 * math.log(x1)))


class CombinedEngine:
    """Aligns against the combined genome+transcriptome packing, projects
    transcript hits to genome space, and re-finalizes uniqueness/X0/MAPQ in
    genomic coordinates (a transcript hit and its genomic twin are ONE hit).

    Genome chromosomes are packed first and identically in both the combined
    and genome-only references, so genome-direct packed positions transfer
    unchanged; SAM/clusters are emitted against the genome-only reference.
    """

    def __init__(self, combined: CombinedReference, index: KmerIndex,
                 cfg: AlignConfig, s_tensor=None):
        import functools

        import jax

        from parasuite_tpu.errormodel.scoring import (
            complement_score_tensor, flat_score_tensor)
        from parasuite_tpu.ops.aligner import align_batch_with_candidates
        from parasuite_tpu.ops.device_index import DeviceIndex, ScoreParams

        self.combined = combined
        self.cfg = cfg
        self.didx = DeviceIndex.from_host(combined.ref, index)
        self.s_tensor = (s_tensor if s_tensor is not None
                         else flat_score_tensor(cfg, cfg.max_read_len))
        self.s_comp = complement_score_tensor(self.s_tensor)
        self.sprof = ScoreParams.from_tensor(self.s_tensor, cfg)
        self._align = jax.jit(functools.partial(align_batch_with_candidates,
                                                cfg=cfg))
        # genome-only view for emission (identical packing prefix)
        n_genome = len(combined.genome_names)
        self.genome_ref = PackedReference(
            seq=combined.ref.seq[: int(combined.ref.ends[n_genome - 1]) +
                                 cfg.chrom_spacer],
            names=combined.ref.names[:n_genome],
            starts=combined.ref.starts[:n_genome],
            ends=combined.ref.ends[:n_genome])
        self._n_genome = n_genome
        self.sam_ref = self.genome_ref  # SAM/clusters in genome coordinates
        # transcripts pack AFTER genome chromosomes, so "is this candidate a
        # transcript hit" is a single packed-position threshold — the key to
        # the host fast path in to_host
        self._tx_boundary = (int(combined.ref.starts[n_genome])
                             if len(combined.ref.names) > n_genome
                             else int(combined.ref.total_len))

    def align_device(self, codes, lengths):
        """Device step -> (AlignResult in combined space, CandidateTable)."""
        import jax

        from parasuite_tpu.ops.device_index import min_scores_host

        out = self._align(self.didx, self.sprof, codes, lengths,
                          min_scores_host(lengths, self.cfg))
        jax.tree.map(lambda x: x.copy_to_host_async(), out)
        return out

    def profile_counts_device(self, codes, lengths, devout):
        """Profile counts off the combined-space result (transcript bases
        equal their genomic twins, so machine-frame counting is identical)."""
        import functools

        import jax

        from parasuite_tpu.ops.profile_update import profile_counts_batch

        if not hasattr(self, "_counts_fn"):
            self._counts_fn = jax.jit(functools.partial(profile_counts_batch,
                                                        cfg=self.cfg))
        res = devout[0]
        return self._counts_fn(self.didx, codes, lengths, res.mapped,
                               res.strand, res.pos, res.ug_equal)

    def align_to_host(self, batch):
        return self.to_host(batch, self.align_device(batch.codes,
                                                     batch.lengths))

    def to_host(self, batch, devout):
        """-> HostAlignments in GENOME packed coordinates, CIGARs may contain
        N ops for junction-spanning transcript hits.

        Fast path (VERDICT r1 weak #4): reads with NO valid transcript-space
        candidate — the vast majority outside exon-dense regions — take the
        device finalize verbatim (in combined space it equals the plain
        genome finalize when no tx candidate exists, since transcripts pack
        after the genome and contribute no valid entries). Only reads with a
        transcript hit pay the per-candidate projection/re-finalize loop.
        """
        import jax

        from parasuite_tpu.pipeline.align import HostAlignments, host_traceback
        from parasuite_tpu.pipeline.clusters import tc_count_from_cigar

        cfg = self.cfg
        res, table = jax.device_get(devout)  # one batched fetch
        valid = np.asarray(table.valid)
        strand = np.asarray(table.strand)
        pos = np.asarray(table.pos)
        score = np.asarray(table.score)
        ug_eq = np.asarray(table.ug_equal)
        diag = np.asarray(table.diag)
        B, n = valid.shape
        comb = self.combined
        cref = comb.ref

        out_mapped = np.zeros(B, dtype=bool)
        out_strand = np.zeros(B, dtype=np.int32)
        out_pos = np.full(B, -1, dtype=np.int64)
        out_score = np.zeros(B, dtype=np.int32)
        out_mapq = np.zeros(B, dtype=np.int32)
        out_x0 = np.zeros(B, dtype=np.int32)
        out_x1 = np.zeros(B, dtype=np.int32)
        out_nm = np.zeros(B, dtype=np.int32)
        out_ug = np.ones(B, dtype=bool)
        out_tc = np.zeros(B, dtype=np.int32)
        from parasuite_tpu.pipeline.align import LazyCigars
        lens0 = np.asarray(batch.lengths)
        out_cigars = LazyCigars(out_mapped, lens0)

        from parasuite_tpu.utils.dna import revcomp_codes as _rc

        any_tx = (valid & (pos >= self._tx_boundary)).any(axis=1)
        lens = np.asarray(batch.lengths)

        # ---- fast path: genome-only candidates -> device finalize verbatim
        fast = ~any_tx & (lens > 0)
        r_mapped = np.asarray(res.mapped)
        fm = fast & r_mapped
        out_mapped[fm] = True
        out_strand[fm] = np.asarray(res.strand)[fm]
        out_pos[fm] = np.asarray(res.pos)[fm]
        out_score[fm] = np.asarray(res.score)[fm]
        out_mapq[fm] = np.asarray(res.mapq)[fm]
        out_x0[fm] = np.asarray(res.x0)[fm]
        out_x1[fm] = np.asarray(res.x1)[fm]
        out_nm[fm] = np.asarray(res.nm)[fm]
        out_ug[fm] = np.asarray(res.ug_equal)[fm]
        out_tc[fm] = np.asarray(res.tc_count)[fm]
        r_diag = np.asarray(res.diag)
        for b in np.nonzero(fm & ~np.asarray(res.ug_equal))[0]:
            ln = int(lens[b])
            oriented = (batch.codes[b, :ln] if out_strand[b] == 0
                        else _rc(batch.codes[b, :ln]))
            p, cigar, total_nm = host_traceback(
                cref.seq, self.s_tensor, self.s_comp, cfg, oriented, ln,
                int(out_strand[b]), int(r_diag[b]))
            out_pos[b] = p
            out_cigars[b] = cigar
            out_nm[b] = total_nm
            out_tc[b] = tc_count_from_cigar(cref.seq, p, oriented,
                                            int(out_strand[b]), cigar)

        # ---- slow path: at least one transcript candidate -> project + re-
        # finalize in genome space
        tx_rows = np.nonzero(any_tx & (lens > 0))[0]
        if tx_rows.shape[0]:
            ci_all, local_all = cref.locate(
                pos[tx_rows].reshape(-1).astype(np.int64))
            ci_all = ci_all.reshape(-1, n)
            local_all = local_all.reshape(-1, n)
        for row_i, b in enumerate(tx_rows):
            ln = int(batch.lengths[b])
            # gather per-entry genomic records
            recs = []  # (score, gstrand, gchrom_idx, gpos, src_tx, cigar, nm, entry)
            for t in range(n):
                if not valid[b, t]:
                    continue
                ci = int(ci_all[row_i, t])
                if ci < 0:
                    continue
                st = int(strand[b, t])
                oriented = (batch.codes[b, :ln] if st == 0
                            else _rc(batch.codes[b, :ln]))
                name = cref.names[ci]
                if ci < self._n_genome:
                    # genome-direct; whole span must stay in-chromosome
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
                            cref.seq, self.s_tensor, self.s_comp, cfg,
                            oriented, ln, st, int(diag[b, t]))
                        span = sum(l for op, l in cigar if op in "MD")
                        if not (p >= cref.starts[ci]
                                and p + span - 1 < cref.ends[ci]):
                            continue
                        recs.append((int(score[b, t]), st, ci, p, 0, cigar, nm))
                else:
                    tx = comb.transcripts[name[len(TX_PREFIX):]]
                    if ug_eq[b, t]:
                        txp = int(local_all[row_i, t])
                        cigar0 = [("M", ln)]
                        p0 = int(pos[b, t])
                        rb = cref.seq[p0 : p0 + ln]
                        nm = int(np.sum((rb != oriented) | (rb == 4)
                                        | (oriented == 4)))
                    else:
                        p_packed, cigar0, nm = host_traceback(
                            cref.seq, self.s_tensor, self.s_comp, cfg,
                            oriented, ln, st, int(diag[b, t]))
                        txp = int(p_packed - cref.starts[ci])
                    try:
                        chrom, gpos, gcigar, gstrand = project_to_genome(
                            tx, txp, cigar0, st)
                    except ValueError:
                        continue
                    gci = self.genome_ref.names.index(chrom)
                    gpacked = int(self.genome_ref.starts[gci]) + gpos
                    recs.append((int(score[b, t]), gstrand, gci, gpacked, 1,
                                 gcigar, nm))
            if not recs:
                continue
            # dedupe by (strand, chrom, pos): best score, genome-source first,
            # then input order
            seen: dict = {}
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
            out_mapped[b] = True
            out_strand[b] = best[1]
            out_pos[b] = best[3]
            out_score[b] = best_score
            out_x0[b] = x0
            out_x1[b] = x1
            out_mapq[b] = _mapq_host(x0, x1)
            out_nm[b] = best[6]
            cigar = best[5]
            out_ug[b] = (len(cigar) == 1 and cigar[0][0] == "M")
            out_cigars[b] = cigar
            # machine-frame T->C over M segments (for cluster statistics)
            st = best[1]
            oriented = (batch.codes[b, :ln] if st == 0
                        else _rc(batch.codes[b, :ln]))
            out_tc[b] = tc_count_from_cigar(self.genome_ref.seq, best[3],
                                            oriented, st, cigar)

        return HostAlignments(mapped=out_mapped, strand=out_strand,
                              pos=out_pos, score=out_score, mapq=out_mapq,
                              x0=out_x0, x1=out_x1, nm=out_nm,
                              ug_equal=out_ug, cigars=out_cigars,
                              tc_count=out_tc)

    def emit_sam(self, batch, host, writer) -> None:
        from parasuite_tpu.io.sam import format_record

        for b in range(batch.n_real):
            writer.write(format_record(
                batch.names[b], batch.codes[b], int(batch.lengths[b]),
                batch.qual_bytes(b), self.genome_ref,
                mapped=bool(host.mapped[b]), strand=int(host.strand[b]),
                packed_pos=int(host.pos[b]), mapq=int(host.mapq[b]),
                cigar=host.cigars[b], score=int(host.score[b]),
                nm=int(host.nm[b]), x0=int(host.x0[b]), x1=int(host.x1[b])))


def build_combined_index(fasta, annotation, out_prefix, cfg: AlignConfig) -> dict:
    """CLI entry: FASTA + exon table -> combined packed ref + k-mer index."""
    from parasuite_tpu.io.fasta import read_fasta

    genome = read_fasta(fasta)
    txs = load_annotation(annotation)
    comb = CombinedReference.build(genome, txs, spacer=cfg.chrom_spacer)
    idx = KmerIndex.build(comb.ref.seq, cfg.kmer_size)
    comb.save(out_prefix)
    idx.save(out_prefix)
    Path(str(out_prefix) + ".config.json").write_text(cfg.to_json())
    return {"genome_chroms": len(genome), "transcripts": len(txs),
            "packed_len": comb.ref.total_len, "kmers": idx.n_kmers}
