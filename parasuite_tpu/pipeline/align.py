"""Single-pass alignment pipeline: ReadBatch in, SAM records + stats out.

The reference's pipeline driver shells out to bwa and shuttles files between
stages (SURVEY.md §3.1 process boundaries); here the whole align step is one
jitted device call, and only SAM text emission (plus the <<1% gapped-read
tracebacks) runs on host.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import numpy as np

from parasuite_tpu.config import AlignConfig
from parasuite_tpu.errormodel.scoring import (complement_score_tensor,
                                              flat_score_tensor)
from parasuite_tpu.index.kmer import KmerIndex
from parasuite_tpu.index.reference import PackedReference
from parasuite_tpu.io.batch import ReadBatch
from parasuite_tpu.io.sam import format_record
from parasuite_tpu.ops.aligner import align_batch
from parasuite_tpu.ops.device_index import (DeviceIndex, ScoreParams,
                                            min_scores_host)
from parasuite_tpu.ops.profile_update import profile_counts_batch
from parasuite_tpu.oracle.align import (_ref_window, _score_rows, banded_dp,
                                        traceback_alignment)
from parasuite_tpu.utils.dna import N, revcomp_codes


def host_traceback(ref_seq: np.ndarray, s_tensor: np.ndarray,
                   s_comp: np.ndarray, cfg: AlignConfig,
                   oriented_read: np.ndarray, read_len: int, strand: int,
                   diag: int) -> tuple[int, list, int]:
    """Re-run the banded DP on host for one gapped read and trace it back.

    -> (packed_start_pos, cigar, nm). Shared by the plain and combined
    engines; gapped reads are <<1% so this never dominates (gapless fast
    path, SURVEY.md §7)."""
    w = cfg.band_width
    s_eff = s_tensor if strand == 0 else s_comp
    rows = _score_rows(s_eff, oriented_read, read_len, strand)
    refwin = _ref_window(ref_seq, diag, read_len, w)
    _score, dp_j, _u, _uj, tables = banded_dp(rows, refwin, read_len, cfg,
                                              keep_tables=True)
    start_j, cigar, gap_nm = traceback_alignment(tables, rows, refwin,
                                                 read_len, dp_j, cfg)
    pos = diag - w + start_j
    nm = gap_nm
    ri, qi = pos, 0
    for op, oln in cigar:
        if op == "M":
            rb = ref_seq[ri : ri + oln]
            cb = oriented_read[qi : qi + oln]
            nm += int(np.sum((rb != cb) | (rb == N) | (cb == N)))
            ri += oln
            qi += oln
        elif op == "I":
            qi += oln
        else:
            ri += oln
    return pos, cigar, nm


def host_tracebacks_batch(ref_seq: np.ndarray, s_tensor: np.ndarray,
                          s_comp: np.ndarray, cfg: AlignConfig,
                          oriented: np.ndarray, lens: np.ndarray,
                          strands: np.ndarray, diags: np.ndarray
                          ) -> list[tuple[int, list, int]]:
    """host_traceback for MANY gapped reads at once: the banded DP tables
    are filled for all G reads in one numpy pass (the per-read oracle DP is
    ~3.5 ms of Python loops; on exon-dense references 1-2% of reads go
    gapped, which made to_host the pipeline bottleneck — measured 0.75 s of
    a 16k batch, i.e. the entire combined-world throughput gap vs bench.py's
    world). Per-read work that remains is the O(L) traceback walk on the
    finished tables, via oracle.traceback_alignment — so tie-break semantics
    are the oracle's by construction, and outputs are bit-identical to
    host_traceback (tests/test_pipeline.py::test_batched_traceback_parity).

    oriented: int8 [G, L] genome-frame reads (N-padded past each length).
    -> [(packed_start_pos, cigar, nm)] per read.
    """
    from parasuite_tpu.oracle.align import NEG, traceback_alignment

    G = oriented.shape[0]
    if G == 0:
        return []
    L = int(lens.max())
    w = cfg.band_width
    band = 2 * w + 1
    go, ge = cfg.gap_open, cfg.gap_extend
    Rn = ref_seq.shape[0]
    lens = lens.astype(np.int64)
    diags = diags.astype(np.int64)

    # score rows for every read: rows[g, i, r] = s_eff[prof, r, read[g, i]]
    i_ax = np.arange(L)
    prof = np.where(strands[:, None] == 0, i_ax[None, :],
                    np.clip(lens[:, None] - 1 - i_ax[None, :], 0, None))
    s_stack = np.stack([s_tensor, s_comp])            # [2, Lmax, 5, 5]
    rd = np.clip(oriented[:, :L].astype(np.int64), 0, 4)
    rows = s_stack[strands[:, None, None],
                   prof[:, :, None],
                   np.arange(5)[None, None, :],
                   rd[:, :, None]].astype(np.int64)    # [G, L, 5]

    # reference windows: refwin[g, t] = ref[diag - w + t], N out of range
    win = L + 2 * w
    widx = (diags - w)[:, None] + np.arange(win)[None, :]
    inb = (widx >= 0) & (widx < Rn)
    refwin = np.where(inb, ref_seq[np.clip(widx, 0, Rn - 1)],
                      np.int8(N)).astype(np.int64)     # [G, win]

    # banded DP, all reads at once (int64, semantics = oracle.banded_dp)
    M = np.full((G, L, band), NEG, dtype=np.int64)
    Ix = np.full((G, L, band), NEG, dtype=np.int64)
    Iy = np.full((G, L, band), NEG, dtype=np.int64)
    g_ax = np.arange(G)[:, None]
    jge = np.arange(band, dtype=np.int64) * ge

    def iy_prefix(m_i, iy_row):
        # Iy[j] = max_{u<j} (M[u] - go - (j-1-u)*ge), NEG at j=0: the
        # (j-1-u)*ge term telescopes — cummax over (M[u] + u*ge), then
        # subtract (j-1)*ge. NEG-region values can differ from the oracle's
        # recurrence by O(go) but stay far below NEG//2, so every real
        # comparison/threshold decides identically (parity-tested).
        cm = np.maximum.accumulate(m_i + jge[None, :], axis=1)
        iy_row[:, 1:] = cm[:, :-1] - go - \
            (np.arange(1, band, dtype=np.int64) - 1)[None, :] * ge
        return iy_row

    sub0 = rows[g_ax, 0, refwin[:, 0:band]]
    M[:, 0] = sub0
    Iy[:, 0] = iy_prefix(M[:, 0], Iy[:, 0].copy())
    for i in range(1, L):
        act = (i < lens)
        if not act.any():
            break
        sub = rows[g_ax, i, refwin[:, i : i + band]]
        m_p, ix_p, iy_p = M[:, i - 1], Ix[:, i - 1], Iy[:, i - 1]
        best_prev = np.maximum(m_p, np.maximum(ix_p, iy_p))
        m_new = np.where(best_prev > NEG // 2, sub + best_prev, NEG)
        ix_new = np.full((G, band), NEG, dtype=np.int64)
        ix_new[:, :-1] = np.maximum(m_p[:, 1:] - go, ix_p[:, 1:] - ge)
        iy_new = iy_prefix(m_new, np.full((G, band), NEG, dtype=np.int64))
        upd = act[:, None]
        M[:, i] = np.where(upd, m_new, M[:, i])
        Ix[:, i] = np.where(upd, ix_new, Ix[:, i])
        Iy[:, i] = np.where(upd, iy_new, Iy[:, i])

    out = []
    for g in range(G):
        ln = int(lens[g])
        last = M[g, ln - 1]
        dp_j = int(np.argmax(last))
        tables = (M[g], Ix[g], Iy[g])
        start_j, cigar, gap_nm = traceback_alignment(
            tables, rows[g], refwin[g], ln, dp_j, cfg)
        pos = int(diags[g]) - w + start_j
        nm = gap_nm
        ri, qi = pos, 0
        rd_g = oriented[g]
        for op, oln in cigar:
            if op == "M":
                rb = ref_seq[ri : ri + oln]
                cb = rd_g[qi : qi + oln]
                nm += int(np.sum((rb != cb) | (rb == N) | (cb == N)))
                ri += oln
                qi += oln
            elif op == "I":
                qi += oln
            else:
                ri += oln
        out.append((pos, cigar, nm))
    return out


class LazyCigars:
    """List-like CIGAR store: gapped/junction overrides live in a sparse
    dict; ungapped mapped reads synthesize [("M", length)] on access.
    Building 32k trivial [("M", 50)] lists per batch measured ~14 ms of
    GIL-held Python per batch — pure waste when the native SAM formatter
    never looks at them."""

    __slots__ = ("_over", "_mapped", "_lengths")

    def __init__(self, mapped, lengths):
        self._over: dict = {}
        self._mapped = mapped
        self._lengths = lengths

    def __getitem__(self, b):
        c = self._over.get(int(b))
        if c is not None:
            return c
        return ([("M", int(self._lengths[b]))] if self._mapped[b] else [])

    def __setitem__(self, b, cigar):
        self._over[int(b)] = cigar

    def __len__(self):
        return len(self._lengths)

    def overrides_in(self, b: int, e: int):
        """(index, cigar) pairs with a non-default CIGAR in [b, e) — what
        the native formatters need, without touching default rows."""
        return [(i, c) for i, c in self._over.items() if b <= i < e]


@dataclass
class HostAlignments:
    """Alignment results pulled to host for one batch (numpy, [B])."""

    mapped: np.ndarray
    strand: np.ndarray
    pos: np.ndarray          # packed start (exact for ungapped; gapped reads
                             # carry the traceback-corrected value)
    score: np.ndarray
    mapq: np.ndarray
    x0: np.ndarray
    x1: np.ndarray
    nm: np.ndarray
    ug_equal: np.ndarray
    cigars: list             # [(op, len)] per read
    tc_count: np.ndarray     # machine-frame T->C conversions per read
    xa: list = None          # per-read XA:Z alternative-hit strings (or None)


class AlignerEngine:
    """Holds device state and the jitted align step for one reference+profile."""

    def __init__(self, ref: PackedReference, index: KmerIndex,
                 cfg: AlignConfig, s_tensor: np.ndarray | None = None,
                 xa_tags: bool = False, xa_limit: int = 10):
        self.ref = ref
        self.sam_ref = ref  # reference used for SAM emission/clusters
        self.cfg = cfg
        self.xa_tags = xa_tags
        self.xa_limit = xa_limit
        self.xa_dropped = 0  # alternates over xa_limit (counted, not silent)
        self.didx = DeviceIndex.from_host(ref, index)
        self.s_tensor = (s_tensor if s_tensor is not None
                         else flat_score_tensor(cfg, cfg.max_read_len))
        self.s_comp = complement_score_tensor(self.s_tensor)
        self.sprof = ScoreParams.from_tensor(self.s_tensor, cfg)
        if xa_tags:
            from parasuite_tpu.ops.aligner import align_batch_with_candidates

            self._align_cand = jax.jit(functools.partial(
                align_batch_with_candidates, cfg=cfg))
            self._align = lambda *a: self._align_cand(*a)[0]
        else:
            self._align = jax.jit(functools.partial(align_batch, cfg=cfg))
        self._counts = jax.jit(functools.partial(profile_counts_batch, cfg=cfg))
        # wire-packed fast path (ops/aligner.PackedResult): uint8 field
        # ranges hold only under these bounds (band_width <= 15: the diag
        # band offset rides in 5 bits of the flags byte)
        self.supports_packed = (not xa_tags and cfg.max_read_len <= 255
                                and 2 * cfg.max_candidates <= 255
                                and cfg.band_width <= 15)
        if self.supports_packed:
            from parasuite_tpu.ops.aligner import (align_batch_packed,
                                                   min_score_table)

            self._ms_table = jax.device_put(min_score_table(cfg))
            self._align_packed = jax.jit(
                functools.partial(align_batch_packed, cfg=cfg),
                static_argnames=("with_counts",))
        # two-tier seeding rescue (config.rescue_kmer): a second k-mer index
        # at the smaller k plus a jitted step under cfg2; unmapped reads
        # retry through it in to_host (_apply_rescue). Off by default — the
        # primary operating point stays bit-identical when rescue_kmer == 0.
        self._rescue = None
        self.rescue_overflow = 0   # unmapped rows beyond the rescue batch
        self.rescue_mapped = 0     # reads the rescue pass recovered
        if cfg.rescue_kmer:
            from parasuite_tpu.ops import aligner as _ops

            cfg2 = cfg.replace(kmer_size=cfg.rescue_kmer, rescue_kmer=0,
                               max_seeds=max(cfg.rescue_seeds,
                                             cfg.max_seeds))
            idx2 = KmerIndex.build(ref.seq, cfg2.kmer_size)
            didx2 = DeviceIndex.from_host(ref, idx2)
            cap = max(256, cfg.batch_size // 8)
            if self.supports_packed:
                step2 = jax.jit(functools.partial(_ops.align_batch_packed,
                                                  cfg=cfg2))
            else:
                step2 = jax.jit(functools.partial(_ops.align_batch,
                                                  cfg=cfg2))
            self._rescue = (cfg2, didx2, step2, cap)

    def set_profile(self, s_tensor: np.ndarray) -> None:
        """Swap in a learned score tensor (pass 2). Same compiled fn — the
        tensor is a runtime argument, not a constant."""
        self.s_tensor = s_tensor
        self.s_comp = complement_score_tensor(s_tensor)
        self.sprof = ScoreParams.from_tensor(s_tensor, self.cfg)

    # --- device steps ---
    def align_device(self, codes: np.ndarray, lengths: np.ndarray):
        """-> AlignResult, or (AlignResult, CandidateTable) with xa_tags.

        Starts the device->host copies asynchronously so the payload streams
        back over the tunnel while the device crunches the NEXT batch and the
        host formats the PREVIOUS one (streaming_align's software pipeline);
        to_host's device_get then completes nearly instantly."""
        if self.xa_tags:
            out = self._align_cand(self.didx, self.sprof, codes, lengths,
                                   min_scores_host(lengths, self.cfg))
        else:
            out = self._align(self.didx, self.sprof, codes, lengths,
                              min_scores_host(lengths, self.cfg))
        jax.tree.map(lambda x: x.copy_to_host_async(), out)
        return out

    def align_device_packed(self, codes: np.ndarray, lengths: np.ndarray,
                            with_counts: bool = False):
        """Wire-packed align step (streaming hot path): 2-bit codes plus an
        N bitmask up, PackedResult down — ~2.5x/3.7x less tunnel payload
        up/down vs align_device. -> PackedResult, or (PackedResult,
        counts [L,4,4]) with the profile matrix fused into the same device
        call."""
        from parasuite_tpu.ops.aligner import pack_codes_host

        two, nmask = pack_codes_host(codes)
        out = self._align_packed(self.didx, self.sprof, two, nmask,
                                 lengths.astype(np.uint16), self._ms_table,
                                 with_counts=with_counts)
        jax.tree.map(lambda x: x.copy_to_host_async(), out)
        return out

    def profile_counts_device(self, codes, lengths, res):
        if not hasattr(res, "mapped"):
            res = res[0]
        return self._counts(self.didx, codes, lengths, res.mapped, res.strand,
                            res.pos, res.ug_equal)

    # --- host finishing ---
    def to_host(self, batch: ReadBatch, res) -> HostAlignments:
        """Pull results to host; run tracebacks for the rare gapped reads."""
        from parasuite_tpu.ops.aligner import PackedResult, unpack_result_host

        cfg = self.cfg
        table = None
        if isinstance(res, PackedResult):
            res = unpack_result_host(jax.device_get(res), cfg.band_width)
        elif not hasattr(res, "mapped"):
            res, table = res
        # one batched fetch: per-field np.asarray would pay a separate
        # device->host round trip each (ruinous over the remote-TPU tunnel:
        # measured 300ms/batch for 11 fields vs ~30ms batched)
        res, table = jax.device_get((res, table))
        mapped = np.asarray(res.mapped)
        strand = np.asarray(res.strand)
        pos = np.asarray(res.pos).copy()
        score = np.asarray(res.score)
        ug_eq = np.asarray(res.ug_equal)
        nm = np.asarray(res.nm).copy()
        diag = np.asarray(res.diag)
        # cigars: gapless fast path builds the whole list in one sweep; only
        # the rare gapped winners (mapped & !ug_equal, <<1%) pay a host DP
        # traceback. T->C counts come from the device (finalize) for ungapped
        # winners; gapped rows recount over the real CIGAR here.
        from parasuite_tpu.pipeline.clusters import tc_count_from_cigar

        lens = batch.lengths
        tc = np.asarray(res.tc_count).copy()
        mapq = np.asarray(res.mapq)
        x0 = np.asarray(res.x0)
        x1 = np.asarray(res.x1)
        self.last_rescue_rows = None  # rows rescued in THIS batch (stream
        # profile accumulation counts their substitutions host-side: the
        # fused device counts are pass-1-keyed and never saw them)
        # rescue dispatches NOW and merges after the primary host work, so
        # its device round-trip overlaps the gapped tracebacks + CIGAR
        # build (a synchronous call here measured 22-32% of 36bp e2e on the
        # tunnel — tools/bench_rescue.py)
        pend_rescue = (self._dispatch_rescue(batch, mapped)
                       if self._rescue is not None else None)
        cigars = LazyCigars(mapped, lens)
        grows = np.nonzero(mapped & ~ug_eq)[0]
        if grows.shape[0]:
            # all gapped reads in ONE vectorized DP (host_tracebacks_batch):
            # on exon-dense references 1-2% of reads go gapped and the
            # per-read oracle DP was the pipeline bottleneck
            L = batch.codes.shape[1]
            om = np.full((grows.shape[0], L), 4, dtype=np.int8)
            for k, b in enumerate(grows):
                ln = int(lens[b])
                om[k, :ln] = (batch.codes[b, :ln] if strand[b] == 0
                              else revcomp_codes(batch.codes[b, :ln]))
            tbs = host_tracebacks_batch(
                self.ref.seq, self.s_tensor, self.s_comp, cfg, om,
                lens[grows], strand[grows], diag[grows])
            for k, b in enumerate(grows):
                p, cigar, total_nm = tbs[k]
                pos[b] = p
                cigars[b] = cigar
                nm[b] = total_nm
                tc[b] = tc_count_from_cigar(self.ref.seq, p,
                                            om[k, : int(lens[b])],
                                            int(strand[b]), cigar)
        if pend_rescue is not None:
            (mapped, strand, pos, score, mapq, x0, x1, nm, ug_eq, diag,
             tc) = self._finish_rescue(pend_rescue, batch, cigars, mapped,
                                       strand, pos, score, mapq, x0, x1, nm,
                                       ug_eq, diag, tc)
        xa = (self._xa_strings(batch, table, mapped, strand, pos, score)
              if table is not None else None)
        return HostAlignments(mapped=mapped, strand=strand, pos=pos,
                              score=score, mapq=mapq,
                              x0=x0, x1=x1,
                              nm=nm, ug_equal=ug_eq, cigars=cigars,
                              tc_count=tc, xa=xa)

    def _dispatch_rescue(self, batch, mapped):
        """Two-tier seeding (config.rescue_kmer), dispatch half: start the
        smaller-k device pass over this batch's unmapped reads and return
        the pending handle; _finish_rescue merges after the primary host
        work so the round-trip overlaps it.

        Rescued rows carry the cfg2 result wholesale — pos/score/NM/MAPQ/
        X0/X1 are the small-k pass's values (both passes are oracle-exact
        under their configs, so the merge is deterministic). Profile counts:
        the fused device matrix is pass-1-keyed, so pipeline/stream.py
        counts rescued rows host-side from self.last_rescue_rows — every
        emitted record contributes, like the reference's record sweep
        (SURVEY.md §3.3). XA alternates are not emitted for rescued rows.
        Unmapped rows beyond the rescue batch cap stay unmapped and are
        counted in self.rescue_overflow (no silent cap, SURVEY.md §7)."""
        from parasuite_tpu.ops.aligner import pack_codes_host

        cfg2, didx2, step2, cap = self._rescue
        lens = np.asarray(batch.lengths)
        # n_total, not n_real (len(names)): padding rows are excluded by
        # their zero length, and nameless library-level batches still rescue
        n = batch.codes.shape[0]
        rows = np.nonzero(~mapped[:n] & (lens[:n] > 0))[0]
        if rows.shape[0] == 0:
            return None
        if rows.shape[0] > cap:
            self.rescue_overflow += int(rows.shape[0] - cap)
            rows = rows[:cap]
        L = batch.codes.shape[1]
        codes2 = np.full((cap, L), 4, dtype=np.int8)
        lens2 = np.zeros(cap, dtype=np.int32)
        codes2[: rows.shape[0]] = batch.codes[rows]
        lens2[: rows.shape[0]] = lens[rows]
        if self.supports_packed:
            two, nmask = pack_codes_host(codes2)
            out2 = step2(didx2, self.sprof, two, nmask,
                         lens2.astype(np.uint16), self._ms_table)
        else:
            out2 = step2(didx2, self.sprof, codes2, lens2,
                         min_scores_host(lens2, cfg2))
        jax.tree.map(lambda x: x.copy_to_host_async(), out2)
        return rows, out2

    def _finish_rescue(self, pend, batch, cigars, *arrays):
        """Merge half of the rescue pass: fetch the small-k results, write
        rescued rows into (copies of) the result arrays, rebind the CIGAR
        store, and run the (rare-within-rare) gapped rescued tracebacks.
        Gapped semantics equal the primary path's: band/gap parameters are
        identical between tiers, so host_tracebacks_batch under self.cfg is
        exact for the rescue tier too."""
        from parasuite_tpu.ops.aligner import unpack_result_host
        from parasuite_tpu.pipeline.clusters import tc_count_from_cigar

        cfg2 = self._rescue[0]
        rows, out2 = pend
        r2 = jax.device_get(out2)
        if self.supports_packed:
            r2 = unpack_result_host(r2, cfg2.band_width)
        m2 = np.asarray(r2.mapped)[: rows.shape[0]]
        if not m2.any():
            return arrays
        hit = rows[m2]
        src = np.nonzero(m2)[0]
        self.rescue_mapped += int(hit.shape[0])
        self.last_rescue_rows = hit
        outs = [a.copy() for a in arrays]
        for o, f in zip(outs, ("mapped", "strand", "pos", "score", "mapq",
                               "x0", "x1", "nm", "ug_equal", "diag",
                               "tc_count")):
            o[hit] = np.asarray(getattr(r2, f))[src]
        (mapped, strand, pos, score, _mapq, _x0, _x1, nm, ug_eq, diag,
         tc) = outs
        # LazyCigars was built against the pre-merge mapped array; rescued
        # rows synthesize their "{L}M" default off the merged one
        cigars._mapped = mapped
        g2 = hit[~ug_eq[hit].astype(bool)]
        if g2.shape[0]:
            lens_all = np.asarray(batch.lengths)
            L = batch.codes.shape[1]
            om = np.full((g2.shape[0], L), 4, dtype=np.int8)
            for k, b in enumerate(g2):
                ln = int(lens_all[b])
                om[k, :ln] = (batch.codes[b, :ln] if strand[b] == 0
                              else revcomp_codes(batch.codes[b, :ln]))
            tbs = host_tracebacks_batch(
                self.ref.seq, self.s_tensor, self.s_comp, self.cfg, om,
                lens_all[g2], strand[g2], diag[g2])
            for k, b in enumerate(g2):
                p, cigar, total_nm = tbs[k]
                b = int(b)
                pos[b] = p
                cigars[b] = cigar
                nm[b] = total_nm
                tc[b] = tc_count_from_cigar(
                    self.ref.seq, p, om[k, : int(lens_all[b])],
                    int(strand[b]), cigar)
        return tuple(outs)

    def _xa_strings(self, batch, table, mapped, strand, pos, score,
                    rows=None):
        """Per-read XA:Z alternative-hit tags (BWA samse convention:
        chrom,(+/-)pos1,CIGAR,NM). Gapped alternates get a host DP traceback
        for a real CIGAR (they are <<1% of <<1%, so this never dominates).
        At most xa_limit alternates are emitted per read; overflow alternates
        are COUNTED in self.xa_dropped rather than silently discarded
        (SURVEY.md §7 "no silent caps"). rows optionally restricts emission
        to a subset of batch rows (combined mode handles transcript-candidate
        rows separately in its slow path)."""
        from parasuite_tpu.io.sam import cigar_string
        from parasuite_tpu.utils.dna import revcomp_codes as _rc

        t_valid = np.asarray(table.valid)
        t_strand = np.asarray(table.strand)
        t_pos = np.asarray(table.pos)
        t_score = np.asarray(table.score)
        t_ug = np.asarray(table.ug_equal)
        t_diag = np.asarray(table.diag)
        B, n = t_valid.shape
        xa: list = [None] * B
        G = self.sam_ref.seq.shape[0]
        for b in (range(B) if rows is None else rows):
            b = int(b)
            if not mapped[b] or not t_valid[b].any():
                continue
            ln = int(batch.lengths[b])
            # unique alternates != the chosen hit (seen keys are final
            # positions: gapped alternates dedupe AFTER traceback so a
            # traceback-shifted winner is never re-emitted as an alternate).
            # NOTE (ADVICE r2): xa_dropped is an approximate upper bound —
            # post-cap uniques are keyed by ungapped t_pos (no traceback),
            # so a post-cap duplicate of a traceback-shifted alternate can
            # be over-counted; acceptable for a diagnostic counter.
            seen = {(int(strand[b]), int(pos[b]))}
            alts = []  # (strand, packed_pos, cigar_str, nm)
            oriented_cache = {}
            tb_cache = {}  # (strand, diag) -> traceback; a repetitive read
            #                can present the same diagonal through several
            #                candidates — cap DP cost at one per diagonal

            def oriented_for(st):
                if st not in oriented_cache:
                    oriented_cache[st] = (batch.codes[b, :ln] if st == 0
                                          else _rc(batch.codes[b, :ln]))
                return oriented_cache[st]

            order = np.lexsort((t_pos[b], t_strand[b], -t_score[b]))
            for t in order:
                if not t_valid[b, t]:
                    continue
                st = int(t_strand[b, t])
                if len(alts) >= self.xa_limit:
                    # over the cap: count uniques by ungapped key (cheap,
                    # no traceback) instead of dropping silently
                    if (st, int(t_pos[b, t])) not in seen:
                        seen.add((st, int(t_pos[b, t])))
                        self.xa_dropped += 1
                    continue
                if t_ug[b, t]:
                    p = int(t_pos[b, t])
                    key = (st, p)
                    if key in seen:
                        continue
                    seen.add(key)
                    alts.append((st, p, f"{ln}M", None))
                else:
                    dkey = (st, int(t_diag[b, t]))
                    if dkey not in tb_cache:
                        tb_cache[dkey] = host_traceback(
                            self.sam_ref.seq, self.s_tensor, self.s_comp,
                            self.cfg, oriented_for(st), ln, st, dkey[1])
                    p, cigar, nm_alt = tb_cache[dkey]
                    key = (st, p)
                    if key in seen:
                        continue
                    seen.add(key)
                    alts.append((st, p, cigar_string(cigar), nm_alt))
            if not alts:
                continue
            parts = []
            for st, p, cig, nm_alt in alts:
                ci, local = self.sam_ref.locate(np.asarray([p]))
                if ci[0] < 0 or p + ln > G:
                    continue
                if nm_alt is None:
                    oriented = oriented_for(st)
                    rb = self.sam_ref.seq[p : p + ln]
                    nm_alt = int(np.sum((rb != oriented) | (rb == N)
                                        | (oriented == N)))
                parts.append(f"{self.sam_ref.names[int(ci[0])]},"
                             f"{'+' if st == 0 else '-'}{int(local[0]) + 1},"
                             f"{cig},{nm_alt}")
            if parts:
                xa[b] = "XA:Z:" + ";".join(parts) + ";"
        return xa

    def gapped_indel_counts(self, batch: ReadBatch, res, ins_counts,
                            del_counts, sub_counts=None) -> int:
        """Accumulate indel events — and, when sub_counts is given, the
        M-segment substitution counts — from this batch's gapped alignments
        (host tracebacks; <<1% of reads). Feeds ErrorProfile during pass-1
        inference so every aligned read contributes, like the reference's
        record loop (SURVEY.md §3.3). Returns the number of gapped reads."""
        from parasuite_tpu.errormodel.infer import (
            count_indels_from_cigar, count_substitutions_from_cigar)

        if not hasattr(res, "mapped"):
            res = res[0]
        mapped = np.asarray(res.mapped)
        ug_eq = np.asarray(res.ug_equal)
        strand = np.asarray(res.strand)
        diag = np.asarray(res.diag)
        n = batch.n_real
        grows = np.nonzero(mapped[:n] & ~ug_eq[:n])[0]
        if grows.shape[0] == 0:
            return 0
        L = batch.codes.shape[1]
        om = np.full((grows.shape[0], L), 4, dtype=np.int8)
        for k, b in enumerate(grows):
            ln = int(batch.lengths[b])
            om[k, :ln] = (batch.codes[b, :ln] if strand[b] == 0
                          else revcomp_codes(batch.codes[b, :ln]))
        tbs = host_tracebacks_batch(
            self.ref.seq, self.s_tensor, self.s_comp, self.cfg, om,
            np.asarray(batch.lengths)[grows], strand[grows], diag[grows])
        for k, b in enumerate(grows):
            ln = int(batch.lengths[b])
            pos, cigar, _nm = tbs[k]
            count_indels_from_cigar(cigar, ln, int(strand[b]), ins_counts,
                                    del_counts)
            if sub_counts is not None:
                count_substitutions_from_cigar(
                    self.ref.seq, pos, om[k, :ln], ln, int(strand[b]),
                    cigar, sub_counts)
        return int(grows.shape[0])

    # --- one-call convenience ---
    def align_to_host(self, batch: ReadBatch) -> HostAlignments:
        return self.to_host(batch, self.align_device(batch.codes, batch.lengths))

    def emit_sam(self, batch: ReadBatch, host: HostAlignments, writer) -> None:
        """Emit records in read order.

        All record shapes — ungapped, unmapped, gapped and junction CIGARs —
        go through the native C++ batch formatter in ONE call per batch
        (bytes identical to format_record — tests/test_native.py); only
        XA-tagged records use the Python path (run-fragmented native calls
        were measured at ~0.1 ms each, the emit bottleneck on exon-dense
        references)."""
        self._emit(batch, host, writer, bam=False)

    def emit_bam(self, batch: ReadBatch, host: HostAlignments, writer) -> None:
        """emit_sam's binary twin: one C++ BAM-record-formatter call per
        batch (bytes identical to encode_bam_record over the SAM text —
        tests/test_native.py); XA records emit SAM text via writer.write
        and the BAM sink encodes them. This is what lets `.bam` outputs
        stream straight through the writer thread with no .tmp.sam double
        pass (VERDICT r3 weak #3)."""
        self._emit(batch, host, writer, bam=True)

    def _emit(self, batch, host, writer, bam: bool) -> None:
        from parasuite_tpu import native

        n = batch.n_real
        use_native = (native.available()
                      and hasattr(writer, "write_block"))
        if not use_native:
            for b in range(n):
                writer.write(self._format_one(batch, host, b))
            return
        fmt = native.bam_format_batch if bam else None

        def emit_run(b: int, e: int) -> None:
            # A record the C++ formatter cannot represent (name+NUL > 255
            # bytes, MD text past its fixed buffer — possible with raised
            # max_read_len) returns -1 and the wrapper raises; that must not
            # abort the stream mid-run. Fall back to the per-record Python
            # formatter for just this run (ADVICE r4 low).
            try:
                writer.write_block(self._format_native_run(batch, host, b, e,
                                                           fmt=fmt))
            except RuntimeError:
                for i in range(b, e):
                    writer.write(self._format_one(batch, host, i))

        if host.xa is None:
            emit_run(0, n)
            return
        elig = np.asarray([host.xa[b] is None for b in range(n)])
        # vectorized run segmentation (a per-element Python scan here costs
        # ~3 ms per 32k batch — measurable against the ~1 us/record C++
        # formatter)
        bounds = np.flatnonzero(elig[1:] != elig[:-1]) + 1
        edges = np.concatenate(([0], bounds, [n]))
        for b, e in zip(edges[:-1], edges[1:]):
            b, e = int(b), int(e)
            if elig[b]:
                emit_run(b, e)
            else:
                for i in range(b, e):
                    writer.write(self._format_one(batch, host, i))

    _OP_CODE = {"M": 0, "I": 1, "D": 2, "N": 3}

    def _cigar_arrays(self, host, b, e):
        """Flat (cig_off, ops, lens) arrays for records [b, e) with
        non-default CIGARs (None when every record is default)."""
        cig = host.cigars
        if isinstance(cig, LazyCigars):
            items = cig.overrides_in(b, e)
        else:
            items = [(i, cig[i]) for i in range(b, e)
                     if cig[i] and not (len(cig[i]) == 1
                                        and cig[i][0][0] == "M")]
        if not items:
            return None
        counts = np.zeros(e - b, dtype=np.int64)
        for i, c in items:
            counts[i - b] = len(c)
        off = np.zeros(e - b + 1, dtype=np.int64)
        np.cumsum(counts, out=off[1:])
        total = int(off[-1])
        ops = np.zeros(total, dtype=np.uint8)
        lens = np.zeros(total, dtype=np.int32)
        code = self._OP_CODE
        for i, c in items:
            o = int(off[i - b])
            for k, (op, ln) in enumerate(c):
                ops[o + k] = code[op]
                lens[o + k] = ln
        return off, ops, lens

    def _format_one(self, batch, host, b) -> str:
        extra = None
        if host.xa is not None and host.xa[b]:
            extra = [host.xa[b]]
        return format_record(
            batch.names[b], batch.codes[b], int(batch.lengths[b]),
            batch.qual_bytes(b), self.sam_ref,
            mapped=bool(host.mapped[b]), strand=int(host.strand[b]),
            packed_pos=int(host.pos[b]), mapq=int(host.mapq[b]),
            cigar=host.cigars[b], score=int(host.score[b]),
            nm=int(host.nm[b]), x0=int(host.x0[b]), x1=int(host.x1[b]),
            extra_tags=extra)

    def _format_native_run(self, batch, host, b, e, fmt=None) -> bytes:
        from parasuite_tpu import native
        from parasuite_tpu.io.batch import NameBlock

        if fmt is None:
            fmt = native.sam_format_batch
        sl = slice(b, e)
        quals = batch.quals[sl]  # already the [n, L] uint8 layout
        mapped = host.mapped[sl]
        strand = host.strand[sl]
        flag = np.where(mapped, np.where(strand == 1, 16, 0), 4)
        pos = host.pos[sl].astype(np.int64)
        ci, local = self.sam_ref.locate(np.where(mapped, pos, 0))
        # NameBlock.raw: (blob, offsets) pass-through, zero per-record work;
        # list[str] batches (tests/tools) join inside sam_format_batch
        names = (batch.names.raw(b, e)
                 if isinstance(batch.names, NameBlock) else batch.names[b:e])
        return fmt(
            self.sam_ref.seq, batch.codes[sl], batch.lengths[sl],
            names, quals, self.sam_ref.names,
            flag, np.maximum(ci, 0), (local + 1).astype(np.int32),
            pos, host.mapq[sl], host.nm[sl], host.x0[sl], host.x1[sl],
            host.score[sl], cigars=self._cigar_arrays(host, b, e))
