"""Error-profile inference (SURVEY.md §2 component 3, §3.3 call stack).

From a set of aligned reads, accumulate counts[read_pos][ref_base][read_base]
over the M segments of each alignment (the reference's htsjdk record loop over
MD-tag/reference comparison, re-expressed as a vectorized scatter-add).

Conventions:
  * counts are in MACHINE-READ orientation: for reverse-strand alignments the
    reference base is complemented and the position index reversed, so cycle i
    always means "i-th sequenced base" — this is what makes T->C conversions
    (and not A->G shadows) accumulate in one cell, the property the PARA-suite
    profile relies on;
  * counts are int64 and the accumulation order never matters (pure adds), so
    profiles are bit-identical at any shard count; multi-host runs psum the
    count matrices (BASELINE.json:north_star; parallel/).

The numpy implementation here is the oracle; the device path lives in
ops/profile_update.py and must match it exactly.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import numpy as np

from parasuite_tpu.config import AlignConfig
from parasuite_tpu.index.reference import PackedReference
from parasuite_tpu.utils.dna import COMP, N


@dataclass
class ErrorProfile:
    """Substitution count matrix + derived frequencies.

    counts: int64 [L, 4, 4]  (read_pos, ref_base, read_base), ACGT only —
            positions where either side is N are not counted.
    """

    counts: np.ndarray
    n_reads: int = 0

    @property
    def read_len(self) -> int:
        return int(self.counts.shape[0])

    def probs(self, pseudocount: float = 0.5) -> np.ndarray:
        """P(read base c | ref base r, position i) with additive smoothing."""
        c = self.counts.astype(np.float64) + pseudocount
        return c / c.sum(axis=2, keepdims=True)

    def conversion_rate(self, ref_base: int, read_base: int) -> np.ndarray:
        """Per-position conditional rate, e.g. (T, C) for PAR-CLIP T->C."""
        row = self.counts[:, ref_base, :].astype(np.float64)
        tot = row.sum(axis=1)
        with np.errstate(invalid="ignore", divide="ignore"):
            return np.where(tot > 0, row[:, read_base] / np.maximum(tot, 1), 0.0)

    # --- .errorprofile text format (ours; reference format to be matched on
    #     mount, SURVEY.md §8.2) ---
    def save(self, path) -> None:
        lines = ["#parasuite_tpu errorprofile v1",
                 f"#read_len\t{self.read_len}",
                 f"#n_reads\t{self.n_reads}",
                 "#pos\tref\tread\tcount"]
        bases = "ACGT"
        for i in range(self.read_len):
            for r in range(4):
                for c in range(4):
                    lines.append(f"{i}\t{bases[r]}\t{bases[c]}\t{int(self.counts[i, r, c])}")
        Path(path).write_text("\n".join(lines) + "\n")

    @classmethod
    def load(cls, path) -> "ErrorProfile":
        base_idx = {"A": 0, "C": 1, "G": 2, "T": 3}
        read_len = 0
        n_reads = 0
        rows = []
        for line in Path(path).read_text().splitlines():
            if line.startswith("#read_len"):
                read_len = int(line.split("\t")[1])
            elif line.startswith("#n_reads"):
                n_reads = int(line.split("\t")[1])
            elif line.startswith("#"):
                continue
            elif line:
                p, r, c, n = line.split("\t")
                rows.append((int(p), base_idx[r], base_idx[c], int(n)))
        counts = np.zeros((read_len, 4, 4), dtype=np.int64)
        for p, r, c, n in rows:
            counts[p, r, c] = n
        return cls(counts=counts, n_reads=n_reads)


def infer_counts_numpy(read_codes: np.ndarray, lengths: np.ndarray,
                       mapped: np.ndarray, strand: np.ndarray,
                       packed_pos: np.ndarray, ref: PackedReference,
                       max_read_len: int,
                       ungapped_only: np.ndarray | None = None) -> ErrorProfile:
    """Oracle count accumulation over ungapped (single-M) alignments.

    read_codes [B, L] machine orientation; packed_pos is the alignment start.
    Gapped alignments (ungapped_only False) are skipped — they are <<1% of
    PAR-CLIP reads and their M-segment bookkeeping is host-side only
    (documented divergence; revisit on reference mount).
    """
    counts = np.zeros((max_read_len, 4, 4), dtype=np.int64)
    n_used = 0
    B = read_codes.shape[0]
    for b in range(B):
        if not mapped[b] or (ungapped_only is not None and not ungapped_only[b]):
            continue
        ln = int(lengths[b])
        if ln == 0:
            continue
        pos = int(packed_pos[b])
        rb = ref.seq[pos : pos + ln].astype(np.int64)
        cycle = np.arange(ln)
        read_b = read_codes[b, :ln].astype(np.int64)  # machine frame already
        if strand[b] == 0:
            ref_b = rb
        else:
            # machine cycle i sits at aligned offset ln-1-i on the opposite
            # strand: complement-reverse the reference side into machine frame
            ref_b = COMP[rb[::-1]].astype(np.int64)
        ok = (ref_b < 4) & (read_b < 4)
        np.add.at(counts, (cycle[ok], ref_b[ok], read_b[ok]), 1)
        n_used += 1
    return ErrorProfile(counts=counts, n_reads=n_used)


def counts_to_profile(profile: ErrorProfile, cfg: AlignConfig) -> np.ndarray:
    """ErrorProfile -> learned score tensor S [L, 5, 5] (int32)."""
    from parasuite_tpu.errormodel.scoring import profile_score_tensor

    return profile_score_tensor(profile.probs(cfg.profile_pseudocount), cfg)
