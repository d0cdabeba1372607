"""Fixed-shape read batches.

TPU/XLA requires static shapes (SURVEY.md §7): reads are padded to
cfg.max_read_len and batches to cfg.batch_size. Padding reads have length 0
and are masked out everywhere downstream. Names stay host-side (they never
touch the device; SAM emission re-joins them by read index).

quals is a FIXED-SHAPE uint8 matrix, not a list of bytes: the C++ FASTQ
scanner writes it directly and the C++ SAM formatter consumes it directly,
so the hot path never loops over records in Python. A list[bytes] passed to
the constructor or from_arrays is converted (convenience for tests/tools).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

_PAD_QUAL = ord("I")


def _quals_matrix(quals, lengths: np.ndarray, b: int, max_len: int) -> np.ndarray:
    mat = np.full((b, max_len), _PAD_QUAL, dtype=np.uint8)
    for i, q in enumerate(quals):
        ln = min(len(q), max_len)
        if ln:
            mat[i, :ln] = np.frombuffer(q[:ln], dtype=np.uint8)
    return mat


@dataclass
class ReadBatch:
    """A fixed-shape batch of reads.

    codes:   int8  [B, L]  base codes 0..4; positions >= length are N(4)
    lengths: int32 [B]     true read lengths (0 for padding rows)
    names:   list[str]     length n_real (host-side only)
    quals:   uint8 [B, L]  phred+33 ASCII, 'I'-padded (host-side only)
    """

    codes: np.ndarray
    lengths: np.ndarray
    names: list = field(default_factory=list)
    quals: np.ndarray | list | None = None

    def __post_init__(self):
        if self.quals is None:
            self.quals = np.full(self.codes.shape, _PAD_QUAL, dtype=np.uint8)
        elif isinstance(self.quals, list):
            self.quals = _quals_matrix(self.quals, self.lengths,
                                       self.codes.shape[0],
                                       self.codes.shape[1])

    @property
    def n_total(self) -> int:
        return int(self.codes.shape[0])

    @property
    def n_real(self) -> int:
        return len(self.names)

    @property
    def max_len(self) -> int:
        return int(self.codes.shape[1])

    def qual_bytes(self, i: int) -> bytes:
        """Quality string for read i (true length), as phred+33 bytes."""
        return self.quals[i, : int(self.lengths[i])].tobytes()

    @classmethod
    def from_arrays(cls, seq_codes: list[np.ndarray], names: list[str],
                    quals, max_len: int,
                    pad_to: int | None = None) -> "ReadBatch":
        n = len(seq_codes)
        b = pad_to if pad_to is not None else n
        assert b >= n
        codes = np.full((b, max_len), 4, dtype=np.int8)  # N padding
        lengths = np.zeros(b, dtype=np.int32)
        for i, sc in enumerate(seq_codes):
            ln = min(len(sc), max_len)
            codes[i, :ln] = sc[:ln]
            lengths[i] = ln
        return cls(codes=codes, lengths=lengths, names=list(names),
                   quals=quals)
