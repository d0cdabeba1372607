"""Fixed-shape read batches.

TPU/XLA requires static shapes (SURVEY.md §7): reads are padded to
cfg.max_read_len and batches to cfg.batch_size. Padding reads have length 0
and are masked out everywhere downstream. Names/quals stay host-side (they
never touch the device; SAM emission re-joins them by read index).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class ReadBatch:
    """A fixed-shape batch of reads.

    codes:   int8  [B, L]  base codes 0..4; positions >= length are N(4)
    lengths: int32 [B]     true read lengths (0 for padding rows)
    names:   list[str]     length n_real (host-side only)
    quals:   list[bytes]   length n_real, phred+33 ASCII (host-side only)
    """

    codes: np.ndarray
    lengths: np.ndarray
    names: list = field(default_factory=list)
    quals: list = field(default_factory=list)

    @property
    def n_total(self) -> int:
        return int(self.codes.shape[0])

    @property
    def n_real(self) -> int:
        return len(self.names)

    @property
    def max_len(self) -> int:
        return int(self.codes.shape[1])

    @classmethod
    def from_arrays(cls, seq_codes: list[np.ndarray], names: list[str],
                    quals: list[bytes] | None, max_len: int,
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
        if quals is None:
            quals = [b"I" * int(lengths[i]) for i in range(n)]
        return cls(codes=codes, lengths=lengths, names=list(names), quals=list(quals))
