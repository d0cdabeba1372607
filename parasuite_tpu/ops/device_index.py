"""Device-resident index and scoring parameters (pytrees).

The packed reference + k-mer tables live in HBM once per device (replicated —
SURVEY.md §2 component 12; chromosome sharding for >int32 genomes comes via
parallel/); score tensors are tiny and re-uploaded per pass.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from parasuite_tpu.config import AlignConfig
from parasuite_tpu.errormodel.scoring import complement_score_tensor
from parasuite_tpu.index.kmer import KmerIndex
from parasuite_tpu.index.reference import PackedReference


class DeviceIndex(NamedTuple):
    """Alignment-time reference state (all jnp arrays)."""

    ref_seq: jnp.ndarray        # int8  [G]
    bucket_starts: jnp.ndarray  # int32 [4^k + 1]
    positions: jnp.ndarray      # int32 [n_kmers]
    chrom_starts: jnp.ndarray   # int32 [n_chroms]
    chrom_ends: jnp.ndarray     # int32 [n_chroms]

    @classmethod
    def from_host(cls, ref: PackedReference, index: KmerIndex) -> "DeviceIndex":
        if ref.total_len > np.iinfo(np.int32).max:
            raise ValueError("packed reference exceeds int32; use chromosome "
                             "sharding (parallel/shards.py)")
        return cls(
            ref_seq=jnp.asarray(ref.seq, dtype=jnp.int8),
            bucket_starts=jnp.asarray(index.bucket_starts, dtype=jnp.int32),
            positions=jnp.asarray(index.positions, dtype=jnp.int32),
            chrom_starts=jnp.asarray(ref.starts, dtype=jnp.int32),
            chrom_ends=jnp.asarray(ref.ends, dtype=jnp.int32),
        )


# host-side MAPQ subtraction table so device math is integer-only and matches
# oracle._mapq bit-for-bit (the 4.343*log is evaluated once here in float64)
def _mapq_table(n: int = 256) -> np.ndarray:
    t = np.zeros(n, dtype=np.int32)
    for x1 in range(1, n):
        t[x1] = int(4.343 * np.log(x1))
    return t


class ScoreParams(NamedTuple):
    """Per-pass scoring state."""

    s_fwd: jnp.ndarray      # int32 [L, 5, 5]
    s_comp: jnp.ndarray     # int32 [L, 5, 5]  (complement-transformed)
    mapq_sub: jnp.ndarray   # int32 [256]

    @classmethod
    def from_tensor(cls, s_tensor: np.ndarray, cfg: AlignConfig) -> "ScoreParams":
        if s_tensor.shape[0] < cfg.max_read_len:
            raise ValueError("score tensor shorter than max_read_len")
        return cls(
            s_fwd=jnp.asarray(s_tensor, dtype=jnp.int32),
            s_comp=jnp.asarray(complement_score_tensor(s_tensor), dtype=jnp.int32),
            mapq_sub=jnp.asarray(_mapq_table(), dtype=jnp.int32),
        )


def min_scores_host(lengths: np.ndarray, cfg: AlignConfig) -> np.ndarray:
    """Per-read mapping threshold, computed host-side in float64 so device
    integer math never re-derives it (exactness discipline, SURVEY.md §7)."""
    return np.asarray(
        [int(cfg.min_score_frac * int(l) * cfg.match_score) for l in lengths],
        dtype=np.int32)
