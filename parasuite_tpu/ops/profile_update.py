"""Device-side error-profile count accumulation.

Vectorized scatter-add equivalent of the reference's per-record BAM sweep
(SURVEY.md §3.3) and of errormodel.infer.infer_counts_numpy (the oracle the
parity test pins this to). Counts are machine-frame: reverse-strand
alignments contribute complemented reference bases at reversed cycles.

Pure integer adds -> order-independent -> bit-identical at any batch split;
multi-host runs psum the [L, 4, 4] matrix (BASELINE.json:north_star).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from parasuite_tpu.config import AlignConfig
from parasuite_tpu.ops.aligner import orient_reads  # noqa: F401  (re-export convenience)
from parasuite_tpu.ops.device_index import DeviceIndex

# numpy (not jnp): a module-level device constant would initialize the
# XLA backend at import time, breaking jax.distributed.initialize()
_COMP = np.asarray([3, 2, 1, 0, 4], dtype=np.int32)


def profile_counts_batch(didx: DeviceIndex, codes: jnp.ndarray,
                         lengths: jnp.ndarray, mapped: jnp.ndarray,
                         strand: jnp.ndarray, pos: jnp.ndarray,
                         ug_equal: jnp.ndarray,
                         cfg: AlignConfig) -> jnp.ndarray:
    """-> int32 [L, 4, 4] substitution counts for this batch.

    Only ungapped-aligned reads count (documented divergence for the <<1%
    gapped reads; errormodel.infer docstring).
    """
    B, L = codes.shape
    G = didx.ref_seq.shape[0]
    use = mapped & ug_equal & (lengths > 0)

    i = jnp.arange(L)
    # reference base under machine cycle i:
    #   fwd: ref[pos + i]; rev: comp(ref[pos + Lr - 1 - i])
    off = jnp.where(strand[:, None] == 0, i[None, :],
                    jnp.clip(lengths[:, None] - 1 - i[None, :], 0, L - 1))
    ridx = pos[:, None] + off
    ok_idx = (ridx >= 0) & (ridx < G)
    rb = jnp.where(ok_idx, didx.ref_seq[jnp.clip(ridx, 0, G - 1)], 4).astype(jnp.int32)
    rb = jnp.where(strand[:, None] == 1, jnp.asarray(_COMP)[rb], rb)
    cb = codes.astype(jnp.int32)

    valid = (use[:, None] & (i[None, :] < lengths[:, None])
             & (rb < 4) & (cb < 4))
    flat = (off * 0 + i[None, :]) * 16 + rb * 4 + cb   # cycle-major cell index
    flat = jnp.where(valid, flat, L * 16)              # dropped sentinel
    counts = jnp.zeros(L * 16 + 1, dtype=jnp.int32)
    counts = counts.at[flat.reshape(-1)].add(1, mode="drop")
    return counts[: L * 16].reshape(L, 4, 4)
