"""Data-parallel distributed alignment step (SURVEY.md §2 component 12).

shard_map over the 'data' mesh axis: read batches sharded, DeviceIndex and
score tensors replicated, alignment results returned sharded (each host emits
its own SAM shard; text never crosses the network — io.sam.merge_shards),
and the error-profile count matrix psum'd across the axis
(BASELINE.json:north_star names exactly these collectives).

Determinism at any device count falls out of the design: per-read outputs
depend only on that read + replicated state, and the psum adds integer
matrices whose sum is order-independent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from parasuite_tpu.config import AlignConfig
from parasuite_tpu.ops.aligner import align_batch
from parasuite_tpu.ops.profile_update import profile_counts_batch


def make_dist_align_step(cfg: AlignConfig, mesh: Mesh, axis_name: str = "data",
                         with_counts: bool = True,
                         with_candidates: bool = False):
    """-> jitted step(didx, sprof, codes, lengths, min_scores).

    codes/lengths/min_scores are sharded on their leading (read) axis; the
    leading dim must be divisible by the mesh size. Returns (AlignResult
    sharded along 'data', counts [L, 4, 4] replicated psum) — or just the
    AlignResult when with_counts=False.

    with_candidates=True (combined genome+transcriptome mode, SURVEY.md §2
    component 12 + 7): the step returns (AlignResult, CandidateTable), both
    data-sharded — every per-candidate row rides with its read's shard, so
    each process re-finalizes/projects its own reads host-side exactly like
    the single-process CombinedEngine.to_host. Per-candidate outputs are
    per-read state (no cross-read reduction), which is why the combined step
    shards cleanly; profile counts in combined mode accumulate from EMITTED
    records host-side (CombinedEngine.counts_from_host), so with_counts must
    stay False here.
    """
    if with_candidates and with_counts:
        raise ValueError("combined mode counts profiles host-side; "
                         "with_counts+with_candidates unsupported")

    def step(didx, sprof, codes, lengths, min_scores):
        if with_candidates:
            from parasuite_tpu.ops.aligner import align_batch_with_candidates

            return align_batch_with_candidates(didx, sprof, codes, lengths,
                                               min_scores, cfg)
        res = align_batch(didx, sprof, codes, lengths, min_scores, cfg)
        if not with_counts:
            return res
        counts = profile_counts_batch(didx, codes, lengths, res.mapped,
                                      res.strand, res.pos, res.ug_equal, cfg)
        counts = jax.lax.psum(counts, axis_name)
        return res, counts

    data = P(axis_name)
    repl = P()
    if with_candidates:
        out_specs = (data, data)
    elif with_counts:
        out_specs = (data, repl)
    else:
        out_specs = data
    sharded = jax.shard_map(step, mesh=mesh,
                            in_specs=(repl, repl, data, data, data),
                            out_specs=out_specs)
    return jax.jit(sharded)


def shard_batch(codes, lengths, min_scores, n_shards: int):
    """Pad the read axis to a multiple of n_shards (length-0 N rows)."""
    import numpy as np

    n = codes.shape[0]
    pad = (-n) % n_shards
    if pad:
        codes = np.concatenate(
            [codes, np.full((pad, codes.shape[1]), 4, dtype=codes.dtype)])
        lengths = np.concatenate([lengths, np.zeros(pad, dtype=lengths.dtype)])
        min_scores = np.concatenate(
            [min_scores, np.zeros(pad, dtype=min_scores.dtype)])
    return codes, lengths, min_scores
