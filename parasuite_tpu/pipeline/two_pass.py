"""Two-pass profile-aware alignment (SURVEY.md §2 component 2, §3.1).

Reference flow: bwa aln (flat) -> ErrorProfile.infer -> parasuite-aligner
with .errorprofile -> merged BAM, stitched together with subprocesses and
intermediate files. Here it is one loop: pass 1 aligns with the flat tensor
while psum/accumulating the count matrix on device, the learned tensor is
derived host-side (it is tiny), and pass 2 re-aligns with the learned tensor
through the same compiled function (SURVEY.md §7: one code path, two
matrices).
"""

from __future__ import annotations

from typing import Callable, Iterable

import numpy as np

from parasuite_tpu.config import AlignConfig
from parasuite_tpu.errormodel.infer import ErrorProfile, counts_to_profile
from parasuite_tpu.io.batch import ReadBatch
from parasuite_tpu.pipeline.align import AlignerEngine


def infer_profile_streaming(engine: AlignerEngine,
                            batches: Iterable[ReadBatch]) -> ErrorProfile:
    """Pass 1: align with the current tensor, accumulate substitution counts
    on device and indel counts from the rare gapped tracebacks on host."""
    L = engine.cfg.max_read_len
    total = np.zeros((L, 4, 4), dtype=np.int64)
    ins = np.zeros(L, dtype=np.int64)
    dels = np.zeros(L, dtype=np.int64)
    n_reads = 0
    n_gapped = 0
    counts_from_host = getattr(engine, "counts_from_host", False)
    for batch in batches:
        if counts_from_host:
            # combined mode: count from the emitted records — the host
            # re-finalization can re-decide the device winner (VERDICT r3
            # weak #2); pipeline/combined.accumulate_profile_host
            host = engine.align_to_host(batch)
            dp, dg = engine.accumulate_profile_host(batch, host, total,
                                                    ins, dels)
            n_reads += dp
            n_gapped += dg
            continue
        res = engine.align_device(batch.codes, batch.lengths)
        counts = engine.profile_counts_device(batch.codes, batch.lengths, res)
        n_gapped += engine.gapped_indel_counts(batch, res, ins, dels,
                                               sub_counts=total)
        total += np.asarray(counts, dtype=np.int64)
        r = res if hasattr(res, "mapped") else res[0]
        # every aligned read contributes (gapped M segments included)
        n_reads += int(np.asarray(r.mapped & (batch.lengths > 0)).sum())
    return ErrorProfile(counts=total, n_reads=n_reads, ins_counts=ins,
                        del_counts=dels, n_gapped=n_gapped)


def two_pass_align(engine: AlignerEngine,
                   batch_source: Callable[[], Iterable[ReadBatch]],
                   sam_writer=None,
                   profile_path=None) -> ErrorProfile:
    """Full two-pass pipeline.

    batch_source is a zero-arg callable returning a fresh batch iterator
    (the FASTQ is streamed twice, like the reference's two alignment passes).
    Returns the inferred profile; pass-2 records go to sam_writer if given.
    """
    profile = infer_profile_streaming(engine, batch_source())
    if profile_path is not None:
        profile.save(profile_path)
    s_learned = counts_to_profile(profile, engine.cfg)
    engine.set_profile(s_learned)
    if sam_writer is not None:
        for batch in batch_source():
            host = engine.align_to_host(batch)
            engine.emit_sam(batch, host, sam_writer)
    return profile
