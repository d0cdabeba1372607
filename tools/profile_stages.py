"""Stage-level timing of the align pipeline on the current backend.

Usage: python tools/profile_stages.py [n_reads]
Times each pipeline stage separately (jitted, block_until_ready'd) to direct
kernel optimization (SURVEY.md §5 tracing).
"""

import functools
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import jax
import numpy as np

import bench
from parasuite_tpu.ops import aligner as A
from parasuite_tpu.ops import pallas_extend as PE
from parasuite_tpu.ops.device_index import min_scores_host
from parasuite_tpu.sim import simulate_reads


def timeit(fn, *args, rounds=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    cfg = bench.make_cfg().replace(batch_size=n_reads)
    ref, _index, didx, sprof = bench.build_state(cfg, bench.REF_LEN)
    codes, lengths, _ = simulate_reads(ref, n_reads, bench.READ_LEN, cfg,
                                       seed=2, tc_rate=0.12)
    ms = min_scores_host(lengths, cfg)
    L = cfg.max_read_len

    stages = {}

    @jax.jit
    def s_orient(codes, lengths):
        return A.orient_reads(codes, lengths)

    @jax.jit
    def s_seed(oriented, lengths):
        return A.seed_diagonals(oriented, lengths, didx, cfg)

    @jax.jit
    def s_select(diags):
        return A.select_candidates(diags, cfg)

    @jax.jit
    def s_prep(oriented, lengths, cand_diag):
        return PE._pairs_layout(oriented, lengths, cand_diag, didx, sprof,
                                cfg, L)

    import jax.numpy as jnp

    from parasuite_tpu.ops import packed_ref as PR

    @jax.jit
    def s_refwin(cand_diag):
        # packed-word window gather (the new prep's only large gather)
        W = cfg.band_width
        G = didx.ref_seq.shape[0]
        P = cand_diag.size
        n_words = (L + PE.BAND_PAD + PR.BASES_PER_WORD - 1) \
            // PR.BASES_PER_WORD + 1
        words = PR.pack_reference(didx.ref_seq)
        diag = jnp.clip(cand_diag, -(L + PE.BAND_PAD + 1), G).reshape(P)
        base_q, _ = PR.split_base(diag - W)
        return PR.gather_window_rows(words, base_q, n_words)

    @jax.jit
    def s_rows5(oriented, lengths):
        return PE.build_score_rows(oriented, lengths, sprof, L)

    pal = jax.jit(functools.partial(PE.extend_candidates_pallas, cfg=cfg))
    jnp_ext = jax.jit(functools.partial(A.extend_candidates, cfg=cfg))

    @jax.jit
    def s_finalize(oriented, lengths, ms, cand_diag, cand_valid, ext):
        return A.finalize(oriented, lengths, ms, cand_diag, cand_valid,
                          *ext, didx, sprof, cfg)

    stages["orient"], oriented = timeit(s_orient, codes, lengths)
    stages["seed_lookup"], diags = timeit(s_seed, oriented, lengths)
    stages["select"], (cand_diag, cand_valid) = timeit(s_select, diags)
    stages["extend_prep(gathers)"], _ = timeit(s_prep, oriented, lengths,
                                               cand_diag)
    stages["prep.refwin_gather"], _ = timeit(s_refwin, cand_diag)
    stages["prep.rows5_build"], _ = timeit(s_rows5, oriented, lengths)
    stages["extend_pallas_total"], ext = timeit(pal, oriented, lengths,
                                                cand_diag, didx, sprof)
    stages["extend_jnp_total"], _ = timeit(jnp_ext, oriented, lengths,
                                           cand_diag, didx, sprof)
    stages["finalize"], _ = timeit(s_finalize, oriented, lengths, ms,
                                   cand_diag, cand_valid, ext)

    for impl in ("pallas", "jnp"):
        full = jax.jit(functools.partial(
            A.align_batch, cfg=cfg.replace(extend_impl=impl)))
        stages[f"full_{impl}"], _ = timeit(full, didx, sprof, codes, lengths,
                                           ms)

    trace_dir = os.environ.get("PARASUITE_TRACE_DIR")
    if trace_dir:
        # Perfetto/XPlane trace of one full-pipeline step (SURVEY.md §5)
        full = jax.jit(functools.partial(A.align_batch, cfg=cfg))
        with jax.profiler.trace(trace_dir):
            jax.block_until_ready(full(didx, sprof, codes, lengths, ms))
        print(f"trace written to {trace_dir}")

    print(f"backend={jax.default_backend()} reads={n_reads} "
          f"pairs={n_reads * 2 * cfg.max_candidates}")
    for k, v in stages.items():
        print(f"{k:24s}: {v*1e3:8.2f} ms")
    print(f"full_pallas throughput  : {n_reads / stages['full_pallas']:,.0f} reads/s")


if __name__ == "__main__":
    main()
