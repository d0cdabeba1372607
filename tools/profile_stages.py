"""Stage-level timing of the align pipeline on the current backend.

Usage: python tools/profile_stages.py [n_reads] [batch]
Times orient+seed+select / extend / finalize separately (each jitted and
block_until_ready'd) to direct kernel optimization (SURVEY.md §5 tracing).
"""

import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

import bench
from parasuite_tpu.ops import aligner as A
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
    ref, didx, sprof = bench.build_state(cfg, bench.REF_LEN)
    codes, lengths, _ = simulate_reads(ref, n_reads, bench.READ_LEN, cfg,
                                       seed=2, tc_rate=0.12)
    ms = min_scores_host(lengths, cfg)

    @jax.jit
    def stage1(codes, lengths):
        oriented = A.orient_reads(codes, lengths)
        diags = A.seed_diagonals(oriented, lengths, didx, cfg)
        cand_diag, cand_valid = A.select_candidates(diags, cfg)
        return oriented, cand_diag, cand_valid

    @jax.jit
    def stage2(oriented, lengths, cand_diag):
        return A.extend_candidates(oriented, lengths, cand_diag, didx, sprof,
                                   cfg)

    @jax.jit
    def stage3(oriented, lengths, ms, cand_diag, cand_valid, ext):
        return A.finalize(oriented, lengths, ms, cand_diag, cand_valid,
                          *ext, didx, sprof, cfg)

    full = jax.jit(functools.partial(A.align_batch, cfg=cfg))
    t_full, _ = timeit(full, didx, sprof, codes, lengths, ms)

    t1, (oriented, cand_diag, cand_valid) = timeit(stage1, codes, lengths)
    t2, ext = timeit(stage2, oriented, lengths, cand_diag)
    t3, _ = timeit(stage3, oriented, lengths, ms, cand_diag, cand_valid, ext)

    print(f"backend={jax.default_backend()} reads={n_reads} "
          f"pairs={n_reads * 2 * cfg.max_candidates}")
    print(f"stage1 seed+select : {t1*1e3:8.2f} ms")
    print(f"stage2 extend      : {t2*1e3:8.2f} ms")
    print(f"stage3 finalize    : {t3*1e3:8.2f} ms")
    print(f"full fused         : {t_full*1e3:8.2f} ms "
          f"({n_reads / t_full:,.0f} reads/s)")


if __name__ == "__main__":
    main()
