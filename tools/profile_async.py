"""True device-time stage profile via async-dispatch pipelining.

Per-call host timings on the axon tunnel carry ~20ms RPC latency
(CLAUDE.md rule 5); this tool instead times N back-to-back dispatches of
progressively longer pipeline prefixes (orient; +seed; +select; +extend;
+finalize). Dispatch overlap hides RPC, so prefix deltas approximate real
per-stage device time (SURVEY.md §5 tracing; device-plane Perfetto traces
are not exported over the remote tunnel).

Usage: python tools/profile_async.py [n_reads] [iters]
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

import bench
from parasuite_tpu.ops import aligner as A
from parasuite_tpu.ops.device_index import min_scores_host
from parasuite_tpu.sim import simulate_reads


def main():
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    cfg = bench.make_cfg().replace(batch_size=n_reads)
    ref, didx, sprof = bench.build_state(cfg, bench.REF_LEN)
    codes, lengths, _ = simulate_reads(ref, n_reads, bench.READ_LEN, cfg,
                                       seed=2, tc_rate=0.12)
    ms = min_scores_host(lengths, cfg)
    ext = A.resolve_extend_fn(cfg)

    def p_orient(codes, lengths, ms):
        return A.orient_reads(codes, lengths)

    def p_seed(codes, lengths, ms):
        o = A.orient_reads(codes, lengths)
        return A.seed_diagonals(o, lengths, didx, cfg)

    def p_select(codes, lengths, ms):
        o = A.orient_reads(codes, lengths)
        d = A.seed_diagonals(o, lengths, didx, cfg)
        return A.select_candidates(d, cfg)

    def p_extend(codes, lengths, ms):
        o = A.orient_reads(codes, lengths)
        d = A.seed_diagonals(o, lengths, didx, cfg)
        cd, cv = A.select_candidates(d, cfg)
        return A.select_candidates(d, cfg)[1], ext(o, lengths, cd, didx,
                                                   sprof, cfg)

    def p_full(codes, lengths, ms):
        return A.align_batch(didx, sprof, codes, lengths, ms, cfg=cfg)

    prefixes = [("orient", p_orient), ("+seed", p_seed),
                ("+select", p_select), ("+extend", p_extend),
                ("+finalize(full)", p_full)]
    prev = 0.0
    print(f"backend={jax.default_backend()} reads={n_reads} iters={iters}")
    for name, fn in prefixes:
        jfn = jax.jit(fn)
        jax.block_until_ready(jfn(codes, lengths, ms))  # compile
        t0 = time.perf_counter()
        outs = [jfn(codes, lengths, ms) for _ in range(iters)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:18s}: {dt*1e3:8.2f} ms/call   (+{(dt-prev)*1e3:7.2f} ms)")
        prev = dt
    print(f"pipelined throughput: {n_reads / prev:,.0f} reads/s")


if __name__ == "__main__":
    main()
