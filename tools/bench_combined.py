"""Combined genome+transcriptome throughput vs plain mode (VERDICT r1 #6:
"combined-mode throughput within 2x of plain mode on an exon-dense
reference, 100k+ reads").

Builds a synthetic exon-dense genome (hundreds of multi-exon transcripts),
simulates reads drawn from BOTH genomic loci and spliced transcripts
(junction-spanning), and measures reads/s through the full to_host path
(device step + host projection/finalize) for:

  * plain  — AlignerEngine over the genome-only reference
  * combined — CombinedEngine over genome + tx pseudo-chromosomes

    timeout 3000 python tools/bench_combined.py [n_reads]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import numpy as np

READ_LEN = 50
GENOME_LEN = int(os.environ.get("PARASUITE_COMBINED_GENOME", 8_000_000))
N_TX = int(os.environ.get("PARASUITE_COMBINED_NTX", 400))


def build_world(cfg):
    from parasuite_tpu.pipeline.combined import CombinedReference, Transcript

    rng = np.random.default_rng(11)
    genome = {"chr1": rng.integers(0, 4, GENOME_LEN).astype(np.int8)}
    txs = []
    for t in range(N_TX):
        # 3-exon transcripts, exons 120-400bp, introns 200-2000bp
        start = int(rng.integers(0, GENOME_LEN - 10_000))
        starts, ends, p = [], [], start
        for _ in range(3):
            e = int(rng.integers(120, 400))
            starts.append(p)
            ends.append(p + e)
            p += e + int(rng.integers(200, 2000))
        txs.append(Transcript(f"t{t}", "chr1", "+" if t % 2 else "-",
                              np.asarray(starts, dtype=np.int64),
                              np.asarray(ends, dtype=np.int64)))
    combined = CombinedReference.build(genome, txs, cfg.chrom_spacer)
    return genome, txs, combined


def make_reads(combined, txs, n_reads, cfg):
    """Half genomic reads, half spliced-transcript reads (many junction-
    spanning), all sampled from the combined packing so both engines see the
    identical read set."""
    rng = np.random.default_rng(12)
    ref = combined.ref
    tx_start = int(ref.starts[1]) if len(ref.names) > 1 else 0
    # genome reads: inside chr1
    g_lo, g_hi = int(ref.starts[0]), int(ref.ends[0]) - READ_LEN
    n_g = n_reads // 2
    gpos = rng.integers(g_lo, g_hi, n_g)
    # transcript reads: uniformly over tx pseudo-chroms
    n_t = n_reads - n_g
    ti = rng.integers(0, len(txs), n_t)
    names = [f"tx::{t.tx_id}" for t in txs]
    name_to_ci = {nm: i for i, nm in enumerate(ref.names)}
    tstart = np.asarray([ref.starts[name_to_ci[nm]] for nm in names])
    tlen = np.asarray([t.spliced_len for t in txs])
    toff = (rng.random(n_t) * np.maximum(tlen[ti] - READ_LEN, 1)).astype(int)
    tpos = tstart[ti] + toff
    pos = np.concatenate([gpos, tpos])
    idx = pos[:, None] + np.arange(READ_LEN)[None, :]
    codes = ref.seq[idx].astype(np.int8)
    # sprinkle T->C conversions like a PAR-CLIP library
    is_t = codes == 3
    conv = is_t & (rng.random(codes.shape) < 0.12)
    codes = np.where(conv, 1, codes).astype(np.int8)
    ok = ~np.any(codes == 4, axis=1)  # drop reads that straddle spacers
    return codes[ok], np.full(int(ok.sum()), READ_LEN, dtype=np.int32)


def time_engine(engine, codes, lengths, batch, label):
    import jax

    from parasuite_tpu.io.batch import ReadBatch

    n = codes.shape[0] - codes.shape[0] % batch

    def mk(i):
        return ReadBatch(codes=codes[i:i + batch],
                         lengths=lengths[i:i + batch])

    # warm up / compile
    jax.block_until_ready(engine.align_device(codes[:batch], lengths[:batch]))
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        pend = []
        for i in range(0, n, batch):
            pend.append((mk(i), engine.align_device(codes[i:i + batch],
                                                    lengths[i:i + batch])))
            if len(pend) >= 4:
                b, r = pend.pop(0)
                engine.to_host(b, r)
        for b, r in pend:
            engine.to_host(b, r)
        best = max(best, n / (time.perf_counter() - t0))
    return best


def main() -> int:
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the image's sitecustomize pins jax to the axon TPU and env vars do
        # not override it (CLAUDE.md); honor an explicit CPU request here
        import jax

        jax.config.update("jax_platforms", "cpu")
    from parasuite_tpu.config import AlignConfig
    from parasuite_tpu.index.kmer import KmerIndex
    from parasuite_tpu.pipeline.align import AlignerEngine
    from parasuite_tpu.pipeline.combined import CombinedEngine

    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    batch = int(os.environ.get("PARASUITE_BENCH_BATCH", 16384))
    cfg = AlignConfig(max_read_len=READ_LEN, kmer_size=12, batch_size=batch,
                      max_candidates=8, max_occ=16)
    genome, txs, combined = build_world(cfg)
    codes, lengths = make_reads(combined, txs, n_reads, cfg)

    cidx = KmerIndex.build(combined.ref.seq, cfg.kmer_size)
    ceng = CombinedEngine(combined, cidx, cfg)
    gref = ceng.genome_ref
    gidx = KmerIndex.build(gref.seq, cfg.kmer_size)
    geng = AlignerEngine(gref, gidx, cfg)

    plain = time_engine(geng, codes, lengths, batch, "plain")
    comb = time_engine(ceng, codes, lengths, batch, "combined")
    print(json.dumps({
        "n_reads": int(codes.shape[0]), "batch": batch,
        "plain_reads_per_s": round(plain, 0),
        "combined_reads_per_s": round(comb, 0),
        "combined_over_plain": round(plain / comb, 3),
        "n_transcripts": N_TX,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
