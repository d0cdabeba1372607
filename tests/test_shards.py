"""Chromosome-sharded index vs replicated index (SURVEY.md §2 component 12).

The sharded path must agree with the replicated path on every uniquely-
mapping read — winner, coordinates, score, ug/nm — and be deterministic.
(Repeat filtering is per-shard by design; see parallel/shards.py docstring.)
"""

import functools

import jax
import numpy as np
import pytest

from parasuite_tpu.errormodel import flat_score_tensor
from parasuite_tpu.ops import DeviceIndex, ScoreParams, align_batch
from parasuite_tpu.ops.device_index import min_scores_host
from parasuite_tpu.parallel.mesh import make_mesh2
from parasuite_tpu.parallel.shards import (assign_chroms, build_sharded_index,
                                           make_sharded_step)

from conftest import sample_reads


def test_assign_chroms_balanced():
    sizes = [100, 90, 50, 40, 10, 5]
    owner = assign_chroms(sizes, 2)
    loads = [sum(s for s, o in zip(sizes, owner) if o == w) for w in (0, 1)]
    assert abs(loads[0] - loads[1]) <= 15
    assert assign_chroms(sizes, 2) == owner  # deterministic


@pytest.fixture(scope="module")
def multi_chrom_seqs():
    rng = np.random.default_rng(600)
    return {f"chr{i}": rng.integers(0, 4, 1500 + 700 * i).astype(np.int8)
            for i in range(5)}


def test_sharded_matches_replicated(multi_chrom_seqs, small_cfg):
    cfg = small_cfg
    sharded, full = build_sharded_index(multi_chrom_seqs, 4, cfg)
    from parasuite_tpu.index import KmerIndex

    full_idx = KmerIndex.build(full.seq, cfg.kmer_size)
    didx = DeviceIndex.from_host(full, full_idx)
    sprof = ScoreParams.from_tensor(
        flat_score_tensor(cfg, cfg.max_read_len), cfg)

    rng = np.random.default_rng(601)
    codes, lengths, truth = sample_reads(rng, full, 32, 50, mutate=2)
    ms = min_scores_host(lengths, cfg)

    # replicated reference run
    rep = jax.jit(functools.partial(align_batch, cfg=cfg))(
        didx, sprof, codes, lengths, ms)
    rep_ci, rep_local = full.locate(np.asarray(rep.pos))

    # sharded run on a 2x4 (data x index) mesh
    mesh = make_mesh2(2, 4)
    step = make_sharded_step(cfg, mesh)
    slabs = sharded.slabs(cfg)
    out = step(slabs, sharded.orig_chrom, sprof, codes, lengths, ms)

    rep_mapped = np.asarray(rep.mapped)
    sh_mapped = np.asarray(out["mapped"])
    np.testing.assert_array_equal(sh_mapped, rep_mapped)
    uniq = rep_mapped & (np.asarray(rep.x0) == 1)
    assert uniq.sum() >= 28
    for f, r in [("chrom", rep_ci), ("local_pos", rep_local),
                 ("strand", np.asarray(rep.strand)),
                 ("score", np.asarray(rep.score)),
                 ("nm", np.asarray(rep.nm)),
                 ("x0", np.asarray(rep.x0)),
                 ("mapq", np.asarray(rep.mapq))]:
        np.testing.assert_array_equal(np.asarray(out[f])[uniq], r[uniq],
                                      err_msg=f)

    # determinism: same inputs -> same outputs
    out2 = step(slabs, sharded.orig_chrom, sprof, codes, lengths, ms)
    for k in out:
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(out2[k]))


def test_duplicate_across_shards_x0_merge(small_cfg):
    """A sequence duplicated on chromosomes living on DIFFERENT shards must
    merge to x0=2 / mapq=0, winner on the lower original chrom index."""
    rng = np.random.default_rng(602)
    core = rng.integers(0, 4, 400).astype(np.int8)
    seqs = {"chrA": np.concatenate([rng.integers(0, 4, 500).astype(np.int8), core]),
            "chrB": np.concatenate([core, rng.integers(0, 4, 800).astype(np.int8)])}
    cfg = small_cfg
    sharded, full = build_sharded_index(seqs, 2, cfg)
    # chroms must land on different shards for this test to bite
    assert sharded.orig_chrom[0, 0] != sharded.orig_chrom[1, 0]
    sprof = ScoreParams.from_tensor(
        flat_score_tensor(cfg, cfg.max_read_len), cfg)

    codes = core[100:150][None, :].astype(np.int8)
    lengths = np.full(1, 50, dtype=np.int32)
    ms = min_scores_host(lengths, cfg)
    mesh = make_mesh2(1, 2)
    step = make_sharded_step(cfg, mesh)
    slabs = sharded.slabs(cfg)
    out = step(slabs, sharded.orig_chrom, sprof, codes, lengths, ms)
    assert bool(out["mapped"][0])
    assert int(out["x0"][0]) == 2
    assert int(out["mapq"][0]) == 0
    assert int(out["chrom"][0]) == 0      # chrA (lower original index) wins
    assert int(out["local_pos"][0]) == 600  # 500 + 100


def test_global_repeat_filter_matches_replicated(small_cfg):
    """A k-mer repetitive GLOBALLY (count > max_occ) but rare on each shard
    must be filtered in the sharded index exactly as in the replicated path
    (VERDICT r1 #10: per-shard max_occ divergence)."""
    cfg = small_cfg
    rng = np.random.default_rng(603)
    unit = rng.integers(0, 4, 60).astype(np.int8)   # repeat unit > read len
    copies = cfg.max_occ // 2 + 1                   # per chrom: under max_occ
    # 2*copies global occurrences of every unit k-mer: over max_occ globally,
    # under max_occ on each of the two shards
    def chrom(seed):
        r = np.random.default_rng(seed)
        parts = []
        for _ in range(copies):
            parts.append(r.integers(0, 4, 300).astype(np.int8))
            parts.append(unit)
        parts.append(r.integers(0, 4, 300).astype(np.int8))
        return np.concatenate(parts)

    seqs = {"chrA": chrom(604), "chrB": chrom(605)}
    sharded, full = build_sharded_index(seqs, 2, cfg)
    assert sharded.orig_chrom[0, 0] != sharded.orig_chrom[1, 0]
    assert sharded.max_occ == cfg.max_occ

    from parasuite_tpu.index import KmerIndex

    full_idx = KmerIndex.build(full.seq, cfg.kmer_size)
    didx = DeviceIndex.from_host(full, full_idx)
    sprof = ScoreParams.from_tensor(
        flat_score_tensor(cfg, cfg.max_read_len), cfg)

    # read 0: pure repeat (every seed k-mer globally over max_occ);
    # reads 1-8: unique flanking sequence
    codes_list = [unit[5:55]]
    for i in range(8):
        r = np.random.default_rng(606 + i)
        start = 30 + 11 * i
        codes_list.append(np.asarray(seqs["chrA"][start:start + 50]))
    codes = np.stack(codes_list).astype(np.int8)
    lengths = np.full(codes.shape[0], 50, dtype=np.int32)
    ms = min_scores_host(lengths, cfg)

    rep = jax.jit(functools.partial(align_batch, cfg=cfg))(
        didx, sprof, codes, lengths, ms)
    rep_ci, rep_local = full.locate(np.asarray(rep.pos))

    mesh = make_mesh2(1, 2)
    step = make_sharded_step(cfg, mesh)
    slabs = sharded.slabs(cfg)
    out = step(slabs, sharded.orig_chrom, sprof, codes, lengths, ms)

    # a mismatched align-time max_occ must fail loudly, not silently diverge
    # (ADVICE r2 medium)
    import dataclasses

    with pytest.raises(ValueError, match="max_occ"):
        sharded.slabs(dataclasses.replace(cfg, max_occ=cfg.max_occ // 2))

    rep_mapped = np.asarray(rep.mapped)
    # the repeat read is seed-filtered in the replicated path — the sharded
    # path must agree (pre-fix it mapped via per-shard counts)
    assert not rep_mapped[0]
    np.testing.assert_array_equal(np.asarray(out["mapped"]), rep_mapped)
    m = rep_mapped
    for f, r in [("chrom", rep_ci), ("local_pos", rep_local),
                 ("strand", np.asarray(rep.strand)),
                 ("score", np.asarray(rep.score)),
                 ("x0", np.asarray(rep.x0)),
                 ("mapq", np.asarray(rep.mapq))]:
        np.testing.assert_array_equal(np.asarray(out[f])[m], r[m], err_msg=f)
