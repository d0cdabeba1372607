"""Oracle aligner correctness on synthetic reads (SURVEY.md §4.1)."""

import numpy as np
import pytest

from parasuite_tpu.errormodel.scoring import flat_score_tensor
from parasuite_tpu.oracle.align import (align_batch_oracle, align_read,
                                        banded_dp, seed_candidates,
                                        _ref_window, _score_rows)
from parasuite_tpu.utils.dna import encode_seq, revcomp_codes

from conftest import sample_reads


@pytest.fixture(scope="module")
def flat_s(small_cfg):
    return flat_score_tensor(small_cfg, small_cfg.max_read_len)


def test_exact_reads_align_perfectly(tiny_ref, tiny_index, small_cfg, flat_s):
    rng = np.random.default_rng(42)
    codes, lengths, truth = sample_reads(rng, tiny_ref, 30, 50, mutate=0)
    alns = align_batch_oracle(codes, lengths, tiny_ref, tiny_index, flat_s,
                              small_cfg)
    for aln, (ci, pos, strand) in zip(alns, truth):
        assert aln.mapped
        assert aln.strand == strand
        got_ci, got_local = tiny_ref.locate(np.asarray([aln.packed_pos]))
        assert (int(got_ci[0]), int(got_local[0])) == (ci, pos)
        assert aln.cigar == [("M", 50)]
        assert aln.nm == 0
        assert aln.score == 50 * small_cfg.match_score
        assert aln.ug_equal


def test_mutated_reads_align(tiny_ref, tiny_index, small_cfg, flat_s):
    rng = np.random.default_rng(43)
    codes, lengths, truth = sample_reads(rng, tiny_ref, 30, 50, mutate=3)
    alns = align_batch_oracle(codes, lengths, tiny_ref, tiny_index, flat_s,
                              small_cfg)
    n_correct = 0
    for aln, (ci, pos, strand) in zip(alns, truth):
        if not aln.mapped:
            continue
        got_ci, got_local = tiny_ref.locate(np.asarray([aln.packed_pos]))
        if (int(got_ci[0]), int(got_local[0]), aln.strand) == (ci, pos, strand):
            n_correct += 1
            assert aln.nm <= 3
    assert n_correct >= 27  # pigeonhole: 3 mutations, 4 seeds of k=8 cover 32bp


def test_indel_reads_get_gapped_cigar(tiny_ref, tiny_index, small_cfg, flat_s):
    rng = np.random.default_rng(44)
    n_gapped = 0
    codes, lengths, truth = sample_reads(rng, tiny_ref, 40, 50, mutate=0,
                                         indel=True, revcomp_frac=0.0)
    alns = align_batch_oracle(codes, lengths, tiny_ref, tiny_index, flat_s,
                              small_cfg)
    for aln, (ci, pos, strand) in zip(alns, truth):
        if not aln.mapped:
            continue
        ops = [op for op, _ in aln.cigar]
        if "D" in ops or "I" in ops:
            n_gapped += 1
            assert not aln.ug_equal
            # read consumes sum(M)+sum(I) bases
            consumed = sum(ln for op, ln in aln.cigar if op in "MI")
            assert consumed == 50
    assert n_gapped >= 10  # half the reads carry a deletion


def test_unmapped_random_read(tiny_ref, tiny_index, small_cfg, flat_s):
    # a read not present in the reference (random 50-mer almost surely absent)
    rng = np.random.default_rng(45)
    codes = rng.integers(0, 4, size=(1, 50)).astype(np.int8)
    alns = align_batch_oracle(codes, np.asarray([50], dtype=np.int32),
                              tiny_ref, tiny_index, flat_s, small_cfg)
    assert not alns[0].mapped


def test_zero_length_padding_row(tiny_ref, tiny_index, small_cfg, flat_s):
    codes = np.full((1, 50), 4, dtype=np.int8)
    alns = align_batch_oracle(codes, np.asarray([0], dtype=np.int32),
                              tiny_ref, tiny_index, flat_s, small_cfg)
    assert not alns[0].mapped


def test_banded_dp_matches_exhaustive_ungapped(small_cfg, flat_s, tiny_ref):
    """DP with huge gap penalties == best ungapped diagonal."""
    rng = np.random.default_rng(46)
    cfg = small_cfg.replace(gap_open=10_000, gap_extend=10_000)
    read = rng.integers(0, 4, size=50).astype(np.int8)
    rows = _score_rows(flat_s, read, 50, 0)
    refwin = _ref_window(tiny_ref.seq, 2000, 50, cfg.band_width)
    dp_score, dp_j, ug_score, ug_j = banded_dp(rows, refwin, 50, cfg)
    assert dp_score == ug_score
    assert dp_j == ug_j


def test_seed_candidates_deterministic(tiny_ref, tiny_index, small_cfg):
    read = tiny_ref.seq[2000:2050].copy()
    c1 = seed_candidates(read, 50, tiny_index, small_cfg)
    c2 = seed_candidates(read, 50, tiny_index, small_cfg)
    assert c1 == c2
    assert len(c1) >= 1
    # the true diagonal must be the top candidate (max votes)
    assert c1[0][0] == 2000


def test_duplicate_region_x0(small_cfg, flat_s):
    """A read from an exactly duplicated region reports X0=2, MAPQ=0."""
    from parasuite_tpu.index import KmerIndex, PackedReference

    rng = np.random.default_rng(47)
    core = rng.integers(0, 4, size=300).astype(np.int8)
    filler = rng.integers(0, 4, size=500).astype(np.int8)
    seq = np.concatenate([core, filler, core])
    ref = PackedReference.from_dict({"dup": seq}, spacer=small_cfg.chrom_spacer)
    idx = KmerIndex.build(ref.seq, small_cfg.kmer_size)
    read = core[10:60].copy()
    aln = align_read(read, 50, ref, idx, flat_s, small_cfg)
    assert aln.mapped
    assert aln.x0 == 2
    assert aln.mapq == 0
    # deterministic choice: lowest coordinate wins
    ci, local = ref.locate(np.asarray([aln.packed_pos]))
    assert int(local[0]) == 10
