"""Error-profile inference + scoring tensors (SURVEY.md §2 component 3)."""

import numpy as np

from parasuite_tpu.errormodel import (ErrorProfile, counts_to_profile,
                                      flat_score_tensor, infer_counts_numpy,
                                      profile_score_tensor,
                                      complement_score_tensor)
from parasuite_tpu.errormodel.scoring import flat_score_tensor
from parasuite_tpu.oracle.align import align_batch_oracle
from parasuite_tpu.utils.dna import C, G, T, A

from conftest import sample_reads


def test_flat_tensor_shape_and_values(small_cfg):
    s = flat_score_tensor(small_cfg, 50)
    assert s.shape == (50, 5, 5)
    assert s[0, 0, 0] == small_cfg.match_score
    assert s[10, 0, 1] == small_cfg.mismatch_score
    assert s[0, 4, 2] == small_cfg.n_score
    assert s[0, 2, 4] == small_cfg.n_score


def test_complement_tensor_involution(small_cfg):
    s = flat_score_tensor(small_cfg, 50)
    # make it asymmetric so the test is meaningful
    s = s.copy()
    s[:, T, C] = -3  # cheap T->C
    sc = complement_score_tensor(s)
    assert sc[0, A, G] == -3  # comp(T)=A, comp(C)=G
    np.testing.assert_array_equal(complement_score_tensor(sc), s)


def test_profile_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    counts = rng.integers(0, 1000, size=(30, 4, 4)).astype(np.int64)
    p = ErrorProfile(counts=counts, n_reads=123)
    p.save(tmp_path / "x.errorprofile")
    back = ErrorProfile.load(tmp_path / "x.errorprofile")
    np.testing.assert_array_equal(back.counts, counts)
    assert back.n_reads == 123


def test_inference_recovers_tc_conversions(tiny_ref, tiny_index, small_cfg):
    """Reads with injected T->C conversions produce a profile whose T->C rate
    dominates other substitution rates, and the learned tensor scores T->C
    above other mismatches."""
    rng = np.random.default_rng(48)
    L = 50
    codes, lengths, truth = sample_reads(rng, tiny_ref, 120, L, mutate=0)
    # inject T->C in machine frame with 20% probability per T
    is_t = codes == T
    conv = is_t & (rng.random(codes.shape) < 0.2)
    codes = np.where(conv, C, codes).astype(np.int8)

    s_flat = flat_score_tensor(small_cfg, L)
    alns = align_batch_oracle(codes, lengths, tiny_ref, tiny_index, s_flat,
                              small_cfg)
    mapped = np.asarray([a.mapped for a in alns])
    strand = np.asarray([a.strand for a in alns])
    pos = np.asarray([a.packed_pos for a in alns])
    ug = np.asarray([a.ug_equal for a in alns])
    assert mapped.sum() > 100

    prof = infer_counts_numpy(codes, lengths, mapped, strand, pos, tiny_ref,
                              L, ungapped_only=ug)
    probs = prof.probs()
    tc_rate = probs[:, T, C].mean()
    other = (probs[:, A, C].mean() + probs[:, G, C].mean() +
             probs[:, C, G].mean()) / 3
    assert tc_rate > 0.1
    assert other < 0.05

    s_learned = counts_to_profile(prof, small_cfg)
    assert s_learned.shape == (L, 5, 5)
    # T->C scored well above a normal mismatch, below a match
    assert s_learned[:, T, C].mean() > s_learned[:, A, C].mean() + 5
    assert s_learned[10, T, T] > s_learned[10, T, C]


def test_inference_strand_symmetry(tiny_ref, tiny_index, small_cfg):
    """A T->C conversion on a reverse-strand read must land in the T->C cell
    (not A->G): counts are machine-frame."""
    rng = np.random.default_rng(49)
    L = 50
    # forward-extracted fragments, all reported on reverse strand
    codes, lengths, truth = sample_reads(rng, tiny_ref, 40, L, mutate=0,
                                         revcomp_frac=1.0)
    is_t = codes == T
    conv = is_t & (rng.random(codes.shape) < 0.25)
    codes = np.where(conv, C, codes).astype(np.int8)

    s_flat = flat_score_tensor(small_cfg, L)
    alns = align_batch_oracle(codes, lengths, tiny_ref, tiny_index, s_flat,
                              small_cfg)
    mapped = np.asarray([a.mapped for a in alns])
    strand = np.asarray([a.strand for a in alns])
    assert (strand[mapped] == 1).all()
    prof = infer_counts_numpy(codes, lengths, mapped, strand,
                              np.asarray([a.packed_pos for a in alns]),
                              tiny_ref, L,
                              ungapped_only=np.asarray([a.ug_equal for a in alns]))
    off_diag = prof.counts.sum(axis=0) * (1 - np.eye(4, dtype=np.int64))
    # the dominant substitution must be T->C
    assert off_diag.argmax() == 4 * T + C
