"""Pallas extension kernel vs jnp extension stage — bit-equal contract
(SURVEY.md §4.1).

The full-size parity suite runs compiled on a real TPU
(PARASUITE_TEST_TPU=1 pytest tests/test_pallas.py). On CPU only a miniature
interpret-mode smoke test runs: interpret-lowering of the unrolled kernel is
minutes-slow to compile at production sizes.
"""

import functools

import jax
import numpy as np
import pytest

from parasuite_tpu.config import AlignConfig
from parasuite_tpu.errormodel import flat_score_tensor
from parasuite_tpu.index import KmerIndex, PackedReference
from parasuite_tpu.ops import DeviceIndex, ScoreParams, align_batch
from parasuite_tpu.ops.aligner import (extend_candidates, orient_reads,
                                       seed_diagonals, select_candidates)
from parasuite_tpu.ops.device_index import min_scores_host
from parasuite_tpu.ops.pallas_extend import extend_candidates_pallas

from conftest import sample_reads

ON_TPU = jax.default_backend() == "tpu"


def _stage_inputs(didx, cfg, codes, lengths):
    oriented = orient_reads(codes, lengths)
    diags = seed_diagonals(oriented, lengths, didx, cfg)
    cand_diag, _cand_valid = select_candidates(diags, cfg)
    return oriented, cand_diag


def _assert_extend_parity(didx, sprof, cfg, codes, lengths,
                          interpret=False):
    oriented, cand_diag = _stage_inputs(didx, cfg, codes, lengths)
    ref_out = jax.jit(functools.partial(extend_candidates, cfg=cfg))(
        oriented, lengths, cand_diag, didx, sprof)
    pal_fn = jax.jit(functools.partial(extend_candidates_pallas, cfg=cfg,
                                      interpret=interpret))
    pal_out = pal_fn(oriented, lengths, cand_diag, didx, sprof)
    for name, r, p in zip(["dp_score", "dp_j", "ug_score", "ug_j"],
                          ref_out, pal_out):
        np.testing.assert_array_equal(np.asarray(p), np.asarray(r),
                                      err_msg=name)


def _assert_select_parity(didx, cfg, codes, lengths, interpret=False):
    from parasuite_tpu.ops.pallas_seed import select_candidates_pallas

    oriented = orient_reads(codes, lengths)
    diags = seed_diagonals(oriented, lengths, didx, cfg)
    ref_cand, ref_valid = jax.jit(functools.partial(
        select_candidates, cfg=cfg))(diags)
    pal_cand, pal_valid = jax.jit(functools.partial(
        select_candidates_pallas, cfg=cfg, interpret=interpret))(diags)
    np.testing.assert_array_equal(np.asarray(pal_cand), np.asarray(ref_cand))
    np.testing.assert_array_equal(np.asarray(pal_valid),
                                  np.asarray(ref_valid))


def test_select_parity_tiny_interpret():
    """Candidate-select kernel vs lax.sort path, interpret mode."""
    cfg = AlignConfig(max_read_len=24, kmer_size=6, max_seeds=4, max_occ=8,
                      max_candidates=2, band_width=2, chrom_spacer=40)
    rng = np.random.default_rng(501)
    # small alphabet-biased reference -> many repeated k-mers -> vote ties
    ref = PackedReference.from_dict(
        {"c": (rng.integers(0, 4, 3000) % 3).astype(np.int8)}, spacer=40)
    idx = KmerIndex.build(ref.seq, cfg.kmer_size)
    didx = DeviceIndex.from_host(ref, idx)
    codes, lengths, _ = sample_reads(rng, ref, 16, 24, mutate=2, indel=True)
    lengths[3] = 0
    _assert_select_parity(didx, cfg, codes, lengths, interpret=not ON_TPU)


def test_extend_parity_tiny_interpret():
    """Miniature end-to-end kernel-vs-jnp check that runs anywhere."""
    cfg = AlignConfig(max_read_len=24, kmer_size=6, max_seeds=4, max_occ=8,
                      max_candidates=2, band_width=2, chrom_spacer=40)
    rng = np.random.default_rng(500)
    ref = PackedReference.from_dict(
        {"c": rng.integers(0, 4, 3000).astype(np.int8)}, spacer=40)
    idx = KmerIndex.build(ref.seq, cfg.kmer_size)
    didx = DeviceIndex.from_host(ref, idx)
    sprof = ScoreParams.from_tensor(flat_score_tensor(cfg, 24), cfg)
    codes, lengths, _ = sample_reads(rng, ref, 16, 24, mutate=2, indel=True)
    lengths[3] = 0
    lengths[4] = 17
    codes[4, 17:] = 4
    _assert_extend_parity(didx, sprof, cfg, codes, lengths,
                          interpret=not ON_TPU)


@pytest.mark.skipif(not ON_TPU, reason="full-size kernel parity needs a TPU "
                                       "(interpret-mode compile is minutes-"
                                       "slow at this size)")
class TestOnTpu:
    @pytest.fixture(scope="class")
    def state(self, tiny_ref, tiny_index, small_cfg):
        didx = DeviceIndex.from_host(tiny_ref, tiny_index)
        s = flat_score_tensor(small_cfg, small_cfg.max_read_len)
        return didx, ScoreParams.from_tensor(s, small_cfg)

    def test_select_parity_compiled(self, state, tiny_ref, small_cfg):
        didx, _sprof = state
        rng = np.random.default_rng(404)
        codes, lengths, _ = sample_reads(rng, tiny_ref, 64, 50, mutate=3,
                                         indel=True)
        lengths[5] = 0
        _assert_select_parity(didx, small_cfg, codes, lengths)

    def test_extend_parity_mixed(self, state, tiny_ref, small_cfg):
        didx, sprof = state
        rng = np.random.default_rng(400)
        codes, lengths, _ = sample_reads(rng, tiny_ref, 64, 50, mutate=3,
                                         indel=True)
        lengths[5] = 0
        codes[6, :20] = 4
        lengths[7] = 36
        codes[7, 36:] = 4
        _assert_extend_parity(didx, sprof, small_cfg, codes, lengths)

    def test_full_align_with_pallas(self, state, tiny_ref, small_cfg):
        didx, sprof = state
        rng = np.random.default_rng(403)
        codes, lengths, _ = sample_reads(rng, tiny_ref, 64, 50, mutate=3,
                                         indel=True)
        ms = min_scores_host(lengths, small_cfg)
        ref_res = jax.jit(functools.partial(
            align_batch, cfg=small_cfg.replace(extend_impl="jnp")))(
            didx, sprof, codes, lengths, ms)
        pal_res = jax.jit(functools.partial(
            align_batch, cfg=small_cfg.replace(extend_impl="pallas")))(
            didx, sprof, codes, lengths, ms)
        for f in ref_res._fields:
            np.testing.assert_array_equal(np.asarray(getattr(pal_res, f)),
                                          np.asarray(getattr(ref_res, f)),
                                          err_msg=f)
