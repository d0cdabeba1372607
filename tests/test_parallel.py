"""Distributed alignment on the 8-device virtual CPU mesh (SURVEY.md §4.4):
sharded results and psum'd profiles must equal the single-device run exactly."""

import functools

import jax
import numpy as np
import pytest

from parasuite_tpu.errormodel import flat_score_tensor
from parasuite_tpu.ops import DeviceIndex, ScoreParams, align_batch
from parasuite_tpu.ops.device_index import min_scores_host
from parasuite_tpu.ops.profile_update import profile_counts_batch
from parasuite_tpu.parallel import make_dist_align_step, make_mesh, shard_batch

from conftest import sample_reads


@pytest.fixture(scope="module")
def dev_state(tiny_ref, tiny_index, small_cfg):
    didx = DeviceIndex.from_host(tiny_ref, tiny_index)
    sprof = ScoreParams.from_tensor(
        flat_score_tensor(small_cfg, small_cfg.max_read_len), small_cfg)
    return didx, sprof


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8, (
        "conftest must provide 8 virtual CPU devices")


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_dist_matches_single_device(dev_state, tiny_ref, tiny_index,
                                    small_cfg, n_dev):
    didx, sprof = dev_state
    rng = np.random.default_rng(200 + n_dev)
    codes, lengths, _ = sample_reads(rng, tiny_ref, 64, 50, mutate=3)
    ms = min_scores_host(lengths, small_cfg)

    mesh = make_mesh(n_dev)
    step = make_dist_align_step(small_cfg, mesh)
    res_d, counts_d = step(didx, sprof, codes, lengths, ms)

    single = jax.jit(functools.partial(align_batch, cfg=small_cfg))
    res_s = single(didx, sprof, codes, lengths, ms)
    counts_s = jax.jit(functools.partial(profile_counts_batch, cfg=small_cfg))(
        didx, codes, lengths, res_s.mapped, res_s.strand, res_s.pos,
        res_s.ug_equal)

    for f in res_s._fields:
        np.testing.assert_array_equal(np.asarray(getattr(res_d, f)),
                                      np.asarray(getattr(res_s, f)),
                                      err_msg=f"{f} @ {n_dev} devices")
    np.testing.assert_array_equal(np.asarray(counts_d), np.asarray(counts_s))


def test_counts_identical_across_shard_counts(dev_state, tiny_ref, small_cfg):
    """SURVEY.md §4.5: profile matrices bit-identical at any shard count."""
    didx, sprof = dev_state
    rng = np.random.default_rng(300)
    codes, lengths, _ = sample_reads(rng, tiny_ref, 48, 50, mutate=2)
    ms = min_scores_host(lengths, small_cfg)
    outs = []
    for n_dev in (2, 8):
        step = make_dist_align_step(small_cfg, make_mesh(n_dev))
        c, l, m = shard_batch(codes, lengths, ms, n_dev)
        _res, counts = step(didx, sprof, c, l, m)
        outs.append(np.asarray(counts))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_shard_batch_padding(small_cfg):
    codes = np.zeros((10, 50), dtype=np.int8)
    lengths = np.full(10, 50, dtype=np.int32)
    ms = np.full(10, 1, dtype=np.int32)
    c, l, m = shard_batch(codes, lengths, ms, 8)
    assert c.shape[0] == 16
    assert (l[10:] == 0).all()
    assert (c[10:] == 4).all()


def test_scaling_report(dev_state, tiny_ref, small_cfg):
    """Weak-scaling harness runs over virtual devices and reports sane
    efficiency numbers (config 5 report shape)."""
    from parasuite_tpu.benchkit.scaling import measure_scaling

    didx, sprof = dev_state
    rng = np.random.default_rng(800)
    codes, lengths, _ = sample_reads(rng, tiny_ref, 8 * 16, 50, mutate=1)
    rep = measure_scaling(didx, sprof, codes, lengths, small_cfg,
                          device_counts=[1, 2, 8], per_device_reads=16,
                          rounds=1)
    assert [p["n_devices"] for p in rep["points"]] == [1, 2, 8]
    assert rep["points"][0]["efficiency"] == 1.0
    for p in rep["points"]:
        assert p["reads_per_s"] > 0
