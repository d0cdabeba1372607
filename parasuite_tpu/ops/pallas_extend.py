"""Pallas TPU kernel for the banded affine-gap extension stage.

Replaces ops.aligner.extend_candidates behind the same contract (bit-equal
outputs — tests/test_pallas.py), re-laid-out for the VPU:

  * pairs ride the LANE axis (TILE_P lanes per program), the 2W+1 band rides
    SUBLANES (padded to 16) — the jnp path's [P, band] arrays used 11 of 128
    lanes; this layout uses all of them (the 70%-of-runtime fix measured by
    tools/profile_stages.py);
  * the read-position loop is statically unrolled, so every slice is static
    and Mosaic emits straight-line vector code (no per-step kernel dispatch);
  * substitution scores come from a per-read 5-row score table via four
    compare-selects — the kernel performs NO gathers; the only gathers left
    (ref windows, score rows) happen once in XLA-land per batch;
  * gap closure (Iy) uses a log-step sublane prefix-max instead of a
    sequential band walk.

Scoring/recurrences/tie-breaks are oracle.banded_dp exactly; dead band rows
(j >= 2W+1) are re-clamped to NEG every step so int32 never wraps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parasuite_tpu.config import AlignConfig
from parasuite_tpu.ops.aligner import NEG
from parasuite_tpu.ops.device_index import DeviceIndex, ScoreParams

BAND_PAD = 16      # sublane tile for int32
DEF_TILE_P = 512   # pairs (lanes) per program


def _extend_kernel(refwin_ref, rows5_ref, lengths_ref, out_ref, *, L, band,
                   go, ge, tile_p):
    """One tile: refwin [L+BAND_PAD, TILE_P], rows5 [L*5, TILE_P],
    lengths [1, TILE_P] -> out [4, TILE_P] (dp_score, dp_j, ug_score, ug_j)."""
    jrow = jax.lax.broadcasted_iota(jnp.int32, (BAND_PAD, tile_p), 0)
    in_band = jrow < band
    neg = jnp.full((BAND_PAD, tile_p), NEG, dtype=jnp.int32)
    lr = lengths_ref[0:1, :]                     # [1, TILE_P]

    m = neg
    ix = neg
    iy = neg
    ug = jnp.zeros((BAND_PAD, tile_p), dtype=jnp.int32)

    for i in range(L):
        rb = refwin_ref[i : i + BAND_PAD, :]     # [BAND_PAD, TILE_P]
        # sub[j, p] = rows5[i, rb[j, p], p] via 5-way select (no gathers)
        sub = jnp.full((BAND_PAD, tile_p), NEG, dtype=jnp.int32)
        for r in range(5):
            row = rows5_ref[5 * i + r : 5 * i + r + 1, :]   # [1, TILE_P]
            sub = jnp.where(rb == r, row, sub)
        act = i < lr                             # [1, TILE_P]
        sub = jnp.where(act & in_band, sub, jnp.where(in_band, 0, NEG))

        best_prev = jnp.maximum(m, jnp.maximum(ix, iy))
        m_new = sub + (best_prev if i > 0 else 0)
        m_new = jnp.where(in_band, m_new, NEG)

        if i > 0:
            m_up = jnp.concatenate([m[1:], neg[:1]], axis=0)
            ix_up = jnp.concatenate([ix[1:], neg[:1]], axis=0)
            ix_new = jnp.maximum(m_up - go, ix_up - ge)
            ix_new = jnp.where(in_band, ix_new, NEG)
        else:
            ix_new = neg

        # Iy[j] = max_{t<j}(M[t] - go - (j-1-t) ge) via prefix-max of
        # A[t] = M[t] - go + t*ge, then shift down one row
        a = jnp.where(in_band, m_new - go + jrow * ge, NEG)
        cm = a
        for shift in (1, 2, 4, 8):
            shifted = jnp.concatenate([neg[:shift], cm[:-shift]], axis=0)
            cm = jnp.maximum(cm, shifted)
        iy_new = jnp.concatenate([neg[:1], (cm - jrow * ge)[:-1]], axis=0)
        iy_new = jnp.where(in_band, iy_new, NEG)

        m = jnp.where(act, m_new, m)
        ix = jnp.where(act, ix_new, neg)
        iy = jnp.where(act, iy_new, neg)
        ug = ug + jnp.where(act & in_band, sub, 0)

    big = jnp.int32(1 << 20)

    def best(x):
        score = jnp.max(x, axis=0, keepdims=True)          # [1, TILE_P]
        jbest = jnp.min(jnp.where(x == score, jrow, big), axis=0,
                        keepdims=True)
        return score, jbest

    dp_score, dp_j = best(jnp.where(in_band, m, NEG))
    ug_score, ug_j = best(jnp.where(in_band, ug, NEG))
    out_ref[0:1, :] = dp_score
    out_ref[1:2, :] = dp_j
    out_ref[2:3, :] = ug_score
    out_ref[3:4, :] = ug_j


def _pairs_layout(oriented, lengths, cand_diag, didx, sprof, cfg, L):
    """XLA-side preparation: ref windows + per-pair score tables, laid out
    pair-on-minor-axis for the kernel."""
    B = oriented.shape[0]
    C = cand_diag.shape[1]
    W = cfg.band_width
    G = didx.ref_seq.shape[0]
    B2 = B * 2
    P = B2 * C
    WINP = L + BAND_PAD

    diag = jnp.clip(cand_diag, -(WINP + 1), G).reshape(P)
    t = jnp.arange(WINP)
    widx = (diag - W)[None, :] + t[:, None]                  # [WINP, P]
    inr = (widx >= 0) & (widx < G)
    refwin = jnp.where(inr, didx.ref_seq[jnp.clip(widx, 0, G - 1)],
                       4).astype(jnp.int32)

    # rows5[i, r, b2] = S_all[strand][prof(b2, i)][r][read(b2, i)]
    reads2 = oriented.reshape(B2, L)
    len2 = jnp.repeat(lengths, 2)
    strand2 = jnp.tile(jnp.arange(2), B)
    i = jnp.arange(L)
    prof = jnp.where(strand2[:, None] == 0, i[None, :],
                     jnp.clip(len2[:, None] - 1 - i[None, :], 0, L - 1))
    s_all = jnp.stack([sprof.s_fwd, sprof.s_comp])           # [2, L, 5, 5]
    rows5 = s_all[strand2[:, None, None],
                  prof[:, :, None],
                  jnp.arange(5)[None, None, :],
                  reads2[:, :, None]]                        # [B2, L, 5]
    rows5 = rows5.astype(jnp.int32).reshape(B2, L * 5)
    rows5 = jnp.repeat(rows5, C, axis=0).T                   # [L*5, P]

    lr_pairs = jnp.repeat(len2, C)[None, :].astype(jnp.int32)  # [1, P]
    return refwin, rows5, lr_pairs, P


def extend_candidates_pallas(oriented, lengths, cand_diag, didx: DeviceIndex,
                             sprof: ScoreParams, cfg: AlignConfig,
                             tile_p: int = DEF_TILE_P, interpret: bool = False):
    """Drop-in replacement for ops.aligner.extend_candidates."""
    B = oriented.shape[0]
    L = oriented.shape[2]
    C = cand_diag.shape[1]
    band = cfg.band
    if band > BAND_PAD:
        raise ValueError(f"band {band} exceeds kernel BAND_PAD {BAND_PAD}")

    refwin, rows5, lr_pairs, P = _pairs_layout(oriented, lengths, cand_diag,
                                               didx, sprof, cfg, L)
    pad = (-P) % tile_p
    if pad:
        refwin = jnp.pad(refwin, ((0, 0), (0, pad)), constant_values=4)
        rows5 = jnp.pad(rows5, ((0, 0), (0, pad)))
        lr_pairs = jnp.pad(lr_pairs, ((0, 0), (0, pad)))
    PT = P + pad

    kernel = functools.partial(_extend_kernel, L=L, band=band,
                               go=cfg.gap_open, ge=cfg.gap_extend,
                               tile_p=tile_p)
    out = pl.pallas_call(
        kernel,
        grid=(PT // tile_p,),
        in_specs=[
            pl.BlockSpec((L + BAND_PAD, tile_p), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L * 5, tile_p), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_p), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, tile_p), lambda g: (0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, PT), jnp.int32),
        interpret=interpret,
    )(refwin, rows5, lr_pairs)

    out = out[:, :P]
    shape = (B * 2, C)
    return (out[0].reshape(shape), out[1].reshape(shape),
            out[2].reshape(shape), out[3].reshape(shape))
