"""Pallas TPU kernel for the banded affine-gap extension stage.

Replaces ops.aligner.extend_candidates behind the same contract (bit-equal
outputs — tests/test_pallas.py), re-laid-out for the VPU:

  * pairs ride the LANE axis (tile = 128*C lanes per program), the 2W+1 band
    rides SUBLANES (padded to 16) — the jnp path's [P, band] arrays used 11
    of 128 lanes; this layout uses all of them;
  * the read-position loop is statically unrolled, so every slice is static
    and Mosaic emits straight-line vector code (no per-step dispatch);
  * the reference arrives as 2-BIT PACKED int32 words (16 bases/word) plus a
    16-bit N mask — the XLA-side window gather shrinks from L+16 rows of
    int8 to ~6 rows of int32 (the gather was 60ms/batch, the dominant cost
    measured by tools/profile_stages.py); the kernel unpacks with per-lane
    variable shifts;
  * substitution scores come from PER-READ 5-row tables (int8, [L*5, B2])
    lane-repeated C-fold inside the kernel via pltpu.repeat — no [L*5, P]
    materialization in HBM;
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
READS_PER_TILE = 128  # lane-aligned read block; tile_p = 128 * C


def pack_reference(ref_seq: jnp.ndarray):
    """int8 codes [G] -> (words int32 [ceil(G/16)], nmask int32 [...]).

    words hold 16 bases at 2 bits each (N packed as 0); nmask holds the
    is-N bit per base. Recomputed inside the jit per batch — it is a handful
    of shifted adds over G/16 words, microseconds next to the gathers it
    eliminates, and keeps DeviceIndex's layout unchanged everywhere.
    """
    G = ref_seq.shape[0]
    Gp = ((G + 15) // 16) * 16
    seq_p = jnp.pad(ref_seq, (0, Gp - G), constant_values=4)
    s4 = seq_p.reshape(Gp // 16, 16).astype(jnp.int32)
    shifts2 = (jnp.arange(16, dtype=jnp.int32) * 2)[None, :]
    shifts1 = jnp.arange(16, dtype=jnp.int32)[None, :]
    words = jnp.sum(jnp.where(s4 == 4, 0, s4) << shifts2, axis=1)
    nmask = jnp.sum((s4 == 4).astype(jnp.int32) << shifts1, axis=1)
    return words, nmask


def _extend_kernel(refw_ref, nw_ref, base_ref, rows5_ref, lengths_ref,
                   out_ref, *, L, band, go, ge, tile_p, n_words, c_rep, G):
    """One tile:
       refw/nw  [n_words, TILE_P] int32 — packed ref words per pair
       base     [1, TILE_P] int32 — packed coord of band origin (diag - W)
       rows5    [L*5, TILE_P // c_rep] int8 — per-read score rows
       lengths  [1, TILE_P] int32
       out      [4, TILE_P] int32 (dp_score, dp_j, ug_score, ug_j)
    """
    jrow = jax.lax.broadcasted_iota(jnp.int32, (BAND_PAD, tile_p), 0)
    in_band = jrow < band
    neg = jnp.full((BAND_PAD, tile_p), NEG, dtype=jnp.int32)
    lr = lengths_ref[0:1, :]                     # [1, TILE_P]
    base = base_ref[0:1, :]                      # [1, TILE_P]
    base_w = base >> 4                           # word index of first window word

    m = neg
    ix = neg
    iy = neg
    ug = jnp.zeros((BAND_PAD, tile_p), dtype=jnp.int32)

    for i in range(L):
        # --- unpack rb[j, p] = ref[base + i + j] from packed words ---
        off = base + i + jrow                    # absolute packed position
        rel = (off >> 4) - base_w                # word row in [0, n_words)
        word = jnp.zeros((BAND_PAD, tile_p), dtype=jnp.int32)
        nwrd = jnp.zeros((BAND_PAD, tile_p), dtype=jnp.int32)
        for r in range(n_words):
            wrow = refw_ref[r : r + 1, :]
            nrow = nw_ref[r : r + 1, :]
            hit = rel == r
            word = jnp.where(hit, wrow, word)
            nwrd = jnp.where(hit, nrow, nwrd)
        bit = off & 15
        code = (word >> (bit * 2)) & 3
        is_n = (nwrd >> bit) & 1
        inr = (off >= 0) & (off < G)
        rb = jnp.where(inr & (is_n == 0), code, 4)

        # --- sub[j, p] via 5-way select from lane-repeated score rows ---
        sub = jnp.full((BAND_PAD, tile_p), NEG, dtype=jnp.int32)
        for r in range(5):
            row = rows5_ref[5 * i + r : 5 * i + r + 1, :].astype(jnp.int32)
            row = pltpu.repeat(row, c_rep, axis=1)          # [1, TILE_P]
            sub = jnp.where(rb == r, row, sub)
        act = i < lr                             # [1, TILE_P]
        sub = jnp.where(act & in_band, sub, jnp.where(in_band, 0, NEG))

        # --- DP step (oracle.banded_dp semantics) ---
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

        # Iy[j] = max_{u<j}(M[u] - go - (j-1-u)*ge) via prefix-max of
        # A[u] = M[u] - go + u*ge, then shift down one row
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
    """XLA-side preparation: packed ref word windows + per-read score tables."""
    B = oriented.shape[0]
    C = cand_diag.shape[1]
    W = cfg.band_width
    G = didx.ref_seq.shape[0]
    B2 = B * 2
    P = B2 * C
    # words covering [base, base + L + BAND_PAD): base may straddle, so
    # ceil((L + BAND_PAD)/16) + 1 rows
    n_words = (L + BAND_PAD + 15) // 16 + 1

    words, nmask = pack_reference(didx.ref_seq)
    NW_tot = words.shape[0]
    diag = jnp.clip(cand_diag, -(L + BAND_PAD + 1), G).reshape(P)
    base = diag - W
    base_w = base >> 4
    r = jnp.arange(n_words)
    widx = jnp.clip(base_w[None, :] + r[:, None], 0, NW_tot - 1)
    refw = words[widx]                                       # [n_words, P]
    nw = nmask[widx]

    # rows5[i*5 + r, b2] = S_all[strand][prof(b2, i)][r][read(b2, i)]
    reads2 = oriented.reshape(B2, L)
    len2 = jnp.repeat(lengths, 2)
    strand2 = jnp.tile(jnp.arange(2), B)
    i = jnp.arange(L)
    prof = jnp.where(strand2[:, None] == 0, i[None, :],
                     jnp.clip(len2[:, None] - 1 - i[None, :], 0, L - 1))
    s_all = jnp.stack([sprof.s_fwd, sprof.s_comp])           # [2, L, 5, 5]
    rows5 = s_all[strand2[:, None, None], prof[:, :, None],
                  jnp.arange(5)[None, None, :], reads2[:, :, None]]
    rows5 = rows5.astype(jnp.int8).reshape(B2, L * 5).T      # [L*5, B2]

    base2d = base[None, :].astype(jnp.int32)                 # [1, P]
    lr_pairs = jnp.repeat(len2, C)[None, :].astype(jnp.int32)  # [1, P]
    return refw, nw, base2d, rows5, lr_pairs, P, n_words


def extend_candidates_pallas(oriented, lengths, cand_diag, didx: DeviceIndex,
                             sprof: ScoreParams, cfg: AlignConfig,
                             interpret: bool = False):
    """Drop-in replacement for ops.aligner.extend_candidates."""
    B = oriented.shape[0]
    L = oriented.shape[2]
    C = cand_diag.shape[1]
    band = cfg.band
    if band > BAND_PAD:
        raise ValueError(f"band {band} exceeds kernel BAND_PAD {BAND_PAD}")
    G = didx.ref_seq.shape[0]
    tile_p = READS_PER_TILE * C

    refw, nw, base2d, rows5, lr_pairs, P, n_words = _pairs_layout(
        oriented, lengths, cand_diag, didx, sprof, cfg, L)
    pad = (-P) % tile_p
    if pad:
        refw = jnp.pad(refw, ((0, 0), (0, pad)))
        nw = jnp.pad(nw, ((0, 0), (0, pad)), constant_values=-1)  # all N
        base2d = jnp.pad(base2d, ((0, 0), (0, pad)))
        lr_pairs = jnp.pad(lr_pairs, ((0, 0), (0, pad)))
    pad_reads = (refw.shape[1] // tile_p) * READS_PER_TILE - rows5.shape[1]
    if pad_reads:
        rows5 = jnp.pad(rows5, ((0, 0), (0, pad_reads)))
    PT = P + pad
    n_tiles = PT // tile_p

    # pltpu.repeat is TILE-style (np.tile): repeated rows5 lanes hold read
    # (l % 128). Permute pair columns within each tile from (read-major,
    # cand) to (cand-major, read) so lane l <-> pair (b2 = g*128 + l%128,
    # c = l//128); outputs are permuted back below.
    def to_tile_order(x):
        r = x.shape[0]
        return x.reshape(r, n_tiles, READS_PER_TILE, C).transpose(
            0, 1, 3, 2).reshape(r, PT)

    def from_tile_order(x):
        r = x.shape[0]
        return x.reshape(r, n_tiles, C, READS_PER_TILE).transpose(
            0, 1, 3, 2).reshape(r, PT)

    refw = to_tile_order(refw)
    nw = to_tile_order(nw)
    base2d = to_tile_order(base2d)
    lr_pairs = to_tile_order(lr_pairs)

    kernel = functools.partial(_extend_kernel, L=L, band=band,
                               go=cfg.gap_open, ge=cfg.gap_extend,
                               tile_p=tile_p, n_words=n_words, c_rep=C, G=G)
    out = pl.pallas_call(
        kernel,
        grid=(PT // tile_p,),
        in_specs=[
            pl.BlockSpec((n_words, tile_p), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_words, tile_p), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_p), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L * 5, READS_PER_TILE), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_p), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, tile_p), lambda g: (0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, PT), jnp.int32),
        interpret=interpret,
    )(refw, nw, base2d, rows5, lr_pairs)

    out = from_tile_order(out)[:, :P]
    shape = (B * 2, C)
    return (out[0].reshape(shape), out[1].reshape(shape),
            out[2].reshape(shape), out[3].reshape(shape))
