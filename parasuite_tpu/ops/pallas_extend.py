"""Pallas TPU kernel for the banded affine-gap extension stage.

Replaces ops.aligner.extend_candidates behind the same contract (bit-equal
outputs — tests/test_pallas.py), re-laid-out for the VPU:

  * pairs ride the LANE axis (tile = 128*C lanes per program), the 2W+1 band
    rides SUBLANES (padded to 16) — the jnp path's [P, band] arrays used 11
    of 128 lanes; this layout uses all of them;
  * the read-position loop is statically unrolled, so every slice is static
    and Mosaic emits straight-line vector code (no per-step dispatch);
  * the reference arrives as 3-BIT PACKED int32 words (10 bases/word, N=4
    packed directly — ops/packed_ref.py): ONE gather stream of ~8 rows per
    pair instead of int8 bases (L+16 rows) or 2-bit words + N-mask (12 rows).
    XLA element gathers are the pipeline's dominant cost (~60k elem/ms on
    v5e), so gathered-row count is the metric that matters. The kernel
    unpacks the whole window into a VMEM scratch ONCE (compare-chain word
    row + variable shift, ~5 vector blocks), so the DP loop reads static
    16-row slices with zero per-step address math;
  * substitution scores come from PER-READ 5-row tables (int8, [L*5, B2])
    built by one-hot int8 multiply-reduce on the XLA side (VPU; exact — one
    nonzero term per output) and lane-repeated C-fold inside the kernel via
    pltpu.repeat;
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
from parasuite_tpu.ops.packed_ref import (BASES_PER_WORD, pack_reference,
                                          split_base)

BAND_PAD = 16      # max band tile (sublane tile for int32 is 8)
READS_PER_TILE = 128  # lane-aligned read block; tile_p = 128 * C


def band_pad_for(band: int) -> int:
    """DP row tile: 8 sublanes when the band fits (halves kernel compute
    vs the 16-row tile), else 16. int32 sublane tile is 8."""
    return 8 if band <= 8 else 16


def _extend_kernel(refw_ref, base_ref, rows5_ref, lengths_ref,
                   out_ref, codes_ref, *, L, band, bp, go, ge, tile_p,
                   n_words, c_rep, G):
    """One tile:
       refw     [2*ROW_W, TILE_P] int32 — two aligned 16-word rows of 3-bit
                packed reference per pair (row-gather layout, _pairs_layout)
       base     [3, TILE_P] int32 — packed coord of band origin (diag - W,
                for in-range masking), its in-word offset, in-fetch word off
       rows5    [L*5, TILE_P // c_rep] int8 — per-read score rows
       lengths  [1, TILE_P] int32
       out      [4, TILE_P] int32 (dp_score, dp_j, ug_score, ug_j)
       codes    [WIN_PAD, TILE_P] int32 VMEM scratch — unpacked ref codes
    """
    jrow = jax.lax.broadcasted_iota(jnp.int32, (bp, tile_p), 0)
    in_band = jrow < band
    neg = jnp.full((bp, tile_p), NEG, dtype=jnp.int32)
    lr = lengths_ref[0:1, :]                     # [1, TILE_P]
    base = base_ref[0:1, :]                      # [1, TILE_P]
    base_r = base_ref[1:2, :]                    # [1, TILE_P]
    off_w = base_ref[2:3, :]                     # [1, TILE_P] in-fetch word

    # --- unpack the whole ref window ONCE into scratch (the inner loop then
    # reads static band-tile slices): codes[w, p] = ref[base + w], N=4
    # outside [0, G). Word row = off_w + (base_r + w) // 10 (compare chain);
    # refw holds TWO aligned 16-word rows, so the select spans
    # off_w + rel <= 15 + n_words - 1 rows. Per-block cost is ~30 vector ops
    # vs ~12 PER DP STEP in the fused layout this replaced.
    win_pad = codes_ref.shape[0]
    for wb in range(0, win_pad, bp):
        x = base_r + wb + jrow                   # [bp, TILE_P]
        rel = jnp.zeros((bp, tile_p), dtype=jnp.int32)
        for r in range(1, n_words):
            rel = rel + (x >= r * BASES_PER_WORD).astype(jnp.int32)
        idx = off_w + rel
        word = jnp.zeros((bp, tile_p), dtype=jnp.int32)
        for r in range(ROW_W + n_words - 1):
            word = jnp.where(idx == r, refw_ref[r : r + 1, :], word)
        xm = x - rel * BASES_PER_WORD
        code = (word >> (xm * 3)) & 7
        off = base + wb + jrow
        inr = (off >= 0) & (off < G)
        codes_ref[wb : wb + bp, :] = jnp.where(inr, code, 4)

    # lane-repeat the per-read score rows to per-pair width ONCE (one big
    # pltpu.repeat instead of 5 per DP step)
    rows_all = pltpu.repeat(rows5_ref[...], c_rep, axis=1)  # [L*5, TILE_P] i8

    m = neg
    ix = neg
    iy = neg
    ug = jnp.zeros((bp, tile_p), dtype=jnp.int32)

    for i in range(L):
        rb = codes_ref[i : i + bp, :]      # ref[base + i + jrow]

        # --- sub[j, p] via 5-way select from lane-repeated score rows ---
        sub = jnp.full((bp, tile_p), NEG, dtype=jnp.int32)
        for r in range(5):
            row = rows_all[5 * i + r : 5 * i + r + 1, :].astype(jnp.int32)
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
        shift = 1
        while shift < bp:
            shifted = jnp.concatenate([neg[:shift], cm[:-shift]], axis=0)
            cm = jnp.maximum(cm, shifted)
            shift *= 2
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


def build_score_rows(oriented, lengths, sprof: ScoreParams, L: int):
    """Per-read substitution score rows [L*5, B2] int8.

    rows5[i*5 + r, b2] = S_all[strand][prof(b2, i)][r][read(b2, i)] with
    prof(i) = i forward / len-1-i reverse. Built as one-hot multiply-reduce
    on the VPU in int8 (exact: each output has exactly one nonzero term).
    The reverse strand's length-dependent row permutation is folded into a
    tiny static table s_rev[len, i] = s_comp[len-1-i] ([L+1, L, 5, 5] int8),
    row-gathered per read by length — contiguous 25L-byte slices, unlike the
    elementwise gathers this replaced. (An MXU one-hot-matmul formulation was
    measured slower: LxL matrices pad catastrophically on the 128x128 array.)
    Rows at i >= len are unconstrained (the kernel masks them via `act`).
    """
    B = oriented.shape[0]
    fwd = oriented[:, 0, :]                                  # [B, L] int32
    rc = oriented[:, 1, :]                                   # [B, L] int32
    ohf = jax.nn.one_hot(fwd, 5, dtype=jnp.int8)             # [B, L, 5]
    ohc = jax.nn.one_hot(rc, 5, dtype=jnp.int8)
    sf8 = sprof.s_fwd[:L].astype(jnp.int8)                   # [L, 5, 5]
    sc8 = sprof.s_comp[:L].astype(jnp.int8)
    rows_f = jnp.sum(sf8[None] * ohf[:, :, None, :], axis=-1,
                     dtype=jnp.int8)                         # [B, L, 5]
    li = jnp.clip(jnp.arange(L + 1)[:, None] - 1 - jnp.arange(L)[None, :],
                  0, L - 1)                                  # [L+1, L]
    s_rev = sc8[li]                                          # [L+1, L, 5, 5]
    a_r = s_rev[jnp.clip(lengths, 0, L)]                     # [B, L, 5, 5]
    rows_r = jnp.sum(a_r * ohc[:, :, None, :], axis=-1, dtype=jnp.int8)
    rows = jnp.stack([rows_f, rows_r], axis=1)               # [B, 2, L, 5]
    return rows.reshape(B * 2, L * 5).T                      # [L*5, B2]


ROW_W = 16  # packed words per gathered row (2 rows cover any window)


def _pairs_layout(oriented, lengths, cand_diag, didx, sprof, cfg, L):
    """XLA-side preparation: packed ref word windows + per-read score tables.

    The window fetch is TWO aligned 16-word ROW gathers per pair from the
    packed table reshaped [NW/16, 16] — measured ~3x faster per fetch than
    per-word element gathers on v5e (row vs element gather micro, DESIGN.md);
    the in-row offset is realigned inside the kernel's unpack select chain.
    """
    B = oriented.shape[0]
    C = cand_diag.shape[1]
    W = cfg.band_width
    G = didx.ref_seq.shape[0]
    B2 = B * 2
    P = B2 * C
    # words the DP actually reads: in-word offsets up to 9 + (L-1) + (BP-1)
    n_words = (L + BAND_PAD + BASES_PER_WORD - 1) // BASES_PER_WORD + 1

    words = pack_reference(didx.ref_seq)
    nw_tot = words.shape[0]
    # one SPARE row beyond the last data row so r0+1 never clips for any
    # in-range window; clipped (out-of-range) windows are garbage-masked by
    # the kernel's absolute position check
    nw_pad = (nw_tot // ROW_W + 2) * ROW_W
    w2 = jnp.pad(words, (0, nw_pad - nw_tot)).reshape(nw_pad // ROW_W, ROW_W)
    diag = jnp.clip(cand_diag, -(L + BAND_PAD + 1), G).reshape(P)
    base = diag - W
    base_q, base_r = split_base(base)
    r0 = jnp.clip(base_q >> 4, 0, nw_pad // ROW_W - 2)
    rows = jnp.take(w2, jnp.stack([r0, r0 + 1]), axis=0)     # [2, P, 16]
    refw = rows.transpose(0, 2, 1).reshape(2 * ROW_W, P)     # [32, P]
    off_w = base_q - (r0 << 4)   # in-fetch word offset (0..15 when legit)

    rows5 = build_score_rows(oriented, lengths, sprof, L)    # [L*5, B2]
    base2 = jnp.stack([base, base_r, off_w]).astype(jnp.int32)  # [3, P]
    len2 = jnp.repeat(lengths, 2)
    lr_pairs = jnp.repeat(len2, C)[None, :].astype(jnp.int32)  # [1, P]
    return refw, base2, rows5, lr_pairs, P, n_words


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
    bp = band_pad_for(band)
    G = didx.ref_seq.shape[0]
    tile_p = READS_PER_TILE * C

    refw, base2, rows5, lr_pairs, P, n_words = _pairs_layout(
        oriented, lengths, cand_diag, didx, sprof, cfg, L)
    pad = (-P) % tile_p
    if pad:
        refw = jnp.pad(refw, ((0, 0), (0, pad)))
        base2 = jnp.pad(base2, ((0, 0), (0, pad)))
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
    base2 = to_tile_order(base2)
    lr_pairs = to_tile_order(lr_pairs)

    win_pad = ((L + bp + bp - 1) // bp) * bp
    kernel = functools.partial(_extend_kernel, L=L, band=band, bp=bp,
                               go=cfg.gap_open, ge=cfg.gap_extend,
                               tile_p=tile_p, n_words=n_words, c_rep=C, G=G)
    out = pl.pallas_call(
        kernel,
        grid=(PT // tile_p,),
        in_specs=[
            pl.BlockSpec((2 * ROW_W, tile_p), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile_p), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L * 5, READS_PER_TILE), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_p), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, tile_p), lambda g: (0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, PT), jnp.int32),
        scratch_shapes=[pltpu.VMEM((win_pad, tile_p), jnp.int32)],
        interpret=interpret,
    )(refw, base2, rows5, lr_pairs)

    out = from_tile_order(out)[:, :P]
    shape = (B * 2, C)
    return (out[0].reshape(shape), out[1].reshape(shape),
            out[2].reshape(shape), out[3].reshape(shape))
