"""Pallas TPU kernel for the seeding stage's candidate selection.

Completes the north-star requirement that the hash-seeding stage runs as a
Pallas kernel (BASELINE.json:north_star; SURVEY.md §2 component 4). The
seeding stage splits into (a) k-mer lookup — two HBM table gathers — and
(b) candidate selection — per-read vote counting + top-C extraction over
the S*M candidate diagonals. Part (b) is this kernel. Part (a) deliberately
stays an XLA gather: random single-word HBM access is latency-bound, XLA's
native gather engine pipelines it better than manual per-seed DMAs
(measured ~2M elem / 7 ms on v5e; a DMA-per-seed kernel would pay ~0.5-1 us
descriptor issue per 64 B run, i.e. 3-10x slower — see DESIGN.md).

Contract: bit-equal to ops.aligner.select_candidates (tests/test_pallas.py):
top-C unique diagonals per oriented read by (votes desc, diag asc), where
votes = number of seeds voting for the same diagonal.

Layout: candidates ride SUBLANES (padded to a power of two so the
reductions are full butterflies), reads ride LANES (128 per program).
Vote counting is an all-pairs equality sweep via pltpu.roll (n_pad rolls);
top-C extraction is C lexicographic min butterflies with knockout — no
sort network needed, and no lane-crossing data reshapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parasuite_tpu.config import AlignConfig

I32MAX = np.iinfo(np.int32).max
LANES = 128


def _select_kernel(d_ref, out_ref, *, n_pad, C, lanes):
    d = d_ref[...]                                   # [n_pad, LANES]
    valid = d != I32MAX
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_pad, lanes), 0)

    # votes[c] = run size of d[c] (all-pairs equality; every other index is
    # reached exactly once by the full cycle of rolls); lower[c] counts
    # equals at strictly lower index -> first-occurrence mask
    votes = jnp.ones((n_pad, lanes), dtype=jnp.int32)
    lower = jnp.zeros((n_pad, lanes), dtype=jnp.int32)
    for s in range(1, n_pad):
        e = pltpu.roll(d, s, axis=0)                 # e[c] = d[(c-s) % n_pad]
        eq = d == e
        votes = votes + eq.astype(jnp.int32)
        lower = lower + (eq & (rows >= s)).astype(jnp.int32)
    first = (lower == 0) & valid

    # per-candidate sort key, exactly select_candidates' (negv, dd)
    negv = jnp.where(first, -votes, 1)
    dd = jnp.where(first, d, I32MAX)

    # C rounds of lexicographic-min butterfly + knockout. (negv, dd) pairs
    # are unique for valid first-occurrence rows, so the knockout removes
    # exactly one candidate per round; exhausted/invalid rounds converge on
    # (1, I32MAX) or (2, I32MAX) and emit valid=0.
    dist = 1
    dists = []
    while dist < n_pad:
        dists.append(dist)
        dist *= 2
    for ci in range(C):
        mn, md = negv, dd
        for s in dists:
            rn = pltpu.roll(mn, s, axis=0)
            rd = pltpu.roll(md, s, axis=0)
            take = (rn < mn) | ((rn == mn) & (rd < md))
            mn = jnp.where(take, rn, mn)
            md = jnp.where(take, rd, md)
        out_ref[ci : ci + 1, :] = md[0:1]
        out_ref[C + ci : C + ci + 1, :] = (mn[0:1] < 1).astype(jnp.int32)
        chosen = (negv == mn) & (dd == md)
        negv = jnp.where(chosen, 2, negv)
        dd = jnp.where(chosen, I32MAX, dd)


def select_candidates_pallas(diags: jnp.ndarray, cfg: AlignConfig,
                             interpret: bool = False):
    """Drop-in replacement for ops.aligner.select_candidates."""
    B2, n = diags.shape
    C = cfg.max_candidates
    n_pad = 1
    while n_pad < max(n, C):
        n_pad *= 2
    pad_rows = n_pad - n
    x = diags.T                                      # [n, B2]
    if pad_rows:
        x = jnp.pad(x, ((0, pad_rows), (0, 0)), constant_values=I32MAX)
    pad_cols = (-B2) % LANES
    if pad_cols:
        x = jnp.pad(x, ((0, 0), (0, pad_cols)), constant_values=I32MAX)
    BT = B2 + pad_cols

    kernel = functools.partial(_select_kernel, n_pad=n_pad, C=C, lanes=LANES)
    out = pl.pallas_call(
        kernel,
        grid=(BT // LANES,),
        in_specs=[pl.BlockSpec((n_pad, LANES), lambda g: (0, g),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2 * C, LANES), lambda g: (0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * C, BT), jnp.int32),
        interpret=interpret,
    )(x)

    cand = out[:C, :B2].T                            # [B2, C]
    valid = out[C:, :B2].T.astype(bool)
    return cand, valid
