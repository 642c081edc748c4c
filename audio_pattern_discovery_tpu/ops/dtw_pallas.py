"""Pallas TPU kernel for batched banded DTW (SURVEY.md SS3 row 5, SS8 P2d).

Why a kernel at all: the pure-JAX wavefront (ops/dtw.py) materializes the
[B, N, M] cost tensor in HBM and streams it back through the scan — at the
10k-sequence scale (BASELINE config 4) that is terabytes of HBM traffic.
This kernel computes the Gram/cost matrix *in VMEM* with the MXU and runs
the whole DP on-chip; HBM sees only the feature sequences and one scalar
per pair.

Formulation (TPU-first): instead of iterating anti-diagonals — whose cost
reads are diagonal gathers, hostile to Mosaic — we iterate *rows* and
resolve the intra-row dependency with a min-plus associative scan:

    D[i,j] = c[i,j] + min(D[i-1,j], D[i-1,j-1], D[i,j-1])
           = min(e[i,j],  D[i,j-1] + c[i,j]),
      e[i,j] = c[i,j] + min(D[i-1,j], D[i-1,j-1])

The map x -> min(e, x + c) is affine over the (min, +) semiring, so maps
compose associatively: (e2,c2)o(e1,c1) = (min(e2, e1+c2), c1+c2).  A
Hillis-Steele scan over the lane dimension therefore computes a whole row
of D in ceil(log2(live_width)) vector steps — every step a full-width
[PB, S] VPU op.  One row per fori_loop iteration; costs for row i are read
contiguously from the VMEM-resident Gram matrix.

Both kernels run the scan in the MASKED-SHIFT form,
`where(lanes >= sh, pltpu.roll(x, sh), x)`: Mosaic lowers that idiom to a
cheap lane shift, while a directly-consumed circular roll takes a slow
rotate path (a "mask-free" +inf-absorbed variant with fewer ops measured
1.8x SLOWER on the v5e — see the in-kernel NOTE).  What the +inf masking
algebra buys instead:

* Banded scan depth: min-plus influence cannot propagate across a +inf
  cell, and a row's live cells (inside the band and both lengths) form ONE
  contiguous interval of length <= 2*wv_max+1, where wv_max is the largest
  per-pair (auto-widened) band half-width in the batch.  A scan over that
  interval needs only ceil(log2(2*wv_max+1)) steps, not log2(S).  Callers
  that know max|len_a-len_b| on the host (the pair scheduler does) pass it
  as the static `max_len_diff` hint; it also sets the stripe kernel's
  width and extraction slot, so a bound below the true max is a
  correctness error.
* Seam absorption: +inf boundary cells make circular-roll leakage across
  a seam self-absorbing — any wrapped min-plus window that crosses a
  permanently-+inf cell contributes +inf and the min ignores it.  The
  stripe and packed kernels lean on this for their frame boundaries.

Ragged lengths and the Sakoe-Chiba band are +inf cost masks fused into the
cost-matrix build; each pair's distance is extracted as its last valid row
is produced (cf. ops/dtw.py, the correctness oracle).

Layout notes: features are stored time-minor ([PB, d, S]) so the feature
dim rides sublanes and the sequence dim fills all 128 lanes; the batched
Gram contraction over d runs on the MXU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Plain Python float so the kernel traces it as an inline constant
# (a jnp scalar would be a captured device constant, which pallas rejects).
INF = float("inf")

# VMEM ceiling for the Gram scratch: PB=256 at S=128, PB=16 at S=512,
# PB=8 (floor) at S=1024 where the scratch alone is 32 MiB.  Verified on
# hardware at S=1024: compiles under the lifted 100 MiB scoped-VMEM limit
# and runs ~18x faster than the blocked jnp path at that length.
MAX_KERNEL_SEQ_LEN = 1024
# The band-limited stripe kernel stores only [PB, R, W] of cost (W = stripe
# width, 128 for band half-widths <= 63), so banded pairs stay on the Mosaic
# fast path far beyond the square kernel's ceiling.
MAX_STRIPE_SEQ_LEN = 4096
_CMAT_VMEM_BUDGET = 16 * 1024 * 1024
_STRIPE_PANEL_ROWS = 128  # MXU-row-sized Gram panels for the stripe build


def _input_pb_cap(seq_len: int, feat_dim: int) -> int:
    """Largest pow2 PB whose INPUT windows fit ~64 MiB of VMEM.

    Two operands x two double-buffer levels of [PB, da, S] f32, with
    Mosaic layout padding da to a sublane (8) multiple and S to a lane
    (128) multiple — hardware-verified: a [256, 513, 32] window allocates
    256*520*128*4 = 68 MiB PER buffering level, which OOMed the
    raw-feature (AE-off) path while latent-width features never came
    close.  Floor 8: below that the block is degenerate; let the
    compiler's own budget be the final arbiter.
    """
    da = 8 * -(-(feat_dim + 2) // 8)
    sp = 128 * -(-seq_len // 128)
    cap = (64 * 1024 * 1024) // (16 * da * sp)
    return int(max(8, 1 << max(0, cap.bit_length() - 1)))


def default_pair_block(seq_len: int, feat_dim: int | None = None) -> int:
    """Pairs per kernel program: as fat as the Gram scratch allows.

    The row loop is latency-bound (S sequential steps); per-step throughput
    is PB*S lanes, so PB directly multiplies VPU utilization.  Cap so
    PB*S*S*4 bytes of cost matrix fits the VMEM budget (the pallas_call
    lifts Mosaic's scoped-VMEM limit to match; a v5e core has 128 MiB).
    Swept on-chip at S=128/B=32k: PB 128 -> 897k pairs/s, 256 -> 977k,
    512 -> 883k; 256 is the knee.  With `feat_dim`, additionally cap so
    the input windows fit (`_input_pb_cap`) — high-d raw-feature corpora
    are input-bound, not scratch-bound.
    """
    pb = _CMAT_VMEM_BUDGET // (seq_len * seq_len * 4)
    pb = int(max(8, min(256, 1 << (pb.bit_length() - 1))))
    if feat_dim is not None:
        pb = min(pb, _input_pb_cap(seq_len, feat_dim))
    return pb


def scan_len_diff_classes(
    seq_len: int,
    band: int | None,
    auto_widen: bool,
) -> list[int]:
    """Upper-inclusive |len_a - len_b| thresholds partitioning pairs into
    groups with identical kernel ROUTING (stripe width, or square kernel).

    The pair scheduler groups each block's pairs by these classes and passes
    the class bound as the static `max_len_diff`, so banded long-sequence
    blocks ride the narrowest applicable stripe while the static arg takes
    only a handful of canonical values (each extra value is an XLA compile
    on a backend where compiles cost minutes).  Where the stripe never
    applies (e.g. S <= 2*W) this is a single class — measured on hardware,
    splitting the square kernel's batches buys nothing (its row loop cost
    is scan-depth-insensitive; see the round-2 kernel diag notes).
    """
    if band is None or not auto_widen:
        return [seq_len]
    bounds: list[int] = []
    prev = stripe_width(seq_len, band, auto_widen, 0)
    for dd in range(1, seq_len + 1):
        w = stripe_width(seq_len, band, auto_widen, dd)
        if w != prev:
            bounds.append(dd - 1)
            prev = w
    bounds.append(seq_len)
    return bounds


def _dtw_rowscan_kernel(
    a_ref,       # [PB, d, R] f32 (time-minor; R = row capacity, may be < S)
    b_ref,       # [PB, d, S] f32
    la_ref,      # [PB, 1] i32  (la <= R for all real pairs)
    lb_ref,      # [PB, 1] i32
    out_ref,     # [PB, 1] f32
    cmat_ref,    # scratch [PB, R, S] f32
    *,
    rows: int,
    seq_len: int,
    band: int | None,
    auto_widen: bool,
    metric: str,
):
    # NOTE on the masked-shift idiom: this body deliberately keeps per-row
    # in-loop masking and `where(iota-mask, roll(x, sh), x)` scan steps.
    # Round-2 hardware diags tried the "obvious" improvements and ALL of
    # them regressed on the v5e: a mask-free +inf-absorbed scan ran 1.8x
    # SLOWER (a directly-consumed circular roll takes Mosaic's slow rotate
    # path; the masked form lowers to a cheap lane shift), a fused [PB,R,S]
    # validity build cost 10%, and cutting scan depth changed nothing (the
    # loop is bound by per-row fixed costs, not scan op count).
    PB = a_ref.shape[0]
    R = rows
    S = seq_len

    a = a_ref[:]                                    # [PB, d, R]
    b = b_ref[:]
    la = la_ref[:]                                  # [PB, 1]
    lb = lb_ref[:]

    # ---- cost matrix in VMEM (MXU) --------------------------------------
    if metric == "cosine":
        a = a / jnp.maximum(
            jnp.sqrt(jnp.sum(a * a, axis=1, keepdims=True)), 1e-12
        )
        b = b / jnp.maximum(
            jnp.sqrt(jnp.sum(b * b, axis=1, keepdims=True)), 1e-12
        )
    gram = jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        # HIGHEST (multi-pass f32): the default single bf16 MXU pass
        # catastrophically cancels in |a|^2+|b|^2-2ab — self-distances come
        # out ~0.1 instead of 0 (same guard as ops/dtw.py pairwise_cost).
        precision=jax.lax.Precision.HIGHEST,
    )                                               # [PB, S(i), S(j)]
    if metric == "cosine":
        cmat_ref[:] = 1.0 - gram
    else:
        sqa = jnp.sum(a * a, axis=1)                # [PB, R]
        sqb = jnp.sum(b * b, axis=1)                # [PB, S]
        sq = jnp.maximum(
            sqa[:, :, None] + sqb[:, None, :] - 2.0 * gram, 0.0
        )
        cmat_ref[:] = jnp.sqrt(sq) if metric == "euclidean" else sq

    # ---- masks -----------------------------------------------------------
    lanes = jax.lax.broadcasted_iota(jnp.int32, (PB, S), dimension=1)
    col_valid = lanes < lb                          # [PB, S]
    if band is not None:
        w = jnp.int32(band)
        wv = jnp.maximum(w, jnp.abs(la - lb)) if auto_widen else jnp.broadcast_to(w, la.shape)
    else:
        wv = jnp.broadcast_to(jnp.int32(S), la.shape)  # band off

    # ---- row loop with min-plus lane scan -------------------------------
    n_scan = max(1, (S - 1).bit_length())           # ceil(log2(S))

    def row_body(i, carry):
        prev, out = carry                           # prev: [PB, S] = D[i-1, :]
        c = cmat_ref[:, i, :]                       # [PB, S] contiguous row
        row_valid = (
            col_valid
            & (i < la)
            & (jnp.abs(lanes - i) <= wv)
        )
        c = jnp.where(row_valid, c, INF)

        prev_shift = jnp.where(lanes >= 1, pltpu.roll(prev, 1, axis=1), INF)
        e = c + jnp.minimum(prev, prev_shift)
        # Cell (0, 0) has the virtual predecessor D[-1,-1] = 0.
        e = jnp.where((i == 0) & (lanes == 0), c, e)

        # Hillis-Steele min-plus scan: x_j = min(e_j, x_{j-1} + c_j).
        ee, cc = e, c
        sh = 1
        for _ in range(n_scan):
            mask = lanes >= sh
            ee_s = pltpu.roll(ee, sh, axis=1)
            cc_s = pltpu.roll(cc, sh, axis=1)
            ee = jnp.where(mask, jnp.minimum(ee, ee_s + cc), ee)
            cc = jnp.where(mask, cc_s + cc, cc)
            sh *= 2
        row = ee                                    # D[i, :]

        # Extract D[la-1, lb-1] as its row is produced.
        is_last = i == (la - 1)                     # [PB, 1]
        hit = is_last & (lanes == (lb - 1))
        out = jnp.where(
            jnp.any(hit, axis=1, keepdims=True),
            jnp.sum(jnp.where(hit, row, 0.0), axis=1, keepdims=True),
            out,
        )
        return row, out

    init = (jnp.full((PB, S), INF), jnp.full((PB, 1), INF))
    _, out = jax.lax.fori_loop(0, R, row_body, init)
    out_ref[:] = out


def _dtw_stripe_kernel(
    a_ref,       # [PB, da, R] f32 time-minor, metric-augmented (see wrapper)
    b_ref,       # [PB, da, SP] f32 time-minor, prepadded by PADL zeros
    sqa_ref,     # [PB, R] f32 (|a_i|^2; zeros for cosine)
    la_ref,      # [PB, 1] i32
    lb_ref,      # [PB, 1] i32
    out_ref,     # [PB, 1] f32
    cmat_ref,    # scratch [PB, R, W] f32 — the cost STRIPE
    panel_ref,   # scratch [PB, RB, RB + W] f32 — one Gram panel
    *,
    rows: int,
    width: int,
    off: int,
    padl: int,
    band: int,
    auto_widen: bool,
    metric: str,
    scan_steps: int,
):
    """Band-limited DTW: cost and DP in the shifted stripe frame.

    Stripe slot s of row i holds column j = i + s - off; off = wv_max + 1
    keeps slot 0 permanently outside the band (+inf), so the DP loop runs on
    [PB, W] rows regardless of S (the scan itself uses the masked-shift
    idiom — see the note in _dtw_rowscan_kernel).  Memory is O(R * W) per
    pair (SURVEY.md SS6.7 'O(N*band)') instead of O(R * S).

    The stripe is built panel-by-panel: a full-width MXU Gram over a
    [RB, RB + W] column window, then a log2(RB)-step variable left-roll
    (row r shifts by r) turns diagonals into stripe rows.  |b_j|^2 rides
    into the Gram as an extra feature channel (a is augmented with a ones
    channel, b with its squared norms), so only ONE panel needs skewing.
    """
    PB = a_ref.shape[0]
    R = rows
    W = width
    RB = panel_ref.shape[1]
    RBW = panel_ref.shape[2]

    a = a_ref[:]
    b = b_ref[:]
    la = la_ref[:]
    lb = lb_ref[:]
    if band is not None and auto_widen:
        wv = jnp.maximum(jnp.int32(band), jnp.abs(la - lb))   # [PB, 1]
    else:
        wv = jnp.broadcast_to(jnp.int32(band), la.shape)

    n_bits = max(1, (RB - 1).bit_length())
    rloc = jax.lax.broadcasted_iota(jnp.int32, (1, RB, 1), 1)
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)
    band_ok = jnp.abs(s_iota - off) <= wv[:, :, None]         # [PB, 1, W]

    for i0 in range(0, R, RB):
        rb = min(RB, R - i0)
        # Column window for rows [i0, i0+rb): j in [i0-off, i0+rb-1-off+W-1];
        # b is prepadded by padl >= off so the slice start is non-negative.
        c0 = i0 + padl - off
        g = jax.lax.dot_general(
            a[:, :, i0 : i0 + rb],
            b[:, :, c0 : c0 + rb + W],
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # bf16-cancellation guard
        )                                                      # [PB, rb, rb+W]
        panel_ref[:, :rb, : rb + W] = g
        # Variable left-roll: row r by r (diagonals -> stripe rows).  Bit t
        # rolls by 2^t on rows whose local index has that bit set; lanes
        # beyond rb+W are garbage but never land in [0, W) after the roll.
        for t in range(n_bits):
            sh = 1 << t
            rolled = pltpu.roll(panel_ref[:], (RBW - sh) % RBW, axis=2)
            panel_ref[:] = jnp.where((rloc & sh) != 0, rolled, panel_ref[:])
        stripe = panel_ref[:, :rb, :W]                         # [PB, rb, W]

        i_abs = rloc[:, :rb] + i0                              # [1, rb, 1]
        j_abs = i_abs + s_iota - off
        valid = (
            (j_abs >= 0)
            & (j_abs < lb[:, :, None])
            & (i_abs < la[:, :, None])
            & band_ok
        )
        if metric == "cosine":
            cost = 1.0 - stripe
        else:
            sq = jnp.maximum(sqa_ref[:, i0 : i0 + rb][:, :, None] + stripe, 0.0)
            cost = jnp.sqrt(sq) if metric == "euclidean" else sq
        cmat_ref[:, i0 : i0 + rb, :] = jnp.where(valid, cost, INF)

    # ---- DP loop: stripe recurrence ---------------------------------------
    # Masked-shift form throughout: Mosaic lowers `where(iota-mask, roll, x)`
    # to a cheap lane shift, while a directly-consumed circular roll takes a
    # slow rotate path — measured 1.8x slower on hardware (round-2 diag).
    lanes = jax.lax.broadcasted_iota(jnp.int32, (PB, W), dimension=1)
    lane_eq_t = lanes == (lb - la + off)       # extraction slot per pair

    def row_body(i, carry):
        prev, out = carry
        c = cmat_ref[:, i, :]
        # D[i-1, j] lives at slot s+1 of the previous stripe row.
        up = jnp.where(lanes < W - 1, pltpu.roll(prev, W - 1, axis=1), INF)
        e = c + jnp.minimum(prev, up)
        ee, cc = e, c
        for t in range(scan_steps):
            sh = 1 << t
            m = lanes >= sh
            ee = jnp.where(
                m, jnp.minimum(ee, pltpu.roll(ee, sh, axis=1) + cc), ee
            )
            if t < scan_steps - 1:
                cc = jnp.where(m, cc + pltpu.roll(cc, sh, axis=1), cc)
        hit = (i == (la - 1)) & lane_eq_t
        out = jnp.minimum(
            out, jnp.min(jnp.where(hit, ee, INF), axis=1, keepdims=True)
        )
        return ee, out

    # Virtual D[-1,-1] = 0 sits at slot `off` of the virtual row -1.
    prev0 = jnp.where(lanes == off, 0.0, INF)
    init = (prev0, jnp.full((PB, 1), INF))
    _, out = jax.lax.fori_loop(0, R, row_body, init)
    out_ref[:] = out


def stripe_width(seq_len: int, band: int | None, auto_widen: bool,
                 max_len_diff: int | None) -> int | None:
    """Stripe width (multiple of 128) for the band-limited kernel, or None
    when the stripe formulation does not apply / cannot win.

    Requires a band with a statically-bounded widen (slot 0 must sit outside
    every pair's band), and only pays off when the stripe is MUCH narrower
    than the full row: measured on the v5e, stripe/square is 0.91x at
    W=S/2 (S=256) but 1.93x at W=S/4 (S=512) and 2.16x at W=S/8 (S=1024) —
    the panel-skew overhead needs a >= 4x width reduction to win."""
    if band is None:
        return None
    if auto_widen:
        if max_len_diff is None:
            return None
        wv_max = max(int(band), int(max_len_diff))
    else:
        wv_max = int(band)
    w = 128 * (-(-(2 * wv_max + 2) // 128))
    if 4 * w > seq_len:
        return None
    return w


def pallas_supported(seq_len: int, band: int | None, auto_widen: bool,
                     max_len_diff: int | None) -> bool:
    """Can dtw_batch_pallas handle this shape on the Mosaic fast path?"""
    if seq_len <= MAX_KERNEL_SEQ_LEN:
        return True
    w = stripe_width(seq_len, band, auto_widen, max_len_diff)
    return w is not None and seq_len <= MAX_STRIPE_SEQ_LEN


def _stripe_pair_block(rows: int, width: int, panel_rows: int) -> int:
    # 2x the square kernel's scratch budget: the stripe loop is per-row-cost
    # dominated like the square one, so PB is its main throughput lever —
    # measured on-chip at S=512: PB=32 -> 62k pairs/s, PB=64 -> 92k (+47%).
    per_pair = (rows * width + panel_rows * (panel_rows + width)) * 4
    pb = (2 * _CMAT_VMEM_BUDGET) // per_pair
    return int(max(8, min(256, 1 << max(0, pb.bit_length() - 1))))


@partial(
    jax.jit,
    static_argnames=(
        "band",
        "auto_widen",
        "metric",
        "normalize",
        "pair_block",
        "max_len_diff",
        "interpret",
    ),
)
def _dtw_batch_stripe(
    a: jax.Array,            # [B, R, d]
    b: jax.Array,            # [B, S, d]
    len_a: jax.Array,
    len_b: jax.Array,
    *,
    metric: str,
    band: int,
    auto_widen: bool,
    normalize: str,
    pair_block: int | None,
    max_len_diff: int | None,
    interpret: bool,
) -> jax.Array:
    B, R, d = a.shape
    S = b.shape[1]
    W = stripe_width(S, band, auto_widen, max_len_diff)
    assert W is not None
    wv_max = max(int(band), int(max_len_diff)) if auto_widen else int(band)
    off = wv_max + 1
    RB = min(_STRIPE_PANEL_ROWS, R)
    scan_steps = int(max(1, (2 * wv_max).bit_length()))  # ceil(log2(2wv+1))
    PB = pair_block or min(
        _stripe_pair_block(R, W, RB),
        # the b operand ships [PB, da, S + PADL] — same input-window VMEM
        # constraint as the square kernel (high-d raw features OOM first)
        _input_pb_cap(S + off, d),
    )

    pad = (-B) % PB
    if pad:
        a = jnp.concatenate([a, jnp.zeros((pad, R, d), a.dtype)])
        b = jnp.concatenate([b, jnp.zeros((pad, S, d), b.dtype)])
        len_a = jnp.concatenate([len_a, jnp.ones((pad,), len_a.dtype)])
        len_b = jnp.concatenate([len_b, jnp.ones((pad,), len_b.dtype)])
    Bp = B + pad

    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    if metric == "cosine":
        af = af / jnp.maximum(
            jnp.linalg.norm(af, axis=-1, keepdims=True), 1e-12
        )
        bf = bf / jnp.maximum(
            jnp.linalg.norm(bf, axis=-1, keepdims=True), 1e-12
        )
        a_aug = jnp.transpose(af, (0, 2, 1))                 # [B, d, R]
        b_aug = jnp.transpose(bf, (0, 2, 1))
        sqa = jnp.zeros((Bp, R), jnp.float32)
    else:
        # Fold |b_j|^2 into the Gram so only one panel needs skewing:
        # (-2a, 1) . (b, |b|^2) = |b|^2 - 2ab; |a_i|^2 enters row-constant.
        sqb = jnp.sum(bf * bf, axis=-1)                      # [B, S]
        sqa = jnp.sum(af * af, axis=-1)                      # [B, R]
        a_aug = jnp.concatenate(
            [jnp.transpose(-2.0 * af, (0, 2, 1)), jnp.ones((Bp, 1, R))], axis=1
        )                                                    # [B, d+1, R]
        b_aug = jnp.concatenate(
            [jnp.transpose(bf, (0, 2, 1)), sqb[:, None, :]], axis=1
        )
    da = a_aug.shape[1]
    # Prepad b so every panel's column window is a static in-bounds slice:
    # padl >= off on the left, RB + W margin on the right.
    padl = 128 * (-(-off // 128))
    padr = RB + W
    SP = padl + S + padr
    b_aug = jnp.pad(b_aug, ((0, 0), (0, 0), (padl, padr)))

    la2 = len_a.astype(jnp.int32)[:, None]
    lb2 = len_b.astype(jnp.int32)[:, None]

    kernel = partial(
        _dtw_stripe_kernel,
        rows=R,
        width=W,
        off=off,
        padl=padl,
        band=band,
        auto_widen=auto_widen,
        metric=metric,
        scan_steps=scan_steps,
    )
    out = pl.pallas_call(
        kernel,
        grid=(Bp // PB,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        in_specs=[
            pl.BlockSpec((PB, da, R), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, da, SP), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, R), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((PB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((PB, R, W), jnp.float32),
            pltpu.VMEM((PB, RB, RB + W), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * R * (RB + W) * da + 10 * Bp * R * W * scan_steps,
            bytes_accessed=Bp * (R + SP) * da * 4 + Bp * 4,
            transcendentals=Bp * R * W if metric == "euclidean" else 0,
        ),
        interpret=interpret,
    )(a_aug, b_aug, sqa, la2, lb2)

    dist = out[:B, 0]
    if normalize == "path_len":
        dist = dist / (len_a[:B] + len_b[:B]).astype(jnp.float32)
    elif normalize != "none":
        raise ValueError(f"unknown normalize {normalize!r}")
    return dist


# ---------------------------------------------------------------------------
# All-pairs TILE kernel (round 3).
#
# Why: this device's observable HBM bandwidth is ~17.6 GB/s (46x below v5e
# spec; virtualized-tunnel reality), and the per-pair square kernel ships
# 16 KB of gathered features per pair — its ~1.0M pairs/s ceiling is the
# memory system, not compute (BASELINE.md round-3 findings; the round-2
# "VPU floor" was hidden input DMA).  All-pairs DTW reuses every sequence
# ~K times, so a (ti x ti)-sequence tile-pair program loads ~2.3 MB once
# and computes ti*ti pairs in VMEM: ~140 B/pair, a ~115x traffic cut.
# ---------------------------------------------------------------------------


def _dtw_tile_kernel(
    ti_map_ref,  # scalar-prefetch [U] i32 (consumed by index_maps)
    tj_map_ref,  # scalar-prefetch [U] i32
    a_ref,       # [ti, da, S] f32 time-minor, channels (-2a | 1 | sqa)
    b_ref,       # [ti, da, S] f32 time-minor, channels (b | sqb | 1)
    la_ref,      # [ti, 1] i32
    lb_ref,      # [ti, 1] i32
    out_ref,     # [1, ti, nv, sv] f32 (v-blocks ride a sublane-major dim:
                 #  dynamic-offset stores only exist there, and a block's
                 #  last two dims must equal the array's)
    cmat_ref,    # scratch [S, su, sv, S] f32 — subtile cost, row-major
    ex_ref,      # scratch [su, sv, S] i32 — extraction row per (pair, lane)
    *,
    su: int,
    sv: int,
    band: int | None,
    auto_widen: bool,
    metric: str,
    scan_steps: int,
    rows: int,
    gram_precision: jax.lax.Precision,
    cmat_dtype: jnp.dtype,
    build_repeats: int,
    dp_repeats: int,
    hoist_masks: bool,
):
    """One (ti x ti) tile-pair: per-u MXU Grams -> masked cost -> min-plus
    row scan over `rows` DP rows (the caller bounds rows by the A-tile's
    max length — sorted tiles make that tight) with `scan_steps` banded
    scan depth (min-plus influence is absorbed by +inf outside the live
    band, so depth ceil(log2(2*wv_max+1)) suffices — same argument as the
    square kernel).  All per-pair tensors keep the natural [su, sv, S] shape —
    Mosaic rejects reshapes that merge tiled (sublane x lane) dims, so the
    pair dim is never flattened; scalar la_u and [sv, 1] lb reads broadcast
    against iotas without relayouts."""
    del ti_map_ref, tj_map_ref
    TI = a_ref.shape[0]
    S = a_ref.shape[2]
    # The cost build only materializes the `rows` DP rows the row loop will
    # consume (A-tile lengths never exceed `rows` by contract): rows < S
    # cuts the mask/cost elementwise passes and the cmat scratch footprint
    # proportionally.  R is an OUTER (untiled) dim of g/cmat, so any value
    # is layout-legal; the MXU Gram still computes all S a-rows (its M dim
    # rides the lane axis, where slicing is not free) and the slice drops
    # the dead rows before the elementwise build.
    R = rows
    nv = TI // sv
    n_sub = (TI // su) * nv

    lanes3 = jax.lax.broadcasted_iota(jnp.int32, (su, sv, S), 2)

    def subtile(st, _):
        u0 = (st // nv) * su
        v0 = (st % nv) * sv
        b_sub = b_ref[pl.ds(v0, sv)]                     # [sv, da, S]
        lb_sub = lb_ref[pl.ds(v0, sv)]                   # [sv, 1]

        def build_u(u, _):
            av = a_ref[u0 + u]                           # [da, S]
            la_u = la_ref[u0 + u, 0]
            g = jax.lax.dot_general(
                av, b_sub,
                dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                # HIGHEST (6 bf16 MXU passes) is the bf16-cancellation
                # guard: the full squared distance sqa+sqb-2ab accumulates
                # inside this one dot via the channel augmentation, so the
                # guard covers it all.  gram_precision exists for probes
                # only: Mosaic lowers ONLY HIGHEST and DEFAULT (HIGH raises
                # NotImplementedError), DEFAULT's single pass is off by
                # ~0.16 abs on normalized distances, and the measured gap
                # DEFAULT-vs-HIGHEST is just ~10-15% of the kernel — so a
                # manual hi/lo-bf16 3-pass split would recover ~7% at best
                # and was rejected (BASELINE.md round-3 precision probe).
                precision=gram_precision,
            )                                            # [S, sv, S]
            if R != S:
                g = g[:R]                                # [R, sv, S]
            ii = jax.lax.broadcasted_iota(jnp.int32, (R, sv, S), 0)
            jj = jax.lax.broadcasted_iota(jnp.int32, (R, sv, S), 2)
            if band is None:
                wv = jnp.full((1, sv, 1), jnp.int32(S))
            elif auto_widen:
                wv = jnp.maximum(
                    jnp.int32(band), jnp.abs(la_u - lb_sub)
                )[None]
            else:
                wv = jnp.full((1, sv, 1), jnp.int32(band))
            valid = (
                (ii < la_u)
                & (jj < lb_sub[None])
                & (jnp.abs(jj - ii) <= wv)
            )
            if metric == "cosine":
                cost = 1.0 - g
            else:
                sq = jnp.maximum(g, 0.0)
                cost = jnp.sqrt(sq) if metric == "euclidean" else sq
            cmat_ref[:, pl.ds(u, 1)] = (
                jnp.where(valid, cost, INF).astype(cmat_dtype)[:, None]
            )
            lanes2 = jax.lax.broadcasted_iota(jnp.int32, (sv, S), 1)
            ex_u = jnp.where(lanes2 == lb_sub - 1, la_u - 1, -1)
            ex_ref[pl.ds(u, 1)] = ex_u[None]
            return 0

        # build_repeats/dp_repeats are TIMING PROBES (kernel_tile_diag
        # --build-repeats/--dp-repeats): re-running an idempotent stage N
        # times isolates its cost as the N-slope of program time, the same
        # dp-repeats methodology that produced BASELINE.md's round-3
        # breakdown.  Production always runs 1 (the unperturbed loop).
        if build_repeats == 1:
            jax.lax.fori_loop(0, su, build_u, 0)
        else:
            jax.lax.fori_loop(
                0, su * build_repeats, lambda k, _: build_u(k % su, _), 0
            )

        # square-frame min-plus row scan (the square kernel's recurrence;
        # masking already lives in cmat, so the body has no validity ops)
        ex3 = ex_ref[:]

        # hoist_masks is a TIMING PROBE like build_repeats/dp_repeats: the
        # step masks (lanes3 >= sh) are loop-invariant across rows, so
        # hoisting them trades the per-row iota compares for scan_steps+2
        # live boolean vectors the compiler must keep across the loop
        # (registers or VMEM spills — which is cheaper is an empirical
        # question on this device; see BASELINE.md round-3 probes).
        if hoist_masks:
            m_ge1 = lanes3 >= 1
            m_lane0 = lanes3 == 0
            m_step = [lanes3 >= (1 << t) for t in range(scan_steps)]

        def row_body(i, carry):
            prev, out = carry
            # f32 accumulation regardless of cmat storage dtype (the bf16
            # cmat probe stores costs compactly; the DP carry stays f32)
            c = cmat_ref[i].astype(jnp.float32)          # [su, sv, S]
            prev_shift = jnp.where(
                m_ge1 if hoist_masks else lanes3 >= 1,
                pltpu.roll(prev, 1, axis=2), INF
            )
            e = c + jnp.minimum(prev, prev_shift)
            e = jnp.where(
                (i == 0) & (m_lane0 if hoist_masks else lanes3 == 0), c, e
            )
            ee, cc = e, c
            sh = 1
            for t in range(scan_steps):
                mask = m_step[t] if hoist_masks else lanes3 >= sh
                ee = jnp.where(
                    mask, jnp.minimum(ee, pltpu.roll(ee, sh, axis=2) + cc), ee
                )
                if t < scan_steps - 1:
                    cc = jnp.where(mask, cc + pltpu.roll(cc, sh, axis=2), cc)
                sh *= 2
            out = jnp.where(i == ex3, ee, out)
            return ee, out

        init = (
            jnp.full((su, sv, S), INF),
            jnp.full((su, sv, S), INF),
        )
        if dp_repeats == 1:
            _, outp = jax.lax.fori_loop(0, rows, row_body, init)
        else:
            outp = jax.lax.fori_loop(
                0, dp_repeats,
                lambda r, _: jax.lax.fori_loop(0, rows, row_body, init)[1],
                init[1],
            )
        vb = st % nv
        out_ref[0, pl.ds(u0, su), pl.ds(vb, 1), :] = (
            jnp.min(outp, axis=2)[:, None]
        )
        return 0

    jax.lax.fori_loop(0, n_sub, subtile, 0)


def tile_geometry(
    seq_len: int, feat_dim: int | None = None
) -> tuple[int, int, int] | None:
    """(ti, su, sv) for the tile kernel, or None when the shape is out of
    its range.  The cmat scratch is S*su*sv*S*4 bytes; su*sv shrinks
    with S^2 so it stays ~33-67 MB under the lifted 100 MiB VMEM budget.
    Swept on-chip at S=128: (8,32)/(8,64)/(16,32)/(16,64) -> 1.49/1.54/
    1.54/1.53M pairs/s; (8,64) is the plateau.

    `feat_dim` (the pre-augmentation channel count d) gates the INPUT
    working set: both [ti, d+2, S] sequence tiles live in VMEM alongside
    the scratch, so high-d corpora (raw 513-bin spectrogram features with
    the AE disabled: 67 MB per tile at S=256) overflow the budget that
    latent-width features never approach.  Found on hardware — Mosaic
    OOMs at compile time — so routing passes d and falls back to the
    per-pair kernels when this returns None.  None skips the check (for
    callers that only size the grid)."""
    geom = None
    if seq_len <= 128:
        geom = 128, 8, 64
    elif seq_len <= 256:
        geom = 128, 8, 16
    if geom is None or feat_dim is None:
        return geom
    ti = geom[0]
    S = 128 * -(-seq_len // 128)
    inputs_bytes = 2 * ti * (feat_dim + 2) * S * 4
    cmat_bytes = S * geom[1] * geom[2] * S * 4
    if inputs_bytes + cmat_bytes > 80 * 1024 * 1024:
        return None
    return geom


@partial(
    jax.jit,
    static_argnames=("ti", "su", "sv", "band", "auto_widen", "metric",
                     "rows", "scan_steps", "gram_precision", "cmat_dtype",
                     "build_repeats", "dp_repeats", "hoist_masks",
                     "interpret"),
)
def dtw_tile_pairs(
    feats,        # [K, S, d] f32 padded sequences (device-resident corpus)
    lengths,      # [K] i32 (pad entries: length 1)
    ti_idx,       # [U] i32 tile-row indices (units of ti sequences)
    tj_idx,       # [U] i32 tile-col indices
    *,
    ti: int = 128,
    su: int = 8,
    sv: int = 64,
    band: int | None = None,
    auto_widen: bool = True,
    metric: str = "euclidean",
    rows: int | None = None,
    scan_steps: int | None = None,
    gram_precision: str = "highest",
    cmat_dtype: str = "float32",
    build_repeats: int = 1,
    dp_repeats: int = 1,
    hoist_masks: bool = False,
    interpret: bool = False,
):
    """DTW distances for U sequence tile-pairs -> [U, ti, ti] blocks.

    Block u holds distances between sequences [ti_idx[u]*ti, ...) (rows)
    and [tj_idx[u]*ti, ...) (cols).  UNNORMALIZED — the caller applies
    path-length normalization with its own length vectors.  Self tile-pairs
    compute the full square (host keeps the triangle it needs).

    `rows` bounds the DP row loop (must cover every A-tile length in this
    dispatch); `scan_steps` bounds the banded scan depth (must satisfy
    2^scan_steps >= 2*wv_max+1 over the dispatch).  Violating either is a
    correctness error — the tiled scheduler derives both from sorted-tile
    length ranges.
    """
    import chex

    chex.assert_rank(feats, 3)
    chex.assert_rank([lengths, ti_idx, tj_idx], 1)
    K, S, d = feats.shape
    if K % ti:
        raise ValueError(f"K={K} must be padded to a multiple of ti={ti}")
    f32 = feats.astype(jnp.float32)
    if metric == "cosine":
        f32 = f32 / jnp.maximum(
            jnp.linalg.norm(f32, axis=-1, keepdims=True), 1e-12
        )
        zeros = jnp.zeros((K, 1, S))
        a_aug = jnp.concatenate(
            [jnp.transpose(f32, (0, 2, 1)), zeros, zeros], axis=1
        )
        b_aug = jnp.concatenate(
            [jnp.transpose(f32, (0, 2, 1)), zeros, zeros], axis=1
        )
    else:
        sq = jnp.sum(f32 * f32, axis=2)                  # [K, S]
        ones = jnp.ones((K, 1, S))
        # Full squared distance rides ONE dot: (-2a | 1 | sqa).(b | sqb | 1)
        a_aug = jnp.concatenate(
            [jnp.transpose(-2.0 * f32, (0, 2, 1)), ones, sq[:, None, :]],
            axis=1,
        )                                                # [K, d+2, S]
        b_aug = jnp.concatenate(
            [jnp.transpose(f32, (0, 2, 1)), sq[:, None, :], ones], axis=1
        )
    la2 = lengths.astype(jnp.int32)[:, None]
    da = d + 2
    U = ti_idx.shape[0]
    nv = ti // sv
    if scan_steps is None:
        scan_steps = max(1, (S - 1).bit_length())
    rows = S if rows is None else min(rows, S)

    prec = {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
    }[gram_precision]
    # cmat_dtype="bfloat16" is a PROBE knob like gram_precision: it halves
    # the cost-scratch VMEM footprint and round-trip traffic at ~8 mantissa
    # bits of cost resolution; production stays f32.
    cdt = jnp.dtype(cmat_dtype)
    kernel = partial(
        _dtw_tile_kernel, su=su, sv=sv, band=band, auto_widen=auto_widen,
        metric=metric, scan_steps=scan_steps, rows=rows,
        gram_precision=prec, cmat_dtype=cdt,
        build_repeats=build_repeats, dp_repeats=dp_repeats,
        hoist_masks=hoist_masks,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(U,),
        in_specs=[
            pl.BlockSpec((ti, da, S), lambda u, im, jm: (im[u], 0, 0)),
            pl.BlockSpec((ti, da, S), lambda u, im, jm: (jm[u], 0, 0)),
            pl.BlockSpec((ti, 1), lambda u, im, jm: (im[u], 0)),
            pl.BlockSpec((ti, 1), lambda u, im, jm: (jm[u], 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, ti, nv, sv), lambda u, im, jm: (u, 0, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((rows, su, sv, S), cdt),
            pltpu.VMEM((su, sv, S), jnp.int32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        out_shape=jax.ShapeDtypeStruct((U, ti, nv, sv), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * U * ti * ti * S * S * da,
            bytes_accessed=U * 2 * ti * da * S * 4 + U * ti * ti * 4,
            transcendentals=U * ti * ti * S * S
            if metric == "euclidean" else 0,
        ),
        interpret=interpret,
    )(ti_idx.astype(jnp.int32), tj_idx.astype(jnp.int32),
      a_aug, b_aug, la2, la2)
    return out.reshape(U, ti, ti)


@partial(
    jax.jit,
    static_argnames=(
        "band",
        "auto_widen",
        "metric",
        "normalize",
        "pair_block",
        "max_len_diff",
        "interpret",
    ),
)
def dtw_batch_pallas(
    a: jax.Array,            # [B, S, d] padded, f32
    b: jax.Array,            # [B, S, d]
    len_a: jax.Array,        # [B] int32
    len_b: jax.Array,        # [B]
    *,
    metric: str = "euclidean",
    band: int | None = None,
    auto_widen: bool = True,
    normalize: str = "none",
    pair_block: int | None = None,
    max_len_diff: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in for ops.dtw.dtw_batch on the Pallas fast path.  Returns [B].

    `a` may be padded shorter than `b` ([B, R, d] vs [B, S, d], R <= S):
    the kernel's sequential row loop runs only R steps, so orienting every
    pair shorter-first (DTW is symmetric) cuts the dominant latency.  All
    len_a must be <= R.

    `max_len_diff` is a STATIC host-side bound on max|len_a - len_b| over
    the batch (the pair scheduler computes it per block).  With auto-widen
    banding it bounds the widened band half-width, which sets the banded
    scan depth, the stripe kernel's width/routing, and each pair's
    extraction slot in the stripe frame.  Passing a bound smaller than the
    true max is a correctness error.
    """
    import chex

    chex.assert_rank([a, b], 3)           # SS6.2 static sanitizer tier
    chex.assert_rank([len_a, len_b], 1)
    chex.assert_equal_shape_prefix([a, b, len_a, len_b], 1)
    chex.assert_axis_dimension(b, 2, a.shape[2])
    B, R, d = a.shape
    S = b.shape[1]
    if R > S:
        raise ValueError("pass the shorter sequence first (R <= S)")
    W = stripe_width(S, band, auto_widen, max_len_diff)
    if W is not None and S <= MAX_STRIPE_SEQ_LEN:
        # Band-limited stripe kernel: O(R*W) VMEM and W-wide DP rows — wins
        # whenever the band stripe is meaningfully narrower than the row,
        # and is the only Mosaic path past MAX_KERNEL_SEQ_LEN.
        return _dtw_batch_stripe(
            a, b, len_a, len_b,
            metric=metric, band=band, auto_widen=auto_widen,
            normalize=normalize, pair_block=pair_block,
            max_len_diff=max_len_diff, interpret=interpret,
        )
    if pair_block is None:
        pair_block = default_pair_block(S, d)
    if S > MAX_KERNEL_SEQ_LEN:
        raise ValueError(
            f"padded length {S} > {MAX_KERNEL_SEQ_LEN} and the band-limited "
            "stripe path does not apply (needs a band with a static "
            "max_len_diff bound); use ops.dtw.dtw_batch / dtw_long_batch"
        )
    PB = pair_block
    pad = (-B) % PB
    if pad:
        a = jnp.concatenate([a, jnp.zeros((pad, R, d), a.dtype)])
        b = jnp.concatenate([b, jnp.zeros((pad, S, d), b.dtype)])
        len_a = jnp.concatenate([len_a, jnp.ones((pad,), len_a.dtype)])
        len_b = jnp.concatenate([len_b, jnp.ones((pad,), len_b.dtype)])
    Bp = B + pad

    at = jnp.transpose(a.astype(jnp.float32), (0, 2, 1))   # [B, d, R] time-minor
    bt = jnp.transpose(b.astype(jnp.float32), (0, 2, 1))
    la2 = len_a.astype(jnp.int32)[:, None]
    lb2 = len_b.astype(jnp.int32)[:, None]

    kernel = partial(
        _dtw_rowscan_kernel,
        rows=R,
        seq_len=S,
        band=band,
        auto_widen=auto_widen,
        metric=metric,
    )
    grid = (Bp // PB,)
    # The Mosaic default scoped-VMEM limit is 16 MiB; a v5e core has 128 MiB.
    # Lift it so fat pair blocks (PB >= 128 at S=128) fit: the Gram scratch
    # alone is PB*S*S*4 bytes, and Mosaic additionally accounts input double
    # buffers and layout copies, so a tight per-shape estimate undercounts.
    # The real constraint is physical VMEM; let the compiler budget up to it.
    compiler_params = pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=compiler_params,
        in_specs=[
            pl.BlockSpec((PB, d, R), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, d, S), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((PB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((PB, R, S), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * R * S * d
            + 12 * Bp * R * S * int(np.log2(max(S, 2))),
            bytes_accessed=Bp * (R + S) * d * 4 + Bp * 4,
            transcendentals=Bp * R * S if metric == "euclidean" else 0,
        ),
        interpret=interpret,
    )(at, bt, la2, lb2)

    dist = out[:B, 0]
    if normalize == "path_len":
        dist = dist / (len_a[:B] + len_b[:B]).astype(jnp.float32)
    elif normalize != "none":
        raise ValueError(f"unknown normalize {normalize!r}")
    return dist


# ---------------------------------------------------------------------------
# All-pairs TILE-STRIPE kernel (round 3, long sequences).
#
# Why: past the square tile kernel's range (S > 256) banded pairs ride the
# per-pair stripe kernel, which ships 2*(d+1)*S*4 bytes of GATHERED features
# per pair — ~40 KB at S=512 — through a memory system measured at
# ~9-15 GB/s (BASELINE.md round-3 probes).  At 92k pairs/s the stripe
# kernel's wall is ~80% input DMA.  This kernel applies the square tile
# kernel's fix to the banded long-sequence regime: a (ti x ti)-sequence
# tile-pair program loads its 2*ti sequences once and computes ti*ti banded
# pairs in VMEM (~500 B/pair at S=512), leaving only the DP + panel-skew
# compute — the stripe formulation itself (shifted frame, seam absorption,
# masked-shift scans) is _dtw_stripe_kernel's, proven per-pair.
# ---------------------------------------------------------------------------


def _dtw_tile_stripe_kernel(
    ti_map_ref,  # scalar-prefetch [U] i32 (consumed by index_maps)
    tj_map_ref,  # scalar-prefetch [U] i32
    a_ref,       # [ti, da, S] f32 time-minor, channels (-2a | 1 | sqa)
    b_ref,       # [ti, da, SP] f32 time-minor, (b | sqb | 1), prepadded
    la_ref,      # [ti, 1] i32
    lb_ref,      # [ti, 1] i32
    out_ref,     # [1, ti, nv, sv] f32 (same store layout as the tile kernel)
    cmat_ref,    # scratch [R, su, sv, W] f32 — per-subtile cost STRIPES
    panel_ref,   # scratch [RB, sv, RBW] f32 — one Gram panel (all sv)
    ex_ref,      # scratch [su, sv, W] i32 — extraction row per (pair, slot)
    *,
    su: int,
    sv: int,
    band: int,
    auto_widen: bool,
    metric: str,
    rows: int,
    width: int,
    off: int,
    padl: int,
    scan_steps: int,
    build_repeats: int,
    dp_repeats: int,
    unroll_rows: int,
):
    """One (ti x ti) tile-pair of band-limited DTWs in the stripe frame.

    Stripe slot s of DP row i holds column j = i + s - off (off = wv_max+1
    keeps slot 0 permanently +inf); see _dtw_stripe_kernel for the frame
    algebra.  Contract (the tiled scheduler enforces both): `rows` >= every
    A-tile length in the dispatch, and wv_max >= max(band, |la-lb|) for
    every REAL pair — a pair whose widened band exceeds wv_max has its
    extraction slot outside [0, W) and comes back +inf rather than wrong.

    Build: per a-row u, panels of RB rows — one MXU Gram over the
    [RB, RB+W] column window of ALL sv B-sequences, then the stripe
    kernel's log2(RB)-step variable left-roll (row r by r) turns diagonals
    into stripe rows for the whole [RB, sv, RB+W] panel at once.  Unlike
    the per-pair stripe kernel, BOTH norms ride the Gram as channels
    ((-2a|1|sqa).(b|sqb|1), the square tile kernel's augmentation): a
    lane-sliced sqa row would need a lanes->sublanes relayout that Mosaic
    rejects, and the fused dot needs no post-add at all.
    """
    del ti_map_ref, tj_map_ref
    TI = a_ref.shape[0]
    R = rows
    W = width
    RB = panel_ref.shape[0]
    RBW = panel_ref.shape[2]
    nv = TI // sv
    n_sub = (TI // su) * nv
    n_bits = max(1, (RB - 1).bit_length())

    rloc = jax.lax.broadcasted_iota(jnp.int32, (RB, 1, 1), 0)
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)
    lanes3 = jax.lax.broadcasted_iota(jnp.int32, (su, sv, W), 2)
    lanes2 = jax.lax.broadcasted_iota(jnp.int32, (sv, W), 1)

    def subtile(st, _):
        u0 = (st // nv) * su
        v0 = (st % nv) * sv
        b_sub = b_ref[pl.ds(v0, sv)]                     # [sv, db, SP]
        lb_sub = lb_ref[pl.ds(v0, sv)]                   # [sv, 1]

        def build_u(u, _):
            av = a_ref[u0 + u]                           # [da, S]
            la_u = la_ref[u0 + u, 0]
            if auto_widen:
                wv = jnp.maximum(jnp.int32(band), jnp.abs(la_u - lb_sub))
            else:
                wv = jnp.broadcast_to(jnp.int32(band), lb_sub.shape)
            band_ok = jnp.abs(s_iota - off) <= wv[None, :, :]  # [1, sv, W]

            for i0 in range(0, R, RB):
                rb = min(RB, R - i0)
                # Column window for rows [i0, i0+rb): j in
                # [i0-off, i0+RB-1-off+W-1]; b is prepadded by padl >= off
                # on the left (non-negative static slice start) and by RBW
                # on the right (RBW is RB+W rounded up to a lane-tile
                # multiple — Mosaic rejects rolls on ragged lane dims; the
                # extra columns are real prepad values that the roll never
                # lands in [0, W)).
                c0 = i0 + padl - off
                g = jax.lax.dot_general(
                    av[:, i0 : i0 + rb],                 # [da, rb]
                    b_sub[:, :, c0 : c0 + RBW],          # [sv, da, RBW]
                    dimension_numbers=(((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,  # bf16-cancel guard
                )                                        # [rb, sv, RBW]
                panel_ref[pl.ds(0, rb)] = g
                # Variable left-roll: row r by r (diagonals -> stripe rows);
                # stale rows past rb roll along but are never read.
                for t in range(n_bits):
                    sh = 1 << t
                    rolled = pltpu.roll(panel_ref[:], (RBW - sh) % RBW, axis=2)
                    panel_ref[:] = jnp.where(
                        (rloc & sh) != 0, rolled, panel_ref[:]
                    )
                stripe = panel_ref[pl.ds(0, rb), :, :W]  # [rb, sv, W]

                i_abs = rloc[:rb] + i0                   # [rb, 1, 1]
                j_abs = i_abs + s_iota - off
                valid = (
                    (j_abs >= 0)
                    & (j_abs < lb_sub[None, :, :])
                    & (i_abs < la_u)
                    & band_ok
                )
                if metric == "cosine":
                    cost = 1.0 - stripe
                else:
                    sq = jnp.maximum(stripe, 0.0)
                    cost = jnp.sqrt(sq) if metric == "euclidean" else sq
                cmat_ref[pl.ds(i0, rb), pl.ds(u, 1)] = (
                    jnp.where(valid, cost, INF)[:, None]
                )

            ex_u = jnp.where(lanes2 == (lb_sub - la_u + off), la_u - 1, -1)
            ex_ref[pl.ds(u, 1)] = ex_u[None]
            return 0

        # build_repeats/dp_repeats: the square tile kernel's TIMING PROBES
        # (idempotent stage re-run N times; its cost is the N-slope).
        if build_repeats == 1:
            jax.lax.fori_loop(0, su, build_u, 0)
        else:
            jax.lax.fori_loop(
                0, su * build_repeats, lambda k, _: build_u(k % su, _), 0
            )

        # Stripe DP over [su, sv, W] rows (masked-shift scans; see the NOTE
        # in _dtw_rowscan_kernel for why the masked form is kept).
        ex3 = ex_ref[:]

        def row_step(i, c, prev, out):
            # D[i-1, j] lives at slot s+1 of the previous stripe row.
            up = jnp.where(
                lanes3 < W - 1, pltpu.roll(prev, W - 1, axis=2), INF
            )
            e = c + jnp.minimum(prev, up)
            ee, cc = e, c
            for t in range(scan_steps):
                sh = 1 << t
                m = lanes3 >= sh
                ee = jnp.where(
                    m, jnp.minimum(ee, pltpu.roll(ee, sh, axis=2) + cc), ee
                )
                if t < scan_steps - 1:
                    cc = jnp.where(m, cc + pltpu.roll(cc, sh, axis=2), cc)
            return ee, jnp.where(i == ex3, ee, out)

        # unroll_rows amortizes the fori_loop's fixed per-iteration cost
        # (bounds/branch work + one dynamic-index cmat load per row) over
        # UR rows: one [UR, su, sv, W] block load, UR statically-sliced
        # dependent DP steps.  The recurrence stays strictly sequential —
        # this buys overhead, not parallelism (swept on hardware; see
        # BASELINE.md round-3 tile-stripe table).
        UR = unroll_rows if R % unroll_rows == 0 else 1

        def row_body(i0, carry):
            prev, out = carry
            blk = cmat_ref[pl.ds(i0 * UR, UR)]           # [UR, su, sv, W]
            for k in range(UR):
                prev, out = row_step(i0 * UR + k, blk[k], prev, out)
            return prev, out

        # Virtual D[-1,-1] = 0 sits at slot `off` of virtual row -1, which
        # also covers cell (0, 0) — no i == 0 special case in this frame.
        init = (
            jnp.where(lanes3 == off, 0.0, jnp.full((su, sv, W), INF)),
            jnp.full((su, sv, W), INF),
        )
        if dp_repeats == 1:
            _, outp = jax.lax.fori_loop(0, R // UR, row_body, init)
        else:
            outp = jax.lax.fori_loop(
                0, dp_repeats,
                lambda r, _: jax.lax.fori_loop(0, R // UR, row_body, init)[1],
                init[1],
            )
        vb = st % nv
        out_ref[0, pl.ds(u0, su), pl.ds(vb, 1), :] = (
            jnp.min(outp, axis=2)[:, None]
        )
        return 0

    jax.lax.fori_loop(0, n_sub, subtile, 0)


def tile_stripe_geometry(
    seq_len: int,
    feat_dim: int | None,
    width: int,
    ti: int | None = None,
) -> tuple[int, int, int] | None:
    """(ti, su, sv) for the tile-stripe kernel, or None out of range.

    Sized like tile_geometry but for the stripe scratch [S, su, sv, W]:
    the input working set (two [ti, da, ~S] windows, double-buffered) and
    the cost stripes must fit together under the lifted VMEM budget.  ti
    shrinks with S to keep inputs bounded; sv rides the sublane dim and
    su*sv scales the pairs each DP row op advances.  Only meaningful when
    the stripe is narrower than the row — at W >= S the square tile kernel
    (or per-pair routing) is the right tool, and the per-pair kernels own
    S <= 256 outright (tile_geometry covers it with full-width rows).

    `ti` pins the tile size: the tiled scheduler forms tiles ONCE from the
    widest class's geometry, then sizes each narrower class's (su, sv) at
    that same ti.
    """
    if width is None or width >= seq_len or seq_len > MAX_STRIPE_SEQ_LEN:
        return None
    if seq_len <= 256:
        return None                      # square tile kernel territory
    d = 8 if feat_dim is None else feat_dim
    dap = 8 * -(-(d + 2) // 8)
    S = 128 * -(-seq_len // 128)
    padl = 128 * -(-(width // 2 + 1) // 128)
    RB = min(32, S)                      # dtw_tile_stripe_pairs default
    RBW = 128 * -(-(RB + width) // 128)
    SP = padl + S + RBW
    # Preference order swept on hardware at S=512 (BASELINE.md round-3
    # tile-stripe table): su*sv (the DP row-op batch) dominates — ti=64
    # su*sv=256 beat ti=128 su*sv=128 by 1.35x — so search (su, sv) in
    # descending su*sv OUTER and take the largest fitting ti; at equal
    # su*sv, (16,16) beat (8,32)/(4,32) and larger ti won slightly.
    for su, sv in ((16, 16), (8, 32), (8, 16), (16, 8), (8, 8), (4, 8),
                   (2, 8), (1, 8)):
        for t in (128, 64, 32) if ti is None else (ti,):
            if su > t or sv > t:
                continue
            # two pipeline levels of (a + b) input blocks
            inputs = 2 * t * dap * (S + SP) * 4
            if inputs > 56 * 1024 * 1024:
                continue
            cmat = S * su * sv * width * 4
            panel = RB * sv * RBW * 4
            # 96 MiB against the 100 MiB Mosaic limit: the margin covers
            # ex_ref + compiler temporaries; the (64,16,16)@S=512 winner
            # (95.1 MB by this accounting) ran on hardware under it.
            if inputs + cmat + panel <= 96 * 1024 * 1024:
                return t, su, sv
    return None


@partial(
    jax.jit,
    static_argnames=("ti", "su", "sv", "band", "auto_widen", "metric",
                     "rows", "wv_max", "panel_rows", "build_repeats",
                     "dp_repeats", "unroll_rows", "interpret"),
)
def dtw_tile_stripe_pairs(
    feats,        # [K, S, d] f32 padded sequences (device-resident corpus)
    lengths,      # [K] i32 (pad entries: length 1)
    ti_idx,       # [U] i32 tile-row indices (units of ti sequences)
    tj_idx,       # [U] i32 tile-col indices
    *,
    ti: int,
    su: int,
    sv: int,
    band: int,
    wv_max: int,
    auto_widen: bool = True,
    metric: str = "euclidean",
    rows: int | None = None,
    panel_rows: int = 32,
    build_repeats: int = 1,
    dp_repeats: int = 1,
    unroll_rows: int = 4,
    interpret: bool = False,
):
    """Banded DTW distances for U tile-pairs -> [U, ti, ti] blocks.

    The long-sequence (S > 256) counterpart of dtw_tile_pairs: same block
    layout, same scalar-prefetch corpus indexing, same UNNORMALIZED output
    contract — but cost and DP live in the O(R*W) stripe frame, so banded
    pairs stay on a Mosaic fast path to MAX_STRIPE_SEQ_LEN with tile-level
    input reuse.  `wv_max` is the STATIC bound on max(band, |la-lb|) over
    the dispatch's real pairs (the tiled scheduler derives it from sorted-
    tile length ranges); it sets the stripe width, the shift `off`, the
    banded scan depth, and each pair's extraction slot.  A bound below a
    pair's true widened half-width yields +inf for that pair (out-of-frame
    extraction), never a silently-truncated distance.
    """
    import chex

    chex.assert_rank(feats, 3)
    chex.assert_rank([lengths, ti_idx, tj_idx], 1)
    K, S, d = feats.shape
    if K % ti:
        raise ValueError(f"K={K} must be padded to a multiple of ti={ti}")
    if band is None:
        raise ValueError("tile-stripe kernel requires a band")
    wv_max = max(int(band), int(wv_max))
    off = wv_max + 1
    W = 128 * -(-(2 * wv_max + 2) // 128)
    # Panel rows: the variable-roll skew moves n_bits(RB) * (RB+W) lanes
    # per W useful stripe lanes, so SMALL panels cut the build's dominant
    # roll traffic superlinearly (RB=128: 7*(RB+W)/W = 21 rolled lanes per
    # stripe lane; RB=32: 5*160/128 = 6.3) at the cost of more, smaller
    # MXU dots.  Swept on hardware (tools/kernel_tile_diag.py --stripe).
    RB = min(panel_rows, S)
    RBW = 128 * -(-(RB + W) // 128)
    padl = 128 * -(-off // 128)
    padr = RBW
    SP = padl + S + padr
    scan_steps = int(max(1, (2 * wv_max).bit_length()))
    rows = S if rows is None else min(rows, S)

    f32 = feats.astype(jnp.float32)
    if metric == "cosine":
        f32 = f32 / jnp.maximum(
            jnp.linalg.norm(f32, axis=-1, keepdims=True), 1e-12
        )
        a_aug = jnp.transpose(f32, (0, 2, 1))            # [K, d, S]
        b_aug = a_aug
    else:
        sqa = jnp.sum(f32 * f32, axis=2)                 # [K, S]
        # Full squared distance in ONE dot (the square tile kernel's
        # augmentation): (-2a | 1 | sqa) . (b | sqb | 1) = sqa+sqb-2ab.
        ones = jnp.ones((K, 1, S))
        a_aug = jnp.concatenate(
            [jnp.transpose(-2.0 * f32, (0, 2, 1)), ones, sqa[:, None, :]],
            axis=1,
        )                                                # [K, d+2, S]
        b_aug = jnp.concatenate(
            [jnp.transpose(f32, (0, 2, 1)), sqa[:, None, :], ones], axis=1
        )
    b_aug = jnp.pad(b_aug, ((0, 0), (0, 0), (padl, padr)))
    da = a_aug.shape[1]
    la2 = lengths.astype(jnp.int32)[:, None]
    U = ti_idx.shape[0]
    nv = ti // sv

    kernel = partial(
        _dtw_tile_stripe_kernel, su=su, sv=sv, band=int(band),
        auto_widen=auto_widen, metric=metric, rows=rows, width=W,
        off=off, padl=padl, scan_steps=scan_steps,
        build_repeats=build_repeats, dp_repeats=dp_repeats,
        unroll_rows=unroll_rows,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(U,),
        in_specs=[
            pl.BlockSpec((ti, da, S), lambda u, im, jm: (im[u], 0, 0)),
            pl.BlockSpec((ti, da, SP), lambda u, im, jm: (jm[u], 0, 0)),
            pl.BlockSpec((ti, 1), lambda u, im, jm: (im[u], 0)),
            pl.BlockSpec((ti, 1), lambda u, im, jm: (jm[u], 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, ti, nv, sv), lambda u, im, jm: (u, 0, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((rows, su, sv, W), jnp.float32),
            pltpu.VMEM((RB, sv, RBW), jnp.float32),
            pltpu.VMEM((su, sv, W), jnp.int32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        out_shape=jax.ShapeDtypeStruct((U, ti, nv, sv), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * U * ti * ti * rows * (RB + W) * da // RB
            + 10 * U * ti * ti * rows * W * scan_steps // (su * sv),
            bytes_accessed=U * ti * da * (S + SP) * 4 + U * ti * ti * 4,
            transcendentals=U * ti * ti * rows * W
            if metric == "euclidean" else 0,
        ),
        interpret=interpret,
    )(ti_idx.astype(jnp.int32), tj_idx.astype(jnp.int32),
      a_aug, b_aug, la2, la2)
    return out.reshape(U, ti, ti)


# ---------------------------------------------------------------------------
# All-pairs LANE-PACKED tile kernel (round 3): pairs on LANES, stripe on
# SUBLANES.
#
# Why: the tile-stripe kernel above is fully compute-bound (BASELINE.md
# round-3 repeat-slope probes: build 38% + DP 61%), and its stripe rides
# the 128-lane minimum while only 2*wv+1 <= 33 lanes are live at band=16 —
# ~4x of every DP vector op is wasted, with su*sv pairs on sublanes.  This
# kernel FLIPS the layout: each [W_s, ti] row op advances ti pairs (one
# A-row against the whole B tile, pairs on lanes) with the stripe on
# sublanes at its natural 8-granular width (W_s = 8-mult >= 2*wv+2, e.g.
# 40 instead of 128).  Elements per pair-row drop 128 -> ~40-57 and the
# Gram/skew machinery disappears: costs are built per DP row as d+1
# scalar-vector FMAs (the A-row lives in SMEM, so a[c, i] is a native
# scalar read; B is VMEM-resident in time-on-sublanes layout), which also
# keeps the build in plain f32 VPU FMAs — no MXU pass, so no bf16
# multi-pass precision knob needed (the channel-trick |a|^2+|b|^2-2ab
# cancellation residue near zero remains, as in every tile kernel).
# VMEM drops from ~95 MB (cmat) to ~6 MB (one B tile + carries).
# ---------------------------------------------------------------------------


def lane_geometry(
    seq_len: int,
    feat_dim: int | None,
    width: int | None,
) -> int | None:
    """Tile size (always 128: the lane dim) for the lane-packed kernel, or
    None when the shape is out of range.  `width` is the 8-granular stripe
    sublane width W_s covering the job's WIDEST class.  Bounds:

    * the B tile [d+1, SPs, 128] must leave room for double-buffering
      under the 100 MiB Mosaic budget;
    * the per-row A block [1, d+1, S] lives in SMEM — 280 KB measured
      working on the v5e at S=4096, d=16 (tools/kernel_tile_diag.py
      --lane --seqlen 4096); the 320 KB cap keeps a margin below that
      hardware-verified point rather than guessing at the true limit.

    Unlike the stripe kernel there is no narrower-than-row requirement:
    the frame algebra holds for any W_s, and the kernel beats the square
    tile kernel even at S=128 (BASELINE.md round-3 lane table).
    """
    if width is None or seq_len > MAX_STRIPE_SEQ_LEN:
        return None
    d = 8 if feat_dim is None else feat_dim
    S = 128 * -(-seq_len // 128)
    if (d + 1) * S * 4 > 320 * 1024:
        return None
    off_max = width // 2
    padl = 8 * -(-off_max // 8)
    SPs = padl + S + width
    if 2 * (d + 1) * SPs * 128 * 4 > 80 * 1024 * 1024:
        return None
    return 128


def _dtw_lane_kernel(
    ti_map_ref,  # scalar-prefetch [U] i32
    tj_map_ref,  # scalar-prefetch [U] i32
    lens_ref,    # scalar-prefetch [K] i32 (whole corpus lengths, SMEM)
    a_ref,       # SMEM [1, d+1, S] f32: channels (-2a | sqa), time-minor
    b_ref,       # VMEM [1, d+1, SPs, ti] f32: (b | sqb), TIME ON SUBLANES
    lb_ref,      # VMEM [1, 8, ti] i32 (lengths 8-replicated on sublanes)
    out_ref,     # [1, 1, 8, ti] f32 (8-replicated sublane dim, see wrapper)
    *,
    d: int,
    band: int,
    auto_widen: bool,
    metric: str,
    rows: int,
    width: int,       # W_s, 8-multiple
    off: int,
    padl: int,
    scan_steps: int,
    unroll_rows: int,
):
    """One A-row x ti banded DTWs; stripe slot s of DP row i holds column
    j = i + s - off (the tile-stripe frame, transposed onto sublanes).

    Contracts are the tile-stripe kernel's: `rows` >= this A-row's length,
    wv_max >= max(band, |la-lb|) per real pair, out-of-frame pairs come
    back +inf (extraction slot outside [0, W_s)).  The min-plus scan's
    masked-shift steps and seam algebra are unchanged — only the axis
    moved (rolls on axis 0 = sublanes, masks on a sublane iota).
    """
    W = width
    TI = b_ref.shape[3]
    la = lens_ref[ti_map_ref[pl.program_id(0)] * TI + pl.program_id(1)]
    del tj_map_ref
    lb = lb_ref[0, 0:1, :]                               # [1, TI]

    sub = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
    if auto_widen:
        wv = jnp.maximum(jnp.int32(band), jnp.abs(la - lb))
    else:
        wv = jnp.broadcast_to(jnp.int32(band), lb.shape)
    band_ok = jnp.abs(sub - off) <= wv                   # [W, TI]
    ex = (sub == (lb - la + off)) & band_ok              # [W, TI]

    def build_row(i):
        base = i + padl - off
        acc = b_ref[0, d, pl.ds(base, W), :]             # sqb  [W, TI]
        acc = acc + a_ref[0, d, i]                       # + sqa (scalar)
        for c in range(d):                               # + -2a.b
            acc = acc + a_ref[0, c, i] * b_ref[0, c, pl.ds(base, W), :]
        j = i + sub - off
        valid = (j >= 0) & (j < lb) & (i < la) & band_ok
        if metric == "cosine":
            cost = 1.0 - acc
        else:
            sq = jnp.maximum(acc, 0.0)
            cost = jnp.sqrt(sq) if metric == "euclidean" else sq
        return jnp.where(valid, cost, INF)

    def row_step(i, c, prev, out):
        # D[i-1, j] sits at slot s+1 of the previous stripe row.
        up = jnp.where(sub < W - 1, pltpu.roll(prev, W - 1, axis=0), INF)
        e = c + jnp.minimum(prev, up)
        ee, cc = e, c
        for t in range(scan_steps):
            sh = 1 << t
            m = sub >= sh
            ee = jnp.where(
                m, jnp.minimum(ee, pltpu.roll(ee, sh, axis=0) + cc), ee
            )
            if t < scan_steps - 1:
                cc = jnp.where(m, cc + pltpu.roll(cc, sh, axis=0), cc)
        return ee, jnp.where((i == la - 1) & ex, ee, out)

    UR = unroll_rows
    while UR > 1 and rows % UR:
        UR //= 2

    def row_body(i0, carry):
        prev, out = carry
        for k in range(UR):
            i = i0 * UR + k
            prev, out = row_step(i, build_row(i), prev, out)
        return prev, out

    init = (
        jnp.where(
            jnp.broadcast_to(sub, (W, TI)) == off,
            0.0,
            jnp.full((W, TI), INF),
        ),
        jnp.full((W, TI), INF),
    )
    _, out_acc = jax.lax.fori_loop(0, rows // UR, row_body, init)
    out_ref[0, 0, :, :] = jnp.broadcast_to(
        jnp.min(out_acc, axis=0, keepdims=True), (8, TI)
    )


@partial(
    jax.jit,
    static_argnames=("ti", "band", "auto_widen", "metric", "rows",
                     "wv_max", "unroll_rows", "interpret"),
)
def dtw_tile_lane_pairs(
    feats,        # [K, S, d] f32 padded sequences (device-resident corpus)
    lengths,      # [K] i32 (pad entries: length 1)
    ti_idx,       # [U] i32 tile-row indices
    tj_idx,       # [U] i32 tile-col indices
    *,
    ti: int,
    band: int,
    wv_max: int,
    auto_widen: bool = True,
    metric: str = "euclidean",
    rows: int | None = None,
    unroll_rows: int = 8,
    interpret: bool = False,
):
    """Banded DTW distances for U tile-pairs -> [U, ti, ti] blocks, with
    pairs packed on LANES (grid (U, ti): one program per A-row, ti pairs
    per vector row op) and the stripe on SUBLANES at W_s = 8-mult >=
    2*wv_max+2.  Same output contract as dtw_tile_stripe_pairs; the cost
    build is plain f32 VPU FMAs (no MXU precision knob; the channel-trick
    cancellation residue near zero remains).  On hardware `ti` must be a
    multiple of 128
    (the lane dim of the flipped B tile); tests use small ti in interpret
    mode.
    """
    import chex

    chex.assert_rank(feats, 3)
    chex.assert_rank([lengths, ti_idx, tj_idx], 1)
    K, S, d = feats.shape
    if K % ti:
        raise ValueError(f"K={K} must be padded to a multiple of ti={ti}")
    if band is None:
        raise ValueError("lane kernel requires a band")
    wv_max = max(int(band), int(wv_max))
    off = wv_max + 1
    W = 8 * -(-(2 * wv_max + 2) // 8)
    padl = 8 * -(-off // 8)
    SPs = padl + S + W
    scan_steps = int(max(1, (2 * wv_max).bit_length()))
    rows = S if rows is None else min(rows, S)

    f32 = feats.astype(jnp.float32)
    if metric == "cosine":
        f32 = f32 / jnp.maximum(
            jnp.linalg.norm(f32, axis=-1, keepdims=True), 1e-12
        )
        a_ch = jnp.transpose(f32, (0, 2, 1))             # [K, d, S]
        sq_a = jnp.zeros((K, 1, S))
        b_ch, sq_b = a_ch, jnp.zeros((K, 1, S))
    else:
        sq = jnp.sum(f32 * f32, axis=2)[:, None, :]      # [K, 1, S]
        a_ch = jnp.transpose(-2.0 * f32, (0, 2, 1))
        sq_a = sq
        b_ch = jnp.transpose(f32, (0, 2, 1))
        sq_b = sq
    a_aug = jnp.concatenate([a_ch, sq_a], axis=1)        # [K, d+1, S]
    nT = K // ti
    # B tile: time on SUBLANES, pair index on LANES.
    b_aug = jnp.concatenate([b_ch, sq_b], axis=1)        # [K, d+1, S]
    b_aug = jnp.pad(b_aug, ((0, 0), (0, 0), (padl, W)))  # [K, d+1, SPs]
    b_flip = jnp.transpose(
        b_aug.reshape(nT, ti, d + 1, SPs), (0, 2, 3, 1)
    )                                                    # [nT, d+1, SPs, ti]
    # 8-replicated sublane dim: Mosaic requires block sublane dims to be
    # 8-divisible (a (1, ti) block of [nT, ti] is rejected).
    lb_t = jnp.broadcast_to(
        lengths.astype(jnp.int32).reshape(nT, 1, ti), (nT, 8, ti)
    )
    U = ti_idx.shape[0]

    kernel = partial(
        _dtw_lane_kernel, d=d, band=int(band), auto_widen=auto_widen,
        metric=metric, rows=rows, width=W, off=off, padl=padl,
        scan_steps=scan_steps, unroll_rows=unroll_rows,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(U, ti),
        in_specs=[
            pl.BlockSpec(
                (1, d + 1, S),
                lambda u, r, im, jm, lp: (im[u] * ti + r, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, d + 1, SPs, ti),
                lambda u, r, im, jm, lp: (jm[u], 0, 0, 0),
            ),
            pl.BlockSpec(
                (1, 8, ti), lambda u, r, im, jm, lp: (jm[u], 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 8, ti), lambda u, r, im, jm, lp: (u, r, 0, 0)
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        out_shape=jax.ShapeDtypeStruct((U, ti, 8, ti), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=3 * U * ti * ti * rows * W * (d + scan_steps),
            bytes_accessed=U * (d + 1) * (S + SPs * ti) * 4 + U * ti * ti * 4,
            transcendentals=U * ti * rows * W * ti
            if metric == "euclidean" else 0,
        ),
        interpret=interpret,
    )(ti_idx.astype(jnp.int32), tj_idx.astype(jnp.int32),
      lengths.astype(jnp.int32), a_aug, b_flip, lb_t)
    return out[:, :, 0, :]


# ---------------------------------------------------------------------------
# DIAG-corridor lane kernel (round 4): the scaled Sakoe-Chiba band.
#
# Why: under the "widen" semantic a pair with length difference dd needs a
# stripe of 2*max(band,dd)+2 sublanes, so the bench corpus's length spread
# put ~73% of modeled device time into wv=39/71 classes (BASELINE.md round-4
# ledger).  The "diag" semantic (oracle/dtw.py module docstring) replaces
# the widened band with the classical corridor around the corner-to-corner
# diagonal,
#
#     valid(i, j)  iff  |j*(la-1) - i*(lb-1)| <= max(band,1)*max(la-1, lb-1),
#
# whose per-row live width is O(band * max(1, lb/la)) — independent of
# |la-lb|.  The kernel keeps the lane-packed layout (pairs on lanes, stripe
# on sublanes) and SHEARS the stripe frame along a shared per-program center
# line c(i) = round(i * (lbm-1)/(la-1)), where lbm is a host-provided
# representative length of the B tile: slot s of DP row i holds column
# j = c(i) + s - off.  Per-pair divergence from the shared center is bounded
# by the B tile's length spread (the A length is exact per program), which
# the class function folds into the static stripe width.
#
# Frame algebra vs the straight lane kernel: between rows the center
# advances by k_i = c(i) - c(i-1) in {0..kmax}, so the carry realignment is
# up[s] = prev[s+k] instead of prev[s+1]; diag follows as one more +1 shift
# of up.  k is a traced scalar, selected over the class-static kmax with
# masked rolls (the Mosaic-friendly idiom).  Everything else — the min-plus
# row scan, seam absorption, the d+1 scalar-vector FMA cost build — is the
# lane kernel's, unchanged.
# ---------------------------------------------------------------------------


def _dtw_lane_diag_kernel(
    ti_map_ref,  # scalar-prefetch [U] i32
    tj_map_ref,  # scalar-prefetch [U] i32
    lens_ref,    # scalar-prefetch [K] i32 (whole corpus lengths, SMEM)
    lbm_ref,     # scalar-prefetch [nT] i32 (per-tile representative length)
    a_ref,       # SMEM [stack, d+1, S] f32: channels (-2a | sqa), time-minor
    b_ref,       # VMEM [1, d+1, SPs, ti] f32: (b | sqb), TIME ON SUBLANES
    lb_ref,      # VMEM [1, 8, ti] i32 (lengths 8-replicated on sublanes)
    out_ref,     # [1, 1, 8*stack, ti] f32 (8-replicated per half, see wrapper)
    *,
    d: int,
    band: int,
    metric: str,
    rows: int,
    width: int,       # W_s, 8-multiple (class-static)
    off: int,
    padl: int,
    scan_steps: int,
    kmax: int,        # class-static bound on the per-row center step
    unroll_rows: int,
    dyn_roll: bool,
    stack: int,
    a_ti: int,
    aligned_loads: bool,
    ww_ext: int,
):
    """`stack` A-rows x TI diag-corridor DTWs (TI = the B lane width =
    `bgroup` B tiles of `a_ti` sequences each, lane-concatenated).
    Contracts: `rows` >= every stacked A-row's length; the class width/kmax
    statically cover every REAL pair's corridor (wv >= band*max(1,slope) +
    |lb - lbm| + rounding, kmax >= ceil(slope)); out-of-frame pairs come
    back +inf (extraction slot outside [0, W_s)).

    Stacking: the round-4 W-slope probe measured the narrow-corridor shape
    LATENCY-bound — the per-row serial dependency chain (rolls -> min ->
    scan), not element throughput, dominates (4x the stripe width cost
    only 2.37x).  `stack` independent A-sequences therefore share one
    program (and one B tile), their per-row stages traced INTERLEAVED so
    the VPU pipeline fills with ops from the other chains while one
    chain's dependency stalls.  All per-half f32 op sequences are
    identical to stack=1, so results are bitwise-stable in `stack`
    (proven: tests/test_dtw_diag.py stack parity tests; measured verdict:
    BASELINE.md round-5 stacking entry — interleaving does NOT pay: the
    per-row ops are ISSUE-bound, not stall-bound.  The lever that does
    attack issue-boundedness is `bgroup` lane WIDENING, which keeps the op
    count fixed while making every op wider; see dtw_tile_lane_diag_pairs)."""
    W = width
    TI = b_ref.shape[3]
    HS = list(range(stack))
    base_row = (
        ti_map_ref[pl.program_id(0)] * a_ti + pl.program_id(1) * stack
    )
    la = [lens_ref[base_row + h] for h in HS]
    numm = lbm_ref[tj_map_ref[pl.program_id(0)]] - 1    # scalar i32 >= 0
    den_t = [la[h] - 1 for h in HS]                     # true; 0 when la == 1
    den = [jnp.maximum(den_t[h], 1) for h in HS]        # center division
    half = [den[h] // 2 for h in HS]
    lb = lb_ref[0, 0:1, :]                              # [1, TI]
    num = lb - 1                                        # [1, TI]
    r = int(max(int(band), 1))
    thresh = [r * jnp.maximum(den_t[h], num) for h in HS]   # [1, TI]

    sub = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
    # Corner slot: c(la-1) = numm exactly, so s* = (lb-1) - numm + off.
    ex = sub == (lb - 1 - numm + off)                   # [W, TI], shared

    def center(i, h):
        # round(i * numm / den) as floor((i*numm + den//2)/den); clamped to
        # numm so dead rows (i >= la in a taller class) keep the dynamic
        # B slice in range and k at 0.
        return jnp.minimum((i * numm + half[h]) // den[h], numm)

    def build_rows(i, csh, wins=None, cb=None):
        # One DP row's masked cost per half, d-loop interleaved across
        # halves (independent load/FMA chains).  With `wins` (hoisted
        # block windows, round 5): the d+1 dynamic-offset VMEM loads per
        # row collapse to one load set per UR-row block, at the price of
        # ww_ext-wider FMAs and one realign roll per row.  The block
        # window anchors at the block-start center cb; each row's frame
        # is the same values shifted by csh - cb in [0, (UR-1)*kmax], so
        # one traced roll + static truncate realigns — per-slot f32 ops
        # and values are IDENTICAL to the per-row-load path (bitwise
        # parity: tests/test_dtw_diag.py::test_lane_diag_hoist_bitwise_
        # parity).  Measured verdict (BASELINE.md round-5 op-geometry
        # entry): NO win at the bench shape — dynamic-offset loads are
        # not the bottleneck either — so hoist_build defaults OFF; the
        # path stays as a tested lever for wider-W shapes.
        base = [csh[h] + padl - off for h in HS]
        if wins is not None:
            WW = W + ww_ext
            acc = [wins[h][d] + a_ref[h, d, i] for h in HS]
            for c in range(d):
                acc = [
                    acc[h] + a_ref[h, c, i] * wins[h][c] for h in HS
                ]
            sh = [csh[h] - cb[h] for h in HS]
            acc = [
                pltpu.roll(acc[h], (WW - sh[h]) % WW, axis=0)[:W]
                for h in HS
            ]
            # Drift beyond the hoist budget means the block window does
            # not contain this row's frame (an understated kmax: legal
            # for the carry realignment under dyn_roll, not for
            # hoisting).  Poison the row to +inf — the same LOUD
            # out-of-contract surface as the wv bound — instead of
            # returning silently wrong costs.
            acc = [
                jnp.where(sh[h] <= ww_ext, acc[h], INF) for h in HS
            ]
        elif aligned_loads:
            # Lane widths > 128 (bgroup > 1): Mosaic's multi-vreg-column
            # vector.load requires a PROVABLY 8-aligned dynamic sublane
            # offset.  Load W+8 sublanes from the 8-floor of base,
            # accumulate wide, then ONE traced roll per row realigns to
            # the canonical frame — per-element f32 values are identical
            # to the unaligned path (the wrapper pads B by 8 extra
            # sublanes so the wide window stays in range).
            base8 = [(base[h] // 8) * 8 for h in HS]
            dlt = [base[h] - base8[h] for h in HS]
            WW = W + 8
            acc = [b_ref[0, d, pl.ds(base8[h], WW), :] for h in HS]
            acc = [acc[h] + a_ref[h, d, i] for h in HS]
            for c in range(d):
                acc = [
                    acc[h]
                    + a_ref[h, c, i] * b_ref[0, c, pl.ds(base8[h], WW), :]
                    for h in HS
                ]
            acc = [
                pltpu.roll(acc[h], WW - dlt[h], axis=0)[:W] for h in HS
            ]
        else:
            acc = [b_ref[0, d, pl.ds(base[h], W), :] for h in HS]  # [W, TI]
            acc = [acc[h] + a_ref[h, d, i] for h in HS]            # + sqa
            for c in range(d):                                     # + -2a.b
                acc = [
                    acc[h]
                    + a_ref[h, c, i] * b_ref[0, c, pl.ds(base[h], W), :]
                    for h in HS
                ]
        j = [csh[h] + sub - off for h in HS]                    # [W, 1]
        # Exact-int corridor predicate: |j*den_t - i*num| <= r*max(den_t,num).
        # i32 products stay < 2^25 at S=4096 (j <= S+W, i < S).
        corr = [
            jnp.abs(j[h] * den_t[h] - i * num) <= thresh[h] for h in HS
        ]                                                       # [W, TI]
        valid = [
            (j[h] >= 0) & (j[h] < lb) & (i < la[h]) & corr[h] for h in HS
        ]
        if metric == "cosine":
            cost = [1.0 - acc[h] for h in HS]
        else:
            sq = [jnp.maximum(acc[h], 0.0) for h in HS]
            cost = (
                [jnp.sqrt(sq[h]) for h in HS]
                if metric == "euclidean" else sq
            )
        return [jnp.where(valid[h], cost[h], INF) for h in HS]

    def row_steps(i, k, c, prev, out):
        # Carry realignment for a center step of k: up[s] = prev[s+k]
        # (k == 1 reduces to the straight lane kernel's frame).
        if dyn_roll:
            # Mosaic lowers a TRACED roll shift on the sublane axis
            # (hardware-verified round 4); one roll replaces the kmax+1
            # masked-roll select chain.  Shift (W - k) % W realigns by -k;
            # the mask absorbs the wrap (and any out-of-range k from pad
            # programs, whose rows are never extracted).
            up = [pltpu.roll(prev[h], (W - k[h]) % W, axis=0) for h in HS]
            up = [jnp.where(sub < W - k[h], up[h], INF) for h in HS]
        else:
            up = []
            for h in HS:
                u = jnp.full_like(prev[h], INF)
                for t in range(kmax + 1):
                    if t == 0:
                        cand = prev[h]
                    else:
                        cand = jnp.where(
                            sub < W - t,
                            pltpu.roll(prev[h], W - t, axis=0),
                            INF,
                        )
                    u = jnp.where(k[h] == t, cand, u)
                up.append(u)
        # diag[s] = prev[s+k-1] = up[s-1].
        diag = [
            jnp.where(sub >= 1, pltpu.roll(up[h], 1, axis=0), INF)
            for h in HS
        ]
        e = [c[h] + jnp.minimum(diag[h], up[h]) for h in HS]
        ee, cc = list(e), list(c)
        for t in range(scan_steps):
            sh = 1 << t
            m = sub >= sh
            rolled = [pltpu.roll(ee[h], sh, axis=0) for h in HS]
            ee = [
                jnp.where(m, jnp.minimum(ee[h], rolled[h] + cc[h]), ee[h])
                for h in HS
            ]
            if t < scan_steps - 1:
                crolled = [pltpu.roll(cc[h], sh, axis=0) for h in HS]
                cc = [jnp.where(m, cc[h] + crolled[h], cc[h]) for h in HS]
        out = [
            jnp.where((i == la[h] - 1) & ex, ee[h], out[h]) for h in HS
        ]
        return ee, out

    UR = unroll_rows
    while UR > 1 and rows % UR:
        UR //= 2

    def row_body(i0, carry):
        prev, out, csh_prev = (list(x) for x in carry)
        wins = cb = None
        if ww_ext > 0:
            # Hoisted block windows: one dynamic-offset load set per UR
            # rows, anchored at the block's first-row center (centers are
            # nondecreasing in i, so in-block shifts stay in
            # [0, (UR-1)*kmax] <= ww_ext by the class kmax contract).
            cb = [center(i0 * UR, h) for h in HS]
            wins = [
                [
                    b_ref[0, c, pl.ds(cb[h] + padl - off, W + ww_ext), :]
                    for c in range(d + 1)
                ]
                for h in HS
            ]
        for kk in range(UR):
            i = i0 * UR + kk
            csh = [center(i, h) for h in HS]
            k = [csh[h] - csh_prev[h] for h in HS]
            prev, out = row_steps(
                i, k, build_rows(i, csh, wins, cb), prev, out
            )
            csh_prev = csh
        return tuple(prev), tuple(out), tuple(csh_prev)

    init_prev = jnp.where(
        jnp.broadcast_to(sub, (W, TI)) == off,
        0.0,
        jnp.full((W, TI), INF),
    )
    init = (
        tuple(init_prev for _ in HS),
        tuple(jnp.full((W, TI), INF) for _ in HS),
        # Virtual row -1 center: c(-1) = -1 puts D[-1,-1] = 0 at slot off
        # and makes k_0 = center(0) + 1 = 1, the straight frame's first step.
        tuple(jnp.int32(-1) for _ in HS),
    )
    _, out_acc, _ = jax.lax.fori_loop(0, rows // UR, row_body, init)
    for h in HS:
        out_ref[0, 0, 8 * h : 8 * h + 8, :] = jnp.broadcast_to(
            jnp.min(out_acc[h], axis=0, keepdims=True), (8, TI)
        )


@partial(
    jax.jit,
    static_argnames=("ti", "band", "metric", "rows", "wv_max", "kmax",
                     "unroll_rows", "interpret", "dyn_roll", "stack",
                     "bgroup", "hoist_build"),
)
def dtw_tile_lane_diag_pairs(
    feats,        # [K, S, d] f32 padded sequences (device-resident corpus)
    lengths,      # [K] i32 (pad entries: length 1)
    tile_rep,     # [nT] i32 representative B length per tile (pad tiles: 1)
    ti_idx,       # [U] i32 tile-row indices
    tj_idx,       # [U] i32 tile-col indices
    *,
    ti: int,
    band: int,
    wv_max: int,
    kmax: int = 1,
    metric: str = "euclidean",
    rows: int | None = None,
    unroll_rows: int = 8,
    interpret: bool = False,
    dyn_roll: bool = True,
    stack: int = 1,
    bgroup: int = 1,
    hoist_build: bool = False,
):
    """Diag-corridor DTW distances for U tile-pairs -> [U, ti, ti] blocks
    (band_mode="diag" semantics; oracle/dtw.py).  Layout and output contract
    are dtw_tile_lane_pairs'; `wv_max` bounds the per-class stripe
    half-width (band*max(1,slope) + B-tile length spread + rounding), a
    STATIC class contract computed by the pair scheduler — bounds below a
    real pair's requirement surface as +inf (out-of-frame), never truncated
    distances, exactly like the straight lane kernel's wv contract.
    `kmax` (the static per-row center-step bound, ceil(slope)) matters only
    under dyn_roll=False, where the carry realignment is a kmax-deep select
    chain; the default dynamic-shift roll needs no bound (measured +9% on
    the v5e and exact on both backends).  `stack` packs that many
    CONSECUTIVE A-rows (sorted => near-equal lengths) into one program as
    independent interleaved DP chains — the latency-bound lever for the
    narrow-corridor shape (measured verdict: BASELINE.md round-5 stacking
    entry); results are bitwise-stable in `stack` (tests/test_dtw_diag.py
    stack parity)."""
    import chex

    chex.assert_rank(feats, 3)
    chex.assert_rank([lengths, tile_rep, ti_idx, tj_idx], 1)
    K, S, d = feats.shape
    if K % ti:
        raise ValueError(f"K={K} must be padded to a multiple of ti={ti}")
    if band is None:
        raise ValueError("lane kernel requires a band")
    stack = int(stack)
    if stack < 1 or ti % stack:
        raise ValueError(f"stack={stack} must divide ti={ti}")
    bgroup = int(bgroup)
    if bgroup < 1 or (K // ti) % bgroup:
        raise ValueError(
            f"bgroup={bgroup} must divide the tile count {K // ti}"
        )
    wv_max = max(int(band), int(wv_max))
    off = wv_max + 1
    W = 8 * -(-(2 * wv_max + 2) // 8)
    padl = 8 * -(-off // 8)
    scan_steps = int(max(1, (2 * wv_max).bit_length()))
    rows = S if rows is None else min(rows, S)
    kmax = int(max(1, kmax))
    # Hoisted block-window build (round 5): one dynamic-offset load set
    # per UR-row block instead of per row; the block window is ww_ext
    # sublanes wider than W to cover the in-block center drift
    # ((UR-1)*kmax).  Mirror the kernel's UR divisibility adjustment so
    # ww_ext matches the loop structure it will actually run.
    UR_eff = int(unroll_rows)
    while UR_eff > 1 and rows % UR_eff:
        UR_eff //= 2
    ww_ext = 0
    if hoist_build and UR_eff > 1 and bgroup == 1:
        ww_ext = 8 * -(-((UR_eff - 1) * kmax) // 8)
    # bgroup > 1 loads W+8 sublanes from the 8-aligned floor of the dynamic
    # base (Mosaic alignment contract for multi-vreg-column lane widths);
    # 8 extra right-pad sublanes keep the wide window in range.  ww_ext
    # right-pad keeps the hoisted block window in range likewise.
    SPs = padl + S + W + (8 if bgroup > 1 else 0) + ww_ext

    f32 = feats.astype(jnp.float32)
    if metric == "cosine":
        f32 = f32 / jnp.maximum(
            jnp.linalg.norm(f32, axis=-1, keepdims=True), 1e-12
        )
        a_ch = jnp.transpose(f32, (0, 2, 1))             # [K, d, S]
        sq_a = jnp.zeros((K, 1, S))
        b_ch, sq_b = a_ch, jnp.zeros((K, 1, S))
    else:
        sq = jnp.sum(f32 * f32, axis=2)[:, None, :]      # [K, 1, S]
        a_ch = jnp.transpose(-2.0 * f32, (0, 2, 1))
        sq_a = sq
        b_ch = jnp.transpose(f32, (0, 2, 1))
        sq_b = sq
    a_aug = jnp.concatenate([a_ch, sq_a], axis=1)        # [K, d+1, S]
    nT = K // ti
    # B lane width: `bgroup` consecutive sorted B tiles lane-concatenated
    # per block.  tj_idx then indexes SUPERTILES (tile j // bgroup; lanes
    # [g*ti:(g+1)*ti] of the output are tile bgroup*tj + g) and tile_rep
    # holds one representative length per supertile.  Widening is pure op
    # geometry — per-lane op sequences are identical to bgroup=1, so
    # results are bitwise-stable in the knob (tests/test_dtw_diag.py
    # bgroup parity).
    TIB = ti * bgroup
    nTB = nT // bgroup
    if tile_rep.shape[0] != nTB:
        raise ValueError(
            f"tile_rep has {tile_rep.shape[0]} entries, want "
            f"nT // bgroup = {nTB}"
        )
    b_aug = jnp.concatenate([b_ch, sq_b], axis=1)        # [K, d+1, S]
    b_aug = jnp.pad(
        b_aug, ((0, 0), (0, 0), (padl, SPs - padl - S))
    )                                                    # [K, d+1, SPs]
    b_flip = jnp.transpose(
        b_aug.reshape(nTB, TIB, d + 1, SPs), (0, 2, 3, 1)
    )                                                    # [nTB, d+1, SPs, TIB]
    lb_t = jnp.broadcast_to(
        lengths.astype(jnp.int32).reshape(nTB, 1, TIB), (nTB, 8, TIB)
    )
    U = ti_idx.shape[0]

    kernel = partial(
        _dtw_lane_diag_kernel, d=d, band=int(band), metric=metric,
        rows=rows, width=W, off=off, padl=padl, scan_steps=scan_steps,
        kmax=kmax, unroll_rows=unroll_rows, dyn_roll=dyn_roll, stack=stack,
        a_ti=ti, aligned_loads=bgroup > 1, ww_ext=ww_ext,
    )
    RP = ti // stack
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(U, RP),
        in_specs=[
            # Block index is in (stack)-row units: block r of tile im[u]
            # covers corpus rows im[u]*ti + r*stack ... + stack.
            pl.BlockSpec(
                (stack, d + 1, S),
                lambda u, r, im, jm, lp, bm: (im[u] * RP + r, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, d + 1, SPs, TIB),
                lambda u, r, im, jm, lp, bm: (jm[u], 0, 0, 0),
            ),
            pl.BlockSpec(
                (1, 8, TIB), lambda u, r, im, jm, lp, bm: (jm[u], 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 8 * stack, TIB), lambda u, r, im, jm, lp, bm: (u, r, 0, 0)
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        out_shape=jax.ShapeDtypeStruct((U, RP, 8 * stack, TIB), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=3 * U * ti * TIB * rows * W * (d + scan_steps + kmax),
            bytes_accessed=U * (d + 1) * (S + SPs * TIB) * 4
            + U * ti * TIB * 4,
            transcendentals=U * ti * rows * W * TIB
            if metric == "euclidean" else 0,
        ),
        interpret=interpret,
    )(ti_idx.astype(jnp.int32), tj_idx.astype(jnp.int32),
      lengths.astype(jnp.int32), tile_rep.astype(jnp.int32),
      a_aug, b_flip, lb_t)
    if stack == 1:
        return out[:, :, 0, :]
    # Half h of program (u, r) is corpus A-row r*stack + h: interleave the
    # halves back into tile-row order (an XLA reshape over untiled dims).
    parts = jnp.stack(
        [out[:, :, 8 * h, :] for h in range(stack)], axis=2
    )                                                    # [U, RP, stack, ti]
    return parts.reshape(U, ti, out.shape[3])


def effective_lane_stack(requested: int, seq_len: int, feat_dim: int) -> int:
    """Largest power-of-two stack <= `requested` whose SMEM A block
    [stack, d+1, S] stays under lane_geometry's 320 KB cap (and divides
    the 128-row tile).  The scheduler and bench call this so a config
    knob of 4 degrades gracefully on long-sequence jobs instead of
    failing the Mosaic SMEM allocation."""
    S = 128 * -(-int(seq_len) // 128)
    stack = 1 << (max(1, int(requested)).bit_length() - 1)  # pow2 floor
    stack = min(stack, 128)
    while stack > 1 and (
        stack * (int(feat_dim) + 1) * S * 4 > 320 * 1024 or 128 % stack
    ):
        stack //= 2
    return stack


def diag_class_bounds(
    band: int,
    tmin_i: int,
    tmax_i: int,
    tmin_j: int,
    tmax_j: int,
) -> tuple[int, int]:
    """(wv_req, kmax) static contracts of _dtw_lane_diag_kernel for a
    tile-pair whose REAL lengths lie in [tmin_i, tmax_i] x [tmin_j, tmax_j]
    with tile_rep = (tmin_j + tmax_j + 1) // 2.

    Derivation (single source of truth; scheduler, bench and tests all call
    this): write den = la-1, num = lb-1, numm = lbm-1, M = max(den, num),
    D = num - numm.  The frame center is the round-half-up division
    c(i) = floor((i*numm + den//2)/den), so i*numm/den - 1/2 < c(i) <=
    i*numm/den + 1/2.  A corridor cell satisfies |j*den - i*num| <= r*M
    with j, i integers, i <= den, so its slot offset d = j - c(i) obeys
        d <  i*D/den + r*M/den + 1/2 <= spread + corridor + 1/2,
        d > -(spread + corridor + 1/2),
    with corridor = ceil(r*max(den_min, num_max)/den_min) >= r*M/den over
    the class and |i*D/den| <= |D| <= spread.  d is an integer strictly
    inside +-(corridor + spread + 1/2), hence |d| <= corridor + spread
    EXACTLY — no extra rounding or asymmetry slack is needed (the kernel
    frame covers [-wv-1, +wv] at W = 2*wv+2, one spare slot on the low
    side).  Round 4 shipped wv_req = corridor + spread + 2; the two slack
    slots pushed the bench classes from W=40 to W=48 sublanes — 1.2x
    computed elements on an element-throughput-bound kernel (BASELINE.md
    round-5 bgroup entry) — and were proven unnecessary by the bound
    above (tests/test_dtw_diag.py::test_diag_bounds_slot_coverage_exact
    brute-forces corridor-cell slot coverage at the exact bound).
    The per-row center step obeys k_i <= ceil((lbm-1)/(la-1)), maximized
    at la = tmin_i.
    """
    r = max(int(band), 1)
    den_min = max(int(tmin_i) - 1, 1)
    num_max = max(int(tmax_j) - 1, 0)
    lbm = (int(tmin_j) + int(tmax_j) + 1) // 2
    corridor = -(-r * max(den_min, num_max) // den_min)   # ceil
    spread = max(int(tmax_j) - lbm, lbm - int(tmin_j), 0)
    wv_req = corridor + spread
    kmax = max(1, -(-max(lbm - 1, 0) // den_min))
    return wv_req, kmax


def tile_rep_lengths(lens_sorted: "np.ndarray", nT: int, ti: int,
                     n_real: int) -> "np.ndarray":
    """[nT] representative B length per tile (mid-range of REAL entries;
    all-pad tiles fall back to the raw range), the `tile_rep` input of
    dtw_tile_lane_diag_pairs.  Must match diag_class_bounds' lbm."""
    rep = np.empty(nT, np.int32)
    for t in range(nT):
        real = lens_sorted[t * ti : min((t + 1) * ti, n_real)]
        if len(real) == 0:
            real = lens_sorted[t * ti : (t + 1) * ti]
        rep[t] = (int(real.min()) + int(real.max()) + 1) // 2
    return rep


# ---------------------------------------------------------------------------
# FULL-WIDTH (unbanded) lane kernel (round 4): the default config's fast
# path past S=256.
#
# Why: `dtw.band=None` is the production DEFAULT, yet through round 3 an
# unbanded job at S>256 fell off every all-pairs tile kernel onto the
# per-pair square kernel (S<=1024, HBM-bound at ~16 KB/pair of gathers) or
# blocked dtw_long — 10-100x off the lane rates (VERDICT r3 item 3).  The
# exact unbanded DP needs no corridor machinery at all: drop the shear and
# let stripe slot s BE column j.  The frame is then trivially static —
# up[s] = prev[s] (no realignment roll), diag[s] = prev[s-1] — and the
# only new cost is the horizontal min-plus scan spanning the full row,
# log2(W) steps instead of log2(2*band).  Work is exactly the la x lb DP
# rectangle with the SHORTER sequence on rows (the scheduler's length sort
# makes the A tile the shorter side), B stays VMEM-resident and amortized
# over ti pairs, and W is a per-class 8-granular prefix of the B tile —
# short classes neither load nor scan the dead tail.  Same +inf
# out-of-frame contract as every lane kernel: a pair whose lb exceeds the
# class width never extracts (out stays +inf), it is a class-fn bug
# surfacing loudly, not a truncated distance.
# ---------------------------------------------------------------------------


def lane_full_geometry(
    seq_len: int,
    feat_dim: int | None,
    width: int | None,
) -> int | None:
    """Tile size (always 128: the lane dim) for the FULL-WIDTH lane kernel,
    or None when the shape is out of range.  `width` is the job's WIDEST
    class stripe (8-multiple >= max real length).  Bounds mirror
    lane_geometry: the per-row A block in SMEM (320 KB cap, hardware-
    verified margin at S=4096, d=16) and the [d+1, width, 128] B tile
    double-buffered under the 100 MiB Mosaic budget."""
    if width is None or seq_len > MAX_STRIPE_SEQ_LEN:
        return None
    d = 8 if feat_dim is None else feat_dim
    S = 128 * -(-seq_len // 128)
    if (d + 1) * S * 4 > 320 * 1024:
        return None
    W = min(8 * -(-int(width) // 8), S)
    if 2 * (d + 1) * W * 128 * 4 > 80 * 1024 * 1024:
        return None
    return 128


def _dtw_lane_full_kernel(
    ti_map_ref,  # scalar-prefetch [U] i32
    tj_map_ref,  # scalar-prefetch [U] i32
    lens_ref,    # scalar-prefetch [K] i32 (whole corpus lengths, SMEM)
    a_ref,       # SMEM [1, d+1, S] f32: channels (-2a | sqa), time-minor
    b_ref,       # VMEM [1, d+1, W, ti] f32: (b | sqb), TIME ON SUBLANES
    lb_ref,      # VMEM [1, 8, ti] i32 (lengths 8-replicated on sublanes)
    out_ref,     # [1, 1, 8, ti] f32 (8-replicated sublane dim, see wrapper)
    *,
    d: int,
    metric: str,
    rows: int,
    width: int,       # W, 8-multiple (class-static, >= every real lb)
    scan_steps: int,
    unroll_rows: int,
):
    """One A-row x ti EXACT unbanded DTWs; stripe slot s of DP row i holds
    column j = s (the unsheared frame).  Contracts: `rows` >= this A-row's
    length, `width` >= every real pair's lb; shorter pairs mask their dead
    columns to +inf and extract at slot lb-1 of row la-1."""
    W = width
    TI = b_ref.shape[3]
    la = lens_ref[ti_map_ref[pl.program_id(0)] * TI + pl.program_id(1)]
    del tj_map_ref
    lb = lb_ref[0, 0:1, :]                               # [1, TI]

    sub = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
    col_ok = sub < lb                                    # [W, TI]
    ex = sub == lb - 1                                   # extraction slot

    def build_row(i):
        acc = b_ref[0, d, :, :]                          # sqb  [W, TI]
        acc = acc + a_ref[0, d, i]                       # + sqa (scalar)
        for c in range(d):                               # + -2a.b
            acc = acc + a_ref[0, c, i] * b_ref[0, c, :, :]
        valid = col_ok & (i < la)
        if metric == "cosine":
            cost = 1.0 - acc
        else:
            sq = jnp.maximum(acc, 0.0)
            cost = jnp.sqrt(sq) if metric == "euclidean" else sq
        return jnp.where(valid, cost, INF)

    def row_step(i, c, prev, out):
        # The virtual start cell D[-1, -1] = 0 enters as row 0's diagonal
        # predecessor at slot 0 (prev is +inf-initialized, so up/diag are
        # +inf everywhere else on row 0 and the scan unrolls D[0, j] as the
        # prefix sum of costs).
        start = jnp.where((sub == 0) & (i == 0), 0.0, INF)
        diag = jnp.minimum(
            jnp.where(sub >= 1, pltpu.roll(prev, 1, axis=0), INF), start
        )
        e = c + jnp.minimum(diag, prev)                  # prev = up (D[i-1, j])
        ee, cc = e, c
        for t in range(scan_steps):
            sh = 1 << t
            m = sub >= sh
            ee = jnp.where(
                m, jnp.minimum(ee, pltpu.roll(ee, sh, axis=0) + cc), ee
            )
            if t < scan_steps - 1:
                cc = jnp.where(m, cc + pltpu.roll(cc, sh, axis=0), cc)
        return ee, jnp.where((i == la - 1) & ex, ee, out)

    UR = unroll_rows
    while UR > 1 and rows % UR:
        UR //= 2

    def row_body(i0, carry):
        prev, out = carry
        for k in range(UR):
            i = i0 * UR + k
            prev, out = row_step(i, build_row(i), prev, out)
        return prev, out

    init = (
        jnp.full((W, TI), INF),
        jnp.full((W, TI), INF),
    )
    _, out_acc = jax.lax.fori_loop(0, rows // UR, row_body, init)
    out_ref[0, 0, :, :] = jnp.broadcast_to(
        jnp.min(out_acc, axis=0, keepdims=True), (8, TI)
    )


@partial(
    jax.jit,
    static_argnames=("ti", "metric", "rows", "width", "unroll_rows",
                     "interpret"),
)
def dtw_tile_lane_full_pairs(
    feats,        # [K, S, d] f32 padded sequences (device-resident corpus)
    lengths,      # [K] i32 (pad entries: length 1)
    ti_idx,       # [U] i32 tile-row indices
    tj_idx,       # [U] i32 tile-col indices
    *,
    ti: int,
    width: int,
    metric: str = "euclidean",
    rows: int | None = None,
    unroll_rows: int = 8,
    interpret: bool = False,
):
    """EXACT unbanded DTW distances for U tile-pairs -> [U, ti, ti] blocks
    (band=None semantics; oracle/dtw.py), pairs packed on LANES and the
    full DP row on SUBLANES.  `width` (8-multiple) must cover every real
    pair's B length and `rows` every real A length — both STATIC class
    contracts computed by the pair scheduler; shortfalls surface as +inf,
    never truncated distances.  Output contract is dtw_tile_lane_pairs'.
    On hardware `ti` must be a multiple of 128; tests use small ti in
    interpret mode."""
    import chex

    chex.assert_rank(feats, 3)
    chex.assert_rank([lengths, ti_idx, tj_idx], 1)
    K, S, d = feats.shape
    if K % ti:
        raise ValueError(f"K={K} must be padded to a multiple of ti={ti}")
    W = 8 * -(-int(width) // 8)
    if W > S:
        raise ValueError(f"width={width} exceeds the padded corpus S={S}")
    scan_steps = int(max(1, (W - 1).bit_length()))
    rows = S if rows is None else min(rows, S)

    f32 = feats.astype(jnp.float32)
    if metric == "cosine":
        f32 = f32 / jnp.maximum(
            jnp.linalg.norm(f32, axis=-1, keepdims=True), 1e-12
        )
        a_ch = jnp.transpose(f32, (0, 2, 1))             # [K, d, S]
        sq_a = jnp.zeros((K, 1, S))
        b_ch, sq_b = a_ch, jnp.zeros((K, 1, S))
    else:
        sq = jnp.sum(f32 * f32, axis=2)[:, None, :]      # [K, 1, S]
        a_ch = jnp.transpose(-2.0 * f32, (0, 2, 1))
        sq_a = sq
        b_ch = jnp.transpose(f32, (0, 2, 1))
        sq_b = sq
    a_aug = jnp.concatenate([a_ch, sq_a], axis=1)        # [K, d+1, S]
    nT = K // ti
    # B tile: time on SUBLANES, pair index on LANES.  Each class block
    # reads only the first `width` sublanes (a prefix of the time axis) —
    # narrow classes neither DMA nor scan the dead tail.
    b_aug = jnp.concatenate([b_ch, sq_b], axis=1)        # [K, d+1, S]
    b_flip = jnp.transpose(
        b_aug.reshape(nT, ti, d + 1, S), (0, 2, 3, 1)
    )                                                    # [nT, d+1, S, ti]
    lb_t = jnp.broadcast_to(
        lengths.astype(jnp.int32).reshape(nT, 1, ti), (nT, 8, ti)
    )
    U = ti_idx.shape[0]

    kernel = partial(
        _dtw_lane_full_kernel, d=d, metric=metric, rows=rows, width=W,
        scan_steps=scan_steps, unroll_rows=unroll_rows,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(U, ti),
        in_specs=[
            pl.BlockSpec(
                (1, d + 1, S),
                lambda u, r, im, jm, lp: (im[u] * ti + r, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, d + 1, W, ti),
                lambda u, r, im, jm, lp: (jm[u], 0, 0, 0),
            ),
            pl.BlockSpec(
                (1, 8, ti), lambda u, r, im, jm, lp: (jm[u], 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 8, ti), lambda u, r, im, jm, lp: (u, r, 0, 0)
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        out_shape=jax.ShapeDtypeStruct((U, ti, 8, ti), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=3 * U * ti * ti * rows * W * (d + scan_steps),
            bytes_accessed=U * (d + 1) * (S + W * ti) * 4 + U * ti * ti * 4,
            transcendentals=U * ti * rows * W * ti
            if metric == "euclidean" else 0,
        ),
        interpret=interpret,
    )(ti_idx.astype(jnp.int32), tj_idx.astype(jnp.int32),
      lengths.astype(jnp.int32), a_aug, b_flip, lb_t)
    return out[:, :, 0, :]
