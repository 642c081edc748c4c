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
of D in log2(M) vector steps — every step a full-width [PB, M] VPU op.
One row per fori_loop iteration; costs for row i are read contiguously
from the VMEM-resident Gram matrix.  Ragged lengths and the Sakoe-Chiba
band are +inf cost masks; each pair's distance is extracted as its last
valid row is produced (cf. ops/dtw.py, the correctness oracle).

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
_CMAT_VMEM_BUDGET = 16 * 1024 * 1024


def default_pair_block(seq_len: int) -> int:
    """Pairs per kernel program: as fat as the Gram scratch allows.

    The row loop is latency-bound (S sequential steps); per-step throughput
    is PB*S lanes, so PB directly multiplies VPU utilization.  Cap so
    PB*S*S*4 bytes of cost matrix fits the VMEM budget (the pallas_call
    lifts Mosaic's scoped-VMEM limit to match; a v5e core has 128 MiB).
    Swept on-chip at S=128/B=32k: PB 128 -> 897k pairs/s, 256 -> 977k,
    512 -> 883k; 256 is the knee.
    """
    pb = _CMAT_VMEM_BUDGET // (seq_len * seq_len * 4)
    return int(max(8, min(256, 1 << (pb.bit_length() - 1))))


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


@partial(
    jax.jit,
    static_argnames=(
        "band",
        "auto_widen",
        "metric",
        "normalize",
        "pair_block",
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
    interpret: bool = False,
) -> jax.Array:
    """Drop-in for ops.dtw.dtw_batch on the Pallas fast path.  Returns [B].

    `a` may be padded shorter than `b` ([B, R, d] vs [B, S, d], R <= S):
    the kernel's sequential row loop runs only R steps, so orienting every
    pair shorter-first (DTW is symmetric) cuts the dominant latency.  All
    len_a must be <= R.
    """
    B, R, d = a.shape
    S = b.shape[1]
    if R > S:
        raise ValueError("pass the shorter sequence first (R <= S)")
    if pair_block is None:
        pair_block = default_pair_block(S)
    if S > MAX_KERNEL_SEQ_LEN:
        raise ValueError(
            f"padded length {S} > {MAX_KERNEL_SEQ_LEN}; use ops.dtw.dtw_batch"
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
            flops=2 * Bp * R * S * d + 12 * Bp * R * S * int(np.log2(max(S, 2))),
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
