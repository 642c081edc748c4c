#!/usr/bin/env python
"""Bisect DTW kernel variants (one TPU process).  Variants are built from
the round-1 kernel structure with one change each:

  A  old exact (masked scan, in-loop masks, any/sum extraction)  [control]
  B  A + scan_steps=6 (banded depth from the class bound)
  C  B + lean min-accumulate extraction
  D  C + fused mask build (mask folded into cmat write)
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = float("inf")
SEQ_LEN = 128
LATENT_DIM = 16
BAND = 16
BATCH = 32_768
PB = 256
ITERS = 6
DEPTH = 4


def log(m):
    print(m, file=sys.stderr, flush=True)


def make_kernel(scan_steps, lean_extract, fused_build):
    def kernel(a_ref, b_ref, la_ref, lb_ref, out_ref, cmat_ref):
        R = a_ref.shape[2]
        S = b_ref.shape[2]
        PBk = a_ref.shape[0]
        a = a_ref[:]
        b = b_ref[:]
        la = la_ref[:]
        lb = lb_ref[:]
        gram = jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        sqa = jnp.sum(a * a, axis=1)
        sqb = jnp.sum(b * b, axis=1)
        sq = jnp.maximum(sqa[:, :, None] + sqb[:, None, :] - 2.0 * gram, 0.0)
        cost = jnp.sqrt(sq)
        wv = jnp.maximum(jnp.int32(BAND), jnp.abs(la - lb))
        if fused_build:
            rows3 = jax.lax.broadcasted_iota(jnp.int32, (1, R, S), 1)
            lanes3 = jax.lax.broadcasted_iota(jnp.int32, (1, R, S), 2)
            valid = (
                (lanes3 < lb[:, :, None])
                & (rows3 < la[:, :, None])
                & (jnp.abs(lanes3 - rows3) <= wv[:, :, None])
            )
            cmat_ref[:] = jnp.where(valid, cost, INF)
        else:
            cmat_ref[:] = cost

        lanes = jax.lax.broadcasted_iota(jnp.int32, (PBk, S), dimension=1)
        col_valid = lanes < lb
        lane_eq_t = lanes == (lb - 1)

        def row_body(i, carry):
            prev, out = carry
            c = cmat_ref[:, i, :]
            if not fused_build:
                row_valid = col_valid & (i < la) & (jnp.abs(lanes - i) <= wv)
                c = jnp.where(row_valid, c, INF)
            prev_shift = jnp.where(lanes >= 1, pltpu.roll(prev, 1, axis=1), INF)
            e = c + jnp.minimum(prev, prev_shift)
            e = jnp.where((i == 0) & (lanes == 0), c, e)
            ee, cc = e, c
            sh = 1
            for _ in range(scan_steps):
                mask = lanes >= sh
                ee_s = pltpu.roll(ee, sh, axis=1)
                cc_s = pltpu.roll(cc, sh, axis=1)
                ee = jnp.where(mask, jnp.minimum(ee, ee_s + cc), ee)
                cc = jnp.where(mask, cc_s + cc, cc)
                sh *= 2
            row = ee
            if lean_extract:
                hit = (i == (la - 1)) & lane_eq_t
                out = jnp.minimum(
                    out, jnp.min(jnp.where(hit, row, INF), axis=1, keepdims=True)
                )
            else:
                is_last = i == (la - 1)
                hit = is_last & lane_eq_t
                out = jnp.where(
                    jnp.any(hit, axis=1, keepdims=True),
                    jnp.sum(jnp.where(hit, row, 0.0), axis=1, keepdims=True),
                    out,
                )
            return row, out

        init = (jnp.full((PBk, S), INF), jnp.full((PBk, 1), INF))
        _, out = jax.lax.fori_loop(0, a_ref.shape[2], row_body, init)
        out_ref[:] = out

    return kernel


@partial(jax.jit, static_argnames=("scan_steps", "lean_extract", "fused_build"))
def run_variant(a, b, la, lb, *, scan_steps, lean_extract, fused_build):
    B, R, d = a.shape
    S = b.shape[1]
    at = jnp.transpose(a, (0, 2, 1))
    bt = jnp.transpose(b, (0, 2, 1))
    la2 = la[:, None].astype(jnp.int32)
    lb2 = lb[:, None].astype(jnp.int32)
    kern = make_kernel(scan_steps, lean_extract, fused_build)
    return pl.pallas_call(
        kern,
        grid=(B // PB,),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec((PB, d, R), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, d, S), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((PB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((PB, R, S), jnp.float32)],
    )(at, bt, la2, lb2)


def main() -> int:
    rng = np.random.default_rng(0)
    lengths = rng.integers(SEQ_LEN - 16, SEQ_LEN + 1, BATCH).astype(np.int32)
    a = jnp.asarray(rng.normal(0, 1, (BATCH, SEQ_LEN, LATENT_DIM)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 1, (BATCH, SEQ_LEN, LATENT_DIM)).astype(np.float32))
    la = jnp.asarray(lengths)
    lb = jnp.asarray(np.roll(lengths, 1))

    variants = [
        ("A old7", dict(scan_steps=7, lean_extract=False, fused_build=False)),
        ("B old6", dict(scan_steps=6, lean_extract=False, fused_build=False)),
        ("C old6+leanx", dict(scan_steps=6, lean_extract=True, fused_build=False)),
        ("D old6+leanx+fused", dict(scan_steps=6, lean_extract=True, fused_build=True)),
    ]
    ref = None
    for name, kw in variants:
        fn = lambda kw=kw: run_variant(a, b, la, lb, **kw)
        t0 = time.perf_counter()
        got = np.asarray(fn())[:, 0]
        log(f"{name}: compile+warm {time.perf_counter() - t0:.1f}s")
        if ref is None:
            ref = got
        else:
            err = np.nanmax(np.abs(got - ref))
            log(f"{name}: max|delta vs A| = {err}")
        for o in [fn() for _ in range(DEPTH)]:
            np.asarray(o)
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [fn() for _ in range(ITERS)]
            for o in outs:
                np.asarray(o)
            best = max(best, BATCH * ITERS / (time.perf_counter() - t0))
        log(f"{name}: {best:,.0f} pairs/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
