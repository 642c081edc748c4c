#!/usr/bin/env python
"""Find the DTW row-loop's true bound: degenerate-variant timings.

  A  old7            control (correct)
  E  scan1           scan_steps=1 (WRONG results; isolates scan cost)
  F  noscan          row body = read + e-term + extract only (WRONG)
  G  old7-unroll2    2 rows per fori_loop iteration (correct)
  H  nograms         costs read as-is, no gram (WRONG; isolates build)
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


def make_kernel(scan_steps, unroll, do_scan, do_gram):
    def kernel(a_ref, b_ref, la_ref, lb_ref, out_ref, cmat_ref):
        R = a_ref.shape[2]
        S = b_ref.shape[2]
        PBk = a_ref.shape[0]
        a = a_ref[:]
        b = b_ref[:]
        la = la_ref[:]
        lb = lb_ref[:]
        if do_gram:
            gram = jax.lax.dot_general(
                a, b, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            sqa = jnp.sum(a * a, axis=1)
            sqb = jnp.sum(b * b, axis=1)
            sq = jnp.maximum(sqa[:, :, None] + sqb[:, None, :] - 2.0 * gram, 0.0)
            cmat_ref[:] = jnp.sqrt(sq)
        else:
            cmat_ref[:] = jnp.broadcast_to(b[:, :1, :1], (PBk, R, S))

        lanes = jax.lax.broadcasted_iota(jnp.int32, (PBk, S), dimension=1)
        col_valid = lanes < lb
        lane_eq_t = lanes == (lb - 1)
        wv = jnp.maximum(jnp.int32(BAND), jnp.abs(la - lb))

        def one_row(i, prev, out):
            c = cmat_ref[:, i, :]
            row_valid = col_valid & (i < la) & (jnp.abs(lanes - i) <= wv)
            c = jnp.where(row_valid, c, INF)
            prev_shift = jnp.where(lanes >= 1, pltpu.roll(prev, 1, axis=1), INF)
            e = c + jnp.minimum(prev, prev_shift)
            e = jnp.where((i == 0) & (lanes == 0), c, e)
            if do_scan:
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
            else:
                row = e
            is_last = i == (la - 1)
            hit = is_last & lane_eq_t
            out = jnp.where(
                jnp.any(hit, axis=1, keepdims=True),
                jnp.sum(jnp.where(hit, row, 0.0), axis=1, keepdims=True),
                out,
            )
            return row, out

        if unroll == 2:
            def row_body(k, carry):
                prev, out = carry
                prev, out = one_row(2 * k, prev, out)
                prev, out = one_row(2 * k + 1, prev, out)
                return prev, out
            n_iter = a_ref.shape[2] // 2
        else:
            def row_body(i, carry):
                prev, out = carry
                return one_row(i, prev, out)
            n_iter = a_ref.shape[2]

        init = (jnp.full((PBk, S), INF), jnp.full((PBk, 1), INF))
        _, out = jax.lax.fori_loop(0, n_iter, row_body, init)
        out_ref[:] = out

    return kernel


@partial(jax.jit, static_argnames=("scan_steps", "unroll", "do_scan", "do_gram"))
def run_variant(a, b, la, lb, *, scan_steps, unroll, do_scan, do_gram):
    B, R, d = a.shape
    S = b.shape[1]
    at = jnp.transpose(a, (0, 2, 1))
    bt = jnp.transpose(b, (0, 2, 1))
    la2 = la[:, None].astype(jnp.int32)
    lb2 = lb[:, None].astype(jnp.int32)
    kern = make_kernel(scan_steps, unroll, do_scan, do_gram)
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
    lengths = rng.integers(SEQ_LEN // 2, SEQ_LEN + 1, BATCH).astype(np.int32)
    a = jnp.asarray(rng.normal(0, 1, (BATCH, SEQ_LEN, LATENT_DIM)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 1, (BATCH, SEQ_LEN, LATENT_DIM)).astype(np.float32))
    la = jnp.asarray(lengths)
    lb = jnp.asarray(np.roll(lengths, 1))

    variants = [
        ("A old7", dict(scan_steps=7, unroll=1, do_scan=True, do_gram=True)),
        ("E scan1", dict(scan_steps=1, unroll=1, do_scan=True, do_gram=True)),
        ("F noscan", dict(scan_steps=0, unroll=1, do_scan=False, do_gram=True)),
        ("G old7-unroll2", dict(scan_steps=7, unroll=2, do_scan=True, do_gram=True)),
        ("H nogram", dict(scan_steps=7, unroll=1, do_scan=True, do_gram=False)),
    ]
    ref = None
    for name, kw in variants:
        fn = lambda kw=kw: run_variant(a, b, la, lb, **kw)
        t0 = time.perf_counter()
        got = np.asarray(fn())[:, 0]
        log(f"{name}: compile+warm {time.perf_counter() - t0:.1f}s")
        if ref is None:
            ref = got
        elif kw["scan_steps"] == 7 and kw["do_scan"] and kw["do_gram"]:
            log(f"{name}: max|delta vs A| = {np.nanmax(np.abs(got - ref))}")
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
