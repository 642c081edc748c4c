#!/usr/bin/env python
"""ILP probe: interleave independent pair-streams per fori_loop iteration.

If the row loop is latency-bound on its serialized dependency chain (diag4/5
showed op count, read mechanism, and unrolling all ~neutral), running 2 or 4
INDEPENDENT streams in one loop body fills the latency bubbles at the same
total element work.

  A   control (1 stream, PB=256)
  K2  2 streams x 128 pairs (PB=256)
  K4  4 streams x 64 pairs  (PB=256)
  M2  2 streams x 256 pairs (PB=512, 32 MiB cmat)
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
ITERS = 6
DEPTH = 4


def log(m):
    print(m, file=sys.stderr, flush=True)


def make_kernel(streams):
    def kernel(a_ref, b_ref, la_ref, lb_ref, out_ref, cmat_ref):
        R = a_ref.shape[2]
        S = b_ref.shape[2]
        PBk = a_ref.shape[0]
        q = PBk // streams
        a = a_ref[:]
        b = b_ref[:]
        gram = jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        sqa = jnp.sum(a * a, axis=1)
        sqb = jnp.sum(b * b, axis=1)
        sq = jnp.maximum(sqa[:, :, None] + sqb[:, None, :] - 2.0 * gram, 0.0)
        cmat_ref[:] = jnp.sqrt(sq)

        las = [la_ref[s * q : (s + 1) * q] for s in range(streams)]
        lbs = [lb_ref[s * q : (s + 1) * q] for s in range(streams)]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (q, S), dimension=1)
        col_valids = [lanes < lbs[s] for s in range(streams)]
        lane_eq_ts = [lanes == (lbs[s] - 1) for s in range(streams)]
        wvs = [
            jnp.maximum(jnp.int32(BAND), jnp.abs(las[s] - lbs[s]))
            for s in range(streams)
        ]

        def one_row(s, i, c, prev, out):
            row_valid = col_valids[s] & (i < las[s]) & (jnp.abs(lanes - i) <= wvs[s])
            c = jnp.where(row_valid, c, INF)
            prev_shift = jnp.where(lanes >= 1, pltpu.roll(prev, 1, axis=1), INF)
            e = c + jnp.minimum(prev, prev_shift)
            e = jnp.where((i == 0) & (lanes == 0), c, e)
            ee, cc = e, c
            sh = 1
            for _ in range(7):
                mask = lanes >= sh
                ee = jnp.where(
                    mask, jnp.minimum(ee, pltpu.roll(ee, sh, axis=1) + cc), ee
                )
                cc = jnp.where(mask, cc + pltpu.roll(cc, sh, axis=1), cc)
                sh *= 2
            hit = (i == (las[s] - 1)) & lane_eq_ts[s]
            out = jnp.where(
                jnp.any(hit, axis=1, keepdims=True),
                jnp.sum(jnp.where(hit, ee, 0.0), axis=1, keepdims=True),
                out,
            )
            return ee, out

        def row_body(i, carry):
            prevs, outs = carry
            new_prevs, new_outs = [], []
            for s in range(streams):
                c = cmat_ref[s * q : (s + 1) * q, i, :]
                p, o = one_row(s, i, c, prevs[s], outs[s])
                new_prevs.append(p)
                new_outs.append(o)
            return tuple(new_prevs), tuple(new_outs)

        init = (
            tuple(jnp.full((q, S), INF) for _ in range(streams)),
            tuple(jnp.full((q, 1), INF) for _ in range(streams)),
        )
        _, outs = jax.lax.fori_loop(0, R, row_body, init)
        out_ref[:] = jnp.concatenate(list(outs), axis=0)

    return kernel


@partial(jax.jit, static_argnames=("streams", "pb"))
def run_variant(a, b, la, lb, *, streams, pb):
    B, R, d = a.shape
    S = b.shape[1]
    at = jnp.transpose(a, (0, 2, 1))
    bt = jnp.transpose(b, (0, 2, 1))
    la2 = la[:, None].astype(jnp.int32)
    lb2 = lb[:, None].astype(jnp.int32)
    return pl.pallas_call(
        make_kernel(streams),
        grid=(B // pb,),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec((pb, d, R), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pb, d, S), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((pb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((pb, R, S), jnp.float32)],
    )(at, bt, la2, lb2)


def main() -> int:
    rng = np.random.default_rng(0)
    lengths = rng.integers(SEQ_LEN // 2, SEQ_LEN + 1, BATCH).astype(np.int32)
    a = jnp.asarray(rng.normal(0, 1, (BATCH, SEQ_LEN, LATENT_DIM)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 1, (BATCH, SEQ_LEN, LATENT_DIM)).astype(np.float32))
    la = jnp.asarray(lengths)
    lb = jnp.asarray(np.roll(lengths, 1))

    variants = [
        ("A 1x256", dict(streams=1, pb=256)),
        ("K2 2x128", dict(streams=2, pb=256)),
        ("K4 4x64", dict(streams=4, pb=256)),
        ("M2 2x256", dict(streams=2, pb=512)),
    ]
    ref = None
    for name, kw in variants:
        fn = lambda kw=kw: run_variant(a, b, la, lb, **kw)
        t0 = time.perf_counter()
        try:
            got = np.asarray(fn())[:, 0]
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
            continue
        log(f"{name}: compile+warm {time.perf_counter() - t0:.1f}s")
        if ref is None:
            ref = got
        else:
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
