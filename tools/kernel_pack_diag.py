#!/usr/bin/env python
"""On-chip probe: multi-pair LANE PACKING for banded DTW (round-3 item 1).

Motivation (VERDICT r2): at the benchmark shape (S=128, band=16) a DP row's
live interval is <= 2*wv+1 = 33 of 128 lanes, and the measured per-row cost
of the square kernel (~8 ns/pair-row) is insensitive to op count — so packing
P pairs' live stripes into one 128-lane row should advance P pairs per row op
at roughly the same per-op cost.

Two packed formulations, probed DP-ONLY first (cost tensors prebuilt on
device by XLA, kernels time just the recurrence):

* rowscan: the stripe-frame row recurrence (min-plus Hillis-Steele scan)
  with P = 128 // (2*wv_max+2) sub-stripes per row.  P=3 at band=16.
* wavefront: anti-diagonal recurrence in a SQUEEZED stripe frame — along an
  anti-diagonal the live cells have one parity of j-i, so slots pack 2x
  denser (w_sub = wv_max+2) and there is NO intra-row dependency: no scan,
  ~7 ops per row instead of ~40.  P=7 at band=16.  Runs 2 rows (one even,
  one odd parity) per fori_loop iteration so the alternating stencil is
  static.

Cross-sub-stripe roll leakage is absorbed by permanently-+inf boundary
slots exactly like the stripe kernel's seam argument (ops/dtw_pallas.py).

Usage:  python tools/kernel_pack_diag.py [--probe all|rowscan|wavefront|square]
            [--ddmax 20] [--pbg 128] [--batch 32768] [--check-only]
One TPU process at a time (CLAUDE.md).
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SEQ_LEN = 128
LATENT_DIM = 16
BAND = 16
ITERS = 6
INF = float("inf")


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# packed cost-tensor builders (device-side XLA; NOT on the timed path here —
# the probe isolates DP cost.  Production build strategy is phase 2.)
# ---------------------------------------------------------------------------


def _cost_full(a, b, la, lb, wv):
    """[B, R, S] euclidean cost with band/length masking (+inf outside)."""
    import jax
    import jax.numpy as jnp

    gram = jax.lax.dot_general(
        a, b, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    sqa = jnp.sum(a * a, axis=2)
    sqb = jnp.sum(b * b, axis=2)
    sq = jnp.maximum(sqa[:, :, None] + sqb[:, None, :] - 2.0 * gram, 0.0)
    c = jnp.sqrt(sq)
    R, S = a.shape[1], b.shape[1]
    ii = jnp.arange(R)[None, :, None]
    jj = jnp.arange(S)[None, None, :]
    valid = (
        (ii < la[:, None, None])
        & (jj < lb[:, None, None])
        & (jnp.abs(jj - ii) <= wv[:, None, None])
    )
    return jnp.where(valid, c, INF)


def _rowscan_cm(a, b, la, lb, band, wv_max):
    """Pure-jnp packed stripe cmat [G, R, 128] (jittable)."""
    import jax.numpy as jnp

    B, R, _ = a.shape
    w_sub = 2 * wv_max + 2
    P = 128 // w_sub
    off = wv_max + 1
    wv = jnp.maximum(band, jnp.abs(la - lb))
    cf = _cost_full(a, b, la, lb, wv)                      # [B, R, S]
    s_idx = jnp.arange(w_sub)[None, :]
    i_idx = jnp.arange(R)[:, None]
    j_idx = i_idx + s_idx - off                            # [R, w_sub]
    j_clip = jnp.clip(j_idx, 0, cf.shape[2] - 1)
    stripe = jnp.take_along_axis(
        cf, jnp.broadcast_to(j_clip[None], (B, R, w_sub)), axis=2
    )
    stripe = jnp.where((j_idx >= 0)[None], stripe, INF)    # [B, R, w_sub]

    G = -(-B // P)
    pad = G * P - B
    stripe = jnp.pad(stripe, ((0, pad), (0, 0), (0, 0)), constant_values=INF)
    cm = jnp.transpose(stripe.reshape(G, P, R, w_sub), (0, 2, 1, 3))
    cm = cm.reshape(G, R, P * w_sub)
    cm = jnp.pad(cm, ((0, 0), (0, 0), (0, 128 - P * w_sub)),
                 constant_values=INF)                      # [G, R, 128]
    return cm


def build_rowscan_packed(a, b, la, lb, band, wv_max):
    """Packed stripe cmat [G, R, 128] + extraction rows [G, 128]."""
    import jax.numpy as jnp

    B, R, _ = a.shape
    w_sub = 2 * wv_max + 2
    P = 128 // w_sub
    off = wv_max + 1
    G = -(-B // P)
    cm = _rowscan_cm(a, b, la, lb, band, wv_max)

    # per-lane extraction row (la-1 at the pair's extraction slot, else -1)
    ex = np.full((G * P, w_sub), -1, np.int32)
    la_np, lb_np = np.asarray(la), np.asarray(lb)
    t_e = lb_np - la_np + off
    ex[np.arange(B), t_e] = la_np - 1
    ex = ex.reshape(G, P * w_sub)
    ex = np.pad(ex, ((0, 0), (0, 128 - P * w_sub)), constant_values=-1)
    prev0 = np.where(np.arange(128) % w_sub == off, 0.0, INF)[None].astype(
        np.float32
    )
    lane_e = (np.arange(B) % P) * w_sub + t_e              # [B] lane per pair
    return cm, jnp.asarray(ex), jnp.asarray(prev0), lane_e, P, w_sub


def _wavefront_cm(a, b, la, lb, band, wv_max):
    """Pure-jnp packed squeezed-wavefront cmat [G, K2, 128] (jittable)."""
    import jax.numpy as jnp

    B, R, _ = a.shape
    S = b.shape[1]
    w_sub = wv_max + 2
    P = 128 // w_sub
    off = wv_max + 1
    K2 = 2 * S
    wv = jnp.maximum(band, jnp.abs(la - lb))
    cf = _cost_full(a, b, la, lb, wv)                      # [B, R, S]

    k_idx = np.arange(K2)[:, None]                         # [K2, 1]
    m_idx = np.arange(w_sub)[None, :]                      # [1, w_sub]
    par = (k_idx + off) & 1
    t = 2 * m_idx + par                                    # [K2, w_sub]
    i_idx = (k_idx - t + off) // 2
    j_idx = k_idx - i_idx
    ok = (i_idx >= 0) & (i_idx < R) & (j_idx >= 0) & (j_idx < S)
    i_c = np.clip(i_idx, 0, R - 1)
    j_c = np.clip(j_idx, 0, S - 1)
    cw = cf[:, i_c, j_c]                                   # [B, K2, w_sub]
    cw = jnp.where(jnp.asarray(ok)[None], cw, INF)

    G = -(-B // P)
    pad = G * P - B
    cw = jnp.pad(cw, ((0, pad), (0, 0), (0, 0)), constant_values=INF)
    cm = jnp.transpose(cw.reshape(G, P, K2, w_sub), (0, 2, 1, 3))
    cm = cm.reshape(G, K2, P * w_sub)
    cm = jnp.pad(cm, ((0, 0), (0, 0), (0, 128 - P * w_sub)),
                 constant_values=INF)                      # [G, K2, 128]
    return cm


def build_wavefront_packed(a, b, la, lb, band, wv_max):
    """Packed squeezed-wavefront cmat [G, K2, 128] + extraction aux."""
    import jax.numpy as jnp

    B, R, _ = a.shape
    S = b.shape[1]
    w_sub = wv_max + 2
    P = 128 // w_sub
    off = wv_max + 1
    G = -(-B // P)
    cm = _wavefront_cm(a, b, la, lb, band, wv_max)

    la_np, lb_np = np.asarray(la), np.asarray(lb)
    k_e = la_np + lb_np - 2
    t_e = lb_np - la_np + off
    m_e = (t_e - ((k_e + off) & 1)) // 2
    ex = np.full((G * P, w_sub), -1, np.int32)
    ex[np.arange(B), m_e] = k_e
    ex = ex.reshape(G, P * w_sub)
    ex = np.pad(ex, ((0, 0), (0, 128 - P * w_sub)), constant_values=-1)
    # init D2 = row -2: virtual D[-1,-1]=0 at t=off, parity of row -2 is
    # ((-2+off)&1) == ((off)&1) == parity of t=off ✓; m00 = (off - (off&1))//2
    m00 = (off - (off & 1)) // 2
    p0 = np.where(np.arange(128) % w_sub == m00, 0.0, INF)[None].astype(
        np.float32
    )
    lane_e = (np.arange(B) % P) * w_sub + m_e
    return cm, jnp.asarray(ex), jnp.asarray(p0), lane_e, P, w_sub, off


# ---------------------------------------------------------------------------
# probe kernels (DP only)
# ---------------------------------------------------------------------------


def _left_shift_1(x, gl, W, idiom):
    """lane m <- x[m+1] (a LEFT shift).  The square kernel never needs one
    (all its reads are right-shifts, which Mosaic lowers cheaply); the
    packed frames need exactly one per row, and the first probe run showed
    the masked W-1 roll costs ~15-20us/op — hence these idiom variants."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    if idiom == "maskroll":      # round-3 first attempt: W-1 circular roll
        return jnp.where(gl < W - 1, pltpu.roll(x, W - 1, axis=1), INF)
    if idiom == "negroll":       # negative shift, if Mosaic lowers it as one
        return jnp.where(gl < W - 1, pltpu.roll(x, -1, axis=1), INF)
    if idiom == "slice":         # unaligned lane slice + pad
        return jnp.concatenate(
            [x[:, 1:], jnp.full((x.shape[0], 1), INF, x.dtype)], axis=1
        )
    if idiom == "none":          # WRONG results; isolates the shift's cost
        return x
    raise ValueError(idiom)


def _pk_rowscan_kernel(cm_ref, ex_ref, p0_ref, out_ref, scr_ref, *, rows,
                      scan_steps, upshift, scratch_copy, dp_repeats=1):
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    G = cm_ref.shape[0]
    W = 128
    gl = jax.lax.broadcasted_iota(jnp.int32, (G, W), dimension=1)
    ex = ex_ref[:]
    prev0 = jnp.broadcast_to(p0_ref[:], (G, W))
    if scratch_copy:
        scr_ref[:] = cm_ref[:]
    src = scr_ref if scratch_copy else cm_ref

    def body(i, carry):
        prev, out = carry
        c = src[:, i, :]
        up = _left_shift_1(prev, gl, W, upshift)
        e = c + jnp.minimum(prev, up)
        ee, cc = e, c
        for t in range(scan_steps):
            sh = 1 << t
            m = gl >= sh
            ee = jnp.where(
                m, jnp.minimum(ee, pltpu.roll(ee, sh, axis=1) + cc), ee
            )
            if t < scan_steps - 1:
                cc = jnp.where(m, cc + pltpu.roll(cc, sh, axis=1), cc)
        out = jnp.where(i == ex, ee, out)
        return ee, out

    # dp_repeats re-runs the whole DP over the resident block: the block
    # DMA amortizes across repeats, so the slope of time vs repeats
    # isolates the DP's true per-iteration cost from the input pipeline
    # (which the first probe runs were actually measuring).  Each repeat's
    # init carries a value-neutral data dependency on the previous out so
    # the compiler cannot hoist the loop (out may hold +inf, so the usual
    # x*0 trick would make NaNs; isfinite-gating keeps it exactly 0).
    def dp(_, carry):
        _, prev_out = carry
        dep = jnp.where(jnp.isfinite(prev_out), prev_out, 0.0) * 0.0
        init = (prev0 + dep, jnp.full((G, W), INF))
        return jax.lax.fori_loop(0, rows, body, init)

    _, out = jax.lax.fori_loop(
        0, dp_repeats, dp, (prev0, jnp.full((G, W), INF))
    )
    out_ref[:] = out


def _pk_wavefront_kernel(cm_ref, ex_ref, p0_ref, out_ref, scr_ref, *, n_iter,
                        par0, upshift, scratch_copy, dp_repeats=1):
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    G = cm_ref.shape[0]
    W = 128
    gl = jax.lax.broadcasted_iota(jnp.int32, (G, W), dimension=1)
    D2 = jnp.broadcast_to(p0_ref[:], (G, W))
    D1 = jnp.full((G, W), INF)
    ex = ex_ref[:]
    if scratch_copy:
        scr_ref[:] = cm_ref[:]
    src = scr_ref if scratch_copy else cm_ref

    def left(x):    # lane m reads x[m-1]
        return jnp.where(gl >= 1, pltpu.roll(x, 1, axis=1), INF)

    def right(x):   # lane m reads x[m+1]
        return _left_shift_1(x, gl, W, upshift)

    def step(k, c, D1, D2, parity):
        # parity-0 rows read D1[m], D1[m-1]; parity-1 read D1[m], D1[m+1]
        n = left(D1) if parity == 0 else right(D1)
        return c + jnp.minimum(jnp.minimum(D1, n), D2)

    def body(kk, carry):
        D1, D2, out = carry
        k0 = 2 * kk
        d0 = step(k0, src[:, k0, :], D1, D2, par0)
        out = jnp.where(k0 == ex, d0, out)
        d1 = step(k0 + 1, src[:, k0 + 1, :], d0, D1, 1 - par0)
        out = jnp.where(k0 + 1 == ex, d1, out)
        return d1, d0, out

    def dp(_, carry):
        _, _, prev_out = carry
        dep = jnp.where(jnp.isfinite(prev_out), prev_out, 0.0) * 0.0
        init = (D1 + dep, D2 + dep, jnp.full((G, W), INF))
        return jax.lax.fori_loop(0, n_iter, body, init)

    _, _, out = jax.lax.fori_loop(
        0, dp_repeats, dp, (D1, D2, jnp.full((G, W), INF))
    )
    out_ref[:] = out


def _pk_dma_kernel(cm_ref, ex_ref, p0_ref, out_ref, scr_ref, *, n_reads):
    """Pure input-pipeline probe: touch the whole block, ~zero compute."""
    import jax.numpy as jnp

    K = cm_ref.shape[1]
    acc = cm_ref[:, 0, :]
    step = max(1, K // max(1, n_reads))
    for k in range(step, K, step):
        acc = jnp.minimum(acc, cm_ref[:, k, :])
    out_ref[:] = acc


def _feat_dma_kernel(a_ref, b_ref, out_ref, *, n_reads):
    """Feature-block input-pipeline probe: touch both operands, no compute."""
    import jax.numpy as jnp

    R = a_ref.shape[2]
    acc = a_ref[:, :, 0:1] + b_ref[:, :, 0:1]
    step = max(1, R // max(1, n_reads))
    for r in range(step, R, step):
        acc = jnp.minimum(acc, a_ref[:, :, r : r + 1] + b_ref[:, :, r : r + 1])
    out_ref[:] = acc[:, :, 0]


def _run_packed(kernel, cm, ex, p0, pbg, interpret=False, **kw):
    """NOTE: jitted end-to-end — the first probe runs dispatched the pads
    and the pallas_call as separate EAGER ops, so each timing iteration paid
    several ~27 ms tunnel RPC floors and the numbers measured the link, not
    the kernel (159-382k "pairs/s" at every variant).  One jitted program =
    one dispatch, like the square reference path."""
    import jax

    key = tuple(sorted(kw.items()))
    return _run_packed_jit(kernel, cm, ex, p0, pbg=pbg, interpret=interpret,
                           vkey=key)


@partial(
    __import__("jax").jit,
    static_argnames=("kernel", "pbg", "interpret", "vkey"),
)
def _run_packed_jit(kernel, cm, ex, p0, *, pbg, interpret, vkey):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kw = dict(vkey)
    G, K, W = cm.shape
    pad = (-G) % pbg
    if pad:
        cm = jnp.pad(cm, ((0, pad), (0, 0), (0, 0)), constant_values=INF)
        ex = jnp.pad(ex, ((0, pad), (0, 0)), constant_values=-1)
    Gp = G + pad

    scr_k = K if kw.get("scratch_copy") else 8  # dummy-small when unused
    out = pl.pallas_call(
        partial(kernel, **kw),
        scratch_shapes=[pltpu.VMEM((pbg, scr_k, W), jnp.float32)],
        grid=(Gp // pbg,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        in_specs=[
            pl.BlockSpec((pbg, K, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pbg, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((pbg, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Gp, W), jnp.float32),
        interpret=interpret,
    )(cm, ex, p0)
    return out[:G]


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


def make_pairs(batch, dd_max, seed=0):
    import jax
    import jax.numpy as jnp

    kk = jax.random.split(jax.random.PRNGKey(seed), 4)
    a = jax.random.normal(kk[0], (batch, SEQ_LEN, LATENT_DIM), jnp.float32)
    b = jax.random.normal(kk[1], (batch, SEQ_LEN, LATENT_DIM), jnp.float32)
    la = jax.random.randint(kk[2], (batch,), SEQ_LEN // 2, SEQ_LEN + 1)
    dd = jax.random.randint(kk[3], (batch,), -dd_max, dd_max + 1)
    lb = jnp.clip(la + dd, SEQ_LEN // 2, SEQ_LEN)
    return a, b, la.astype(jnp.int32), lb.astype(jnp.int32)


def time_pipelined(fn, n_pairs, label):
    t0 = time.perf_counter()
    np.asarray(fn())
    log(f"  {label}: compile+warm {time.perf_counter() - t0:.1f}s")
    for o in [fn() for _ in range(3)]:
        np.asarray(o)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(ITERS)]
        for o in outs:
            np.asarray(o)
        best = max(best, n_pairs * ITERS / (time.perf_counter() - t0))
    log(f"  {label}: {best:,.0f} pairs/s")
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", default="all",
                    choices=["all", "rowscan", "wavefront", "square", "dma",
                             "dmafeat"])
    ap.add_argument("--ddmax", type=int, default=16)
    ap.add_argument("--pbg", type=int, default=128)
    ap.add_argument("--batch", type=int, default=32768)
    ap.add_argument("--check-only", action="store_true")
    ap.add_argument("--upshift", default="slice",
                    help="comma list: maskroll,negroll,slice,none")
    ap.add_argument("--scratch-copy", action="store_true")
    ap.add_argument("--dp-repeats", default="1",
                    help="comma list of DP repeat counts to sweep")
    ap.add_argument("--time-build", action="store_true")
    args = ap.parse_args()

    import os

    if os.environ.get("APD_FORCE_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from audio_pattern_discovery_tpu.ops.dtw_pallas import dtw_batch_pallas

    dev = jax.devices()[0]
    on_tpu = dev.platform not in ("cpu", "gpu")
    log(f"device: {dev}; probe={args.probe} ddmax={args.ddmax} "
        f"pbg={args.pbg} batch={args.batch}")

    wv_max = max(BAND, args.ddmax)
    B = args.batch
    a, b, la, lb = make_pairs(B, args.ddmax)

    # reference distances from the oracle-verified square kernel
    ref = np.asarray(
        dtw_batch_pallas(a, b, la, lb, band=BAND, max_len_diff=args.ddmax,
                         interpret=not on_tpu)
    )

    results = {}
    if args.probe == "dmafeat":
        import jax as _jax
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        at = jnp.transpose(a, (0, 2, 1))      # [B, d, S] time-minor
        bt = jnp.transpose(b, (0, 2, 1))
        np.asarray(at); np.asarray(bt)
        d = at.shape[1]
        for pbf in (128, 256, 1024):
            @partial(_jax.jit, static_argnames=("pbf",))
            def run_f(at, bt, pbf):
                return pl.pallas_call(
                    partial(_feat_dma_kernel, n_reads=8),
                    grid=(B // pbf,),
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=100 * 1024 * 1024),
                    in_specs=[
                        pl.BlockSpec((pbf, d, SEQ_LEN), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((pbf, d, SEQ_LEN), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((pbf, d), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=_jax.ShapeDtypeStruct((B, d), jnp.float32),
                )(at, bt)
            gb = (at.size + bt.size) * 4 / 1e9
            r = time_pipelined(lambda: run_f(at, bt, pbf), B,
                               f"featdma pbf={pbf}")
            log(f"  -> {gb * r / B:.2f} GB/s feature input bandwidth")
        return 0
    if args.probe == "dma":
        cm, ex, p0, lane_e, P, w_sub = build_rowscan_packed(
            a, b, la, lb, BAND, wv_max)
        np.asarray(cm)
        gb = cm.size * 4 / 1e9
        # plain-XLA read rate on the same array (layout vs pallas pipeline)
        xsum = jax.jit(jnp.sum)
        t0 = time.perf_counter()
        np.asarray(xsum(cm))
        log(f"  xla sum compile+warm {time.perf_counter() - t0:.1f}s")
        for _ in range(2):
            np.asarray(xsum(cm))
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [xsum(cm) for _ in range(ITERS)]
            for o in outs:
                np.asarray(o)
            best = max(best, gb * ITERS / (time.perf_counter() - t0))
        log(f"  xla jnp.sum read rate: {best:.2f} GB/s")
        # contiguous fresh array (rules out a pathological layout from
        # pad/transpose/reshape in the build)
        cm2 = jnp.zeros(cm.shape, jnp.float32) + 1.0
        np.asarray(cm2[0, 0, 0])
        for _ in range(2):
            np.asarray(xsum(cm2))
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [xsum(cm2) for _ in range(ITERS)]
            for o in outs:
                np.asarray(o)
            best = max(best, gb * ITERS / (time.perf_counter() - t0))
        log(f"  xla jnp.sum read rate (fresh zeros+1): {best:.2f} GB/s")
        for n_reads in (2, 16, 128):
            def run_d(n_reads=n_reads):
                return _run_packed(_pk_dma_kernel, cm, ex, p0, args.pbg,
                                   interpret=not on_tpu, n_reads=n_reads)
            r = time_pipelined(run_d, B, f"dma n_reads={n_reads}")
            log(f"  -> {gb * r / B:.2f} GB/s effective input bandwidth")
        return 0
    if args.probe in ("all", "square"):
        def run_sq():
            return dtw_batch_pallas(a, b, la, lb, band=BAND,
                                    max_len_diff=args.ddmax,
                                    interpret=not on_tpu)
        if not args.check_only:
            results["square"] = time_pipelined(run_sq, B, "square(ref)")

    if args.probe in ("all", "rowscan"):
        cm, ex, p0, lane_e, P, w_sub = build_rowscan_packed(
            a, b, la, lb, BAND, wv_max)
        np.asarray(cm)
        log(f"rowscan-packed: P={P} w_sub={w_sub} cm={cm.shape}")
        scan_steps = max(1, (2 * wv_max + 1 - 1).bit_length())

        def run_rs():
            return _run_packed(
                _pk_rowscan_kernel, cm, ex, p0, args.pbg,
                interpret=not on_tpu, rows=SEQ_LEN, scan_steps=scan_steps,
                upshift=args.upshift.split(",")[0],
                scratch_copy=args.scratch_copy)

        out = np.asarray(run_rs())
        got = out.reshape(-1)[
            (np.arange(B) // P) * 128 + lane_e
        ]
        ok = np.allclose(got, ref, rtol=1e-5, atol=1e-5)
        log(f"  rowscan parity vs square: {'OK' if ok else 'MISMATCH'} "
            f"(max abs diff {np.max(np.abs(got - ref)):.2e})")
        if not args.check_only and args.time_build:
            build = jax.jit(partial(_rowscan_cm, band=BAND, wv_max=wv_max))
            time_pipelined(lambda: build(a, b, la, lb), B, "rowscan XLA build")
        if not ok:
            bad = np.argsort(-np.abs(got - ref))[:5]
            for i in bad:
                log(f"    pair {i}: got {got[i]:.4f} ref {ref[i]:.4f} "
                    f"la={la[i]} lb={lb[i]}")
        if not args.check_only:
            for idiom in args.upshift.split(","):
                for rep in [int(x) for x in args.dp_repeats.split(",")]:
                    def run_v(idiom=idiom, rep=rep):
                        return _run_packed(
                            _pk_rowscan_kernel, cm, ex, p0, args.pbg,
                            interpret=not on_tpu, rows=SEQ_LEN,
                            scan_steps=scan_steps, upshift=idiom,
                            scratch_copy=args.scratch_copy, dp_repeats=rep)
                    results[f"rowscan:{idiom}:rep{rep}"] = time_pipelined(
                        run_v, B, f"rowscan P={P} upshift={idiom} rep={rep}")

    if args.probe in ("all", "wavefront"):
        cm, ex, p0, lane_e, P, w_sub, off = build_wavefront_packed(
            a, b, la, lb, BAND, wv_max)
        np.asarray(cm)
        log(f"wavefront-packed: P={P} w_sub={w_sub} cm={cm.shape}")
        par0 = off & 1

        def run_wf():
            return _run_packed(
                _pk_wavefront_kernel, cm, ex, p0, args.pbg,
                interpret=not on_tpu, n_iter=SEQ_LEN, par0=par0,
                upshift=args.upshift.split(",")[0],
                scratch_copy=args.scratch_copy)

        out = np.asarray(run_wf())
        got = out.reshape(-1)[(np.arange(B) // P) * 128 + lane_e]
        ok = np.allclose(got, ref, rtol=1e-5, atol=1e-5)
        log(f"  wavefront parity vs square: {'OK' if ok else 'MISMATCH'} "
            f"(max abs diff {np.max(np.abs(got - ref)):.2e})")
        if not ok:
            bad = np.argsort(-np.abs(got - ref))[:5]
            for i in bad:
                log(f"    pair {i}: got {got[i]:.4f} ref {ref[i]:.4f} "
                    f"la={la[i]} lb={lb[i]}")
        if not args.check_only:
            for idiom in args.upshift.split(","):
                for rep in [int(x) for x in args.dp_repeats.split(",")]:
                    def run_v(idiom=idiom, rep=rep):
                        return _run_packed(
                            _pk_wavefront_kernel, cm, ex, p0, args.pbg,
                            interpret=not on_tpu, n_iter=SEQ_LEN, par0=par0,
                            upshift=idiom, scratch_copy=args.scratch_copy,
                            dp_repeats=rep)
                    results[f"wavefront:{idiom}:rep{rep}"] = time_pipelined(
                        run_v, B, f"wavefront P={P} upshift={idiom} rep={rep}")
            if args.time_build:
                build = jax.jit(partial(_wavefront_cm, band=BAND, wv_max=wv_max))
                time_pipelined(lambda: build(a, b, la, lb), B,
                               "wavefront XLA build")

    if results:
        base = results.get("square")
        for k, v in results.items():
            rel = f" ({v / base:.2f}x square)" if base else ""
            log(f"RESULT {k}: {v:,.0f} pairs/s{rel}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
