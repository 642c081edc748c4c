#!/usr/bin/env python
"""Headline benchmark (BASELINE.json metric: DTW pair alignments/sec).

Workload: BASELINE config 4 shape — all-pairs banded DTW over latent
embedding sequences on a single TPU chip, measured through the round-3
all-pairs LANE-PACKED tile kernel (ops/dtw_pallas.dtw_tile_lane_pairs):
sequence tiles upload once, each (128x128)-sequence tile-pair program
computes its 16,384 pairs with 128 pairs advancing per vector row op
(pairs on lanes, banded stripe on sublanes).  That is the production path
for banded all-pairs jobs (parallel/pair_scheduler routes to it on TPU);
it supersedes the square TILE kernel (still measured on stderr), which in
turn killed the per-pair gather path's HBM ceiling (~15 GB/s observable)
— see BASELINE.md round-3 findings.  Only off-diagonal tile-pairs are
timed, so every counted pair is a distinct real pair.

Baseline: the native C++ CPU implementation (native/apd_native.cc), the
Rust-reference-equivalent single-core hot loop, measured on this machine
(the reference publishes no numbers and the mount was empty — SURVEY.md
SS0/SS7).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "vs_baseline_multicore": N, "multicore_baseline_kind": ...}
Extra per-stage detail (incl. the legacy per-pair kernel rate) on stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# Benchmark shape: 10k-sequence corpora pair up into ~50M pairs; we measure
# steady-state throughput on a representative slice of that pair stream.
SEQ_LEN = 128          # typical segment length (frames) after bucketing
LATENT_DIM = 16        # AE latent width (AutoencoderConfig.latent_dim)
BAND = 16              # Sakoe-Chiba half-width
BATCH = 32_768         # pairs per device dispatch (amortizes dispatch RPC)
TPU_ITERS = 6
PIPELINE_DEPTH = 4     # in-flight dispatches for steady-state throughput
CPU_PAIRS = 24         # enough single-core pairs to time reliably


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    import os

    backend_note = None
    if os.environ.get("APD_FORCE_CPU"):
        # The axon TPU plugin ignores JAX_PLATFORMS (it registers from
        # sitecustomize); force the CPU backend through the config instead.
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        # Outage guard: the tunnel's backend handshake has been observed to
        # hang for HOURS (BASELINE.md weather ledger).  Probe it in a
        # subprocess with a timeout — 600 s clears the worst recorded
        # NORMAL handshake (450 s) while distinguishing the outage mode —
        # and fall back to the CPU bench path rather than letting the
        # driver's round-end bench die with no JSON line at all.
        import subprocess

        probe_s = float(os.environ.get("APD_HANDSHAKE_TIMEOUT_S", "600"))
        if probe_s > 0:
            log(f"probing backend handshake (timeout {probe_s:.0f}s)...")
            try:
                t0 = time.perf_counter()
                r = subprocess.run(
                    [sys.executable, "-c",
                     "import jax; print(jax.devices()[0].platform)"],
                    capture_output=True, text=True, timeout=probe_s,
                )
                log(
                    f"handshake ok in {time.perf_counter() - t0:.1f}s "
                    f"(platform {r.stdout.strip()!r})"
                )
            except subprocess.TimeoutExpired:
                log(
                    f"backend handshake exceeded {probe_s:.0f}s — tunnel "
                    "outage mode; falling back to the CPU bench path"
                )
                backend_note = "cpu_fallback_tunnel_outage"
                import jax

                jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from audio_pattern_discovery_tpu import native
    from audio_pattern_discovery_tpu.ops.dtw_pallas import (
        dtw_batch_pallas,
        scan_len_diff_classes,
    )

    rng = np.random.default_rng(0)
    lengths_np = rng.integers(SEQ_LEN // 2, SEQ_LEN + 1, BATCH).astype(np.int32)
    # Feature VALUES never leave the host for the TPU sections: DTW has no
    # data-dependent control flow, so the device benchmark inputs are
    # jax.random-generated ON DEVICE (zero bulk upload) while the CPU
    # baseline keeps its own host arrays.  Rationale: this round observed
    # an upload-only tunnel collapse to 0.01-0.4 MB/s (RPC normal) —
    # uploading the old 536 MB per-pair batch would hang the driver's
    # round-end bench for hours in such a window (tools/tunnel_probe.py,
    # BASELINE.md round-4 weather notes).  Only lengths/indices (KBs)
    # cross host->device.
    host_pairs = 32 * CPU_PAIRS   # covers the all-cores row + CPU fallback
    a_np = rng.normal(0, 1, (host_pairs, SEQ_LEN, LATENT_DIM)).astype(np.float32)
    b_np = rng.normal(0, 1, (host_pairs, SEQ_LEN, LATENT_DIM)).astype(np.float32)
    la_np = lengths_np
    lb_np = np.roll(lengths_np, 1)

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")
    on_tpu = dev.platform not in ("cpu", "gpu")

    def build_parts():
        # Group pairs by their |la-lb| scan-plan class, exactly as the
        # legacy per-pair scheduler does
        # (parallel/pair_scheduler.enumerate_pair_blocks).  Only built on
        # the TPU path; pair features are device-generated and gathered
        # on device (upload = the two length vectors).
        classes = scan_len_diff_classes(SEQ_LEN, BAND, True)
        dd = np.abs(la_np - lb_np)
        cls = np.searchsorted(np.asarray(classes), dd)
        kk = jax.random.split(jax.random.PRNGKey(0), 2)
        A = jax.random.normal(kk[0], (BATCH, SEQ_LEN, LATENT_DIM),
                              jnp.float32)
        Bm = jax.random.normal(kk[1], (BATCH, SEQ_LEN, LATENT_DIM),
                               jnp.float32)
        la_d = jnp.asarray(la_np)
        lb_d = jnp.asarray(lb_np)
        parts = []
        for c, bound in enumerate(classes):
            idx = np.nonzero(cls == c)[0]
            if len(idx):
                ix = jnp.asarray(idx, jnp.int32)
                parts.append(
                    (
                        int(bound),
                        A[ix], Bm[ix], la_d[ix], lb_d[ix],
                    )
                )
        for _, pa, *_ in parts:
            np.asarray(pa[0, 0, 0])      # materialize gathers, then free A/B
        log(
            "scan classes: "
            + ", ".join(f"dd<={b}: {p[3].shape[0]} pairs" for (b, *p) in parts)
        )
        return parts

    # NOTE: on the remote-relay TPU backend jax.block_until_ready can return
    # before the computation finishes; np.asarray() materialization is the
    # only honest sync barrier (utils/timer.py).
    def drain(outs):
        for o in outs:
            np.asarray(o)

    if on_tpu:
        # ---- legacy per-pair kernel rate (stderr continuity metric) -----
        parts = build_parts()

        def run():
            return [
                dtw_batch_pallas(
                    pa, pb, pla, plb, band=BAND, normalize="path_len",
                    max_len_diff=bound,
                )
                for bound, pa, pb, pla, plb in parts
            ]

        t0 = time.perf_counter()
        drain(run())  # compile + warm
        log(f"per-pair kernel compile+warm: {time.perf_counter() - t0:.1f}s")
        outs = [run() for _ in range(PIPELINE_DEPTH)]
        for o in outs:
            drain(o)
        t0 = time.perf_counter()
        outs = [run() for _ in range(TPU_ITERS)]
        for o in outs:
            drain(o)
        legacy = BATCH * TPU_ITERS / (time.perf_counter() - t0)
        log(f"legacy per-pair square kernel: {legacy:,.0f} pairs/s "
            "(HBM-bound at ~16 KB/pair; BASELINE.md round-3)")

        # ---- headline: all-pairs TILE kernel (production path) ----------
        from audio_pattern_discovery_tpu.ops.dtw_pallas import (
            dtw_tile_pairs,
            tile_geometry,
        )

        ti, su, sv = tile_geometry(SEQ_LEN)
        nT = 17
        K = nT * ti                       # corpus slice: 17 tiles
        rng2 = np.random.default_rng(1)
        lens_np = rng2.integers(SEQ_LEN // 2, SEQ_LEN + 1, K).astype(np.int32)
        # Mirror the production tiled scheduler: sequences sorted by length
        # so each tile-pair dispatch gets a tight static DP row count and
        # banded scan depth (2x2 classes).  Features are device-generated
        # (iid values — "permuting" them is a no-op distributionally, and
        # DTW throughput is value-independent); only the sorted lengths
        # upload (zero-bulk-upload rationale above).
        perm = np.argsort(lens_np, kind="stable")
        feats = jax.random.normal(
            jax.random.PRNGKey(1), (K, SEQ_LEN, LATENT_DIM), jnp.float32
        )
        lens_s = lens_np[perm]
        lens = jnp.asarray(lens_s)
        from audio_pattern_discovery_tpu.parallel.pair_scheduler import (
            make_tile_pair_class_fn,
        )

        pair_class = make_tile_pair_class_fn(
            lens_s, nT, ti, SEQ_LEN, BAND, True
        )
        # Off-diagonal tile-pairs only (every computed pair is distinct),
        # sampled with a stride across the whole upper triangle so the
        # rows/scan class mix matches the full all-pairs job — the first-N
        # prefix would be all short-A-tile (rows=96) pairs and overstate
        # the rate.
        all_pairs = [(i, j) for i in range(nT) for j in range(i + 1, nT)]
        stride = max(1, len(all_pairs) // 64)
        pairs = all_pairs[::stride][:64]
        # The production scheduler merges thin classes before dispatch, so
        # label pairs with the classes that merge pass would produce for
        # THIS corpus's full tile-pair population (merging only the 64
        # sampled pairs' map would over-merge: per-class counts in a
        # sample are not the population's) — the headline then measures
        # the SHIPPED program shapes.
        from audio_pattern_discovery_tpu.parallel.pair_scheduler import (
            _merge_thin_classes,
        )

        all_by: dict = {}
        for i, j in all_pairs:
            all_by.setdefault(pair_class(i, j), []).append((i, j))
        _merge_thin_classes(all_by)
        cls_of = {p: c for c, ps in all_by.items() for p in ps}
        groups: dict = {}
        for p in pairs:
            groups.setdefault(cls_of[p], []).append(p)
        tparts = [
            (
                rows_cls, scan_cls,
                jnp.asarray(np.array([p[0] for p in ps], np.int32)),
                jnp.asarray(np.array([p[1] for p in ps], np.int32)),
            )
            for (rows_cls, scan_cls), ps in sorted(groups.items())
        ]
        log("tile classes: " + ", ".join(
            f"rows={r} scan={sc}: {len(ii)} tile-pairs"
            for r, sc, ii, jjj in tparts
        ))
        tile_pairs_n = len(pairs) * ti * ti

        def trun():
            return [
                dtw_tile_pairs(
                    feats, lens, ii, jjc, ti=ti, su=su, sv=sv, band=BAND,
                    rows=rows_cls, scan_steps=scan_cls,
                )
                for rows_cls, scan_cls, ii, jjc in tparts
            ]

        def tdrain(outs):
            for o in outs:
                np.asarray(o)

        t0 = time.perf_counter()
        tdrain(trun())
        log(f"tile kernel compile+warm: {time.perf_counter() - t0:.1f}s")
        outs = [trun() for _ in range(2)]
        for o in outs:
            tdrain(o)
        windows = []
        for w in range(3):
            t0 = time.perf_counter()
            outs = [trun() for _ in range(TPU_ITERS)]
            for o in outs:
                tdrain(o)
            windows.append((time.perf_counter() - t0) / TPU_ITERS)
        log(
            "square tile kernel pipelined windows: "
            + ", ".join(f"{tile_pairs_n / w:,.0f}" for w in windows)
            + " pairs/s (superseded comparison)"
        )

        # ---- headline: LANE-PACKED tile kernel (production path) --------
        from audio_pattern_discovery_tpu.ops.dtw_pallas import (
            dtw_tile_lane_pairs,
        )
        from audio_pattern_discovery_tpu.parallel.pair_scheduler import (
            _ws_level,
            make_tile_stripe_class_fn,
        )

        lane_class = make_tile_stripe_class_fn(
            lens_s, nT, ti, SEQ_LEN, BAND, True, K, level_fn=_ws_level
        )
        lane_by: dict = {}
        for i, j in all_pairs:
            lane_by.setdefault(lane_class(i, j), []).append((i, j))
        _merge_thin_classes(lane_by)
        lcls_of = {p: c for c, ps in lane_by.items() for p in ps}
        lgroups: dict = {}
        for p in pairs:
            lgroups.setdefault(lcls_of[p], []).append(p)
        lparts = [
            (
                rows_cls, wv_cls,
                jnp.asarray(np.array([p[0] for p in ps], np.int32)),
                jnp.asarray(np.array([p[1] for p in ps], np.int32)),
            )
            for (rows_cls, wv_cls), ps in sorted(lgroups.items())
        ]
        log("lane classes: " + ", ".join(
            f"rows={r} wv={wv}: {len(ii)} tile-pairs"
            for r, wv, ii, jjj in lparts
        ))

        def lrun():
            return [
                dtw_tile_lane_pairs(
                    feats, lens, ii, jjc, ti=ti, band=BAND, wv_max=wv_cls,
                    rows=rows_cls,
                )
                for rows_cls, wv_cls, ii, jjc in lparts
            ]

        t0 = time.perf_counter()
        tdrain(lrun())
        log(f"lane kernel compile+warm: {time.perf_counter() - t0:.1f}s")
        outs = [lrun() for _ in range(2)]
        for o in outs:
            tdrain(o)
        windows = []
        for w in range(3):
            t0 = time.perf_counter()
            outs = [lrun() for _ in range(TPU_ITERS)]
            for o in outs:
                tdrain(o)
            windows.append((time.perf_counter() - t0) / TPU_ITERS)
        log(
            "widen-mode lane kernel pipelined windows: "
            + ", ".join(f"{tile_pairs_n / w:,.0f}" for w in windows)
            + " pairs/s (band_mode=widen comparison)"
        )

        # ---- headline: DIAG-corridor lane kernel (production path) ------
        # band_mode="diag" is the DTWConfig default since round 4: the
        # scaled corridor keeps every class's stripe at O(band * ratio)
        # sublanes instead of O(|la-lb|), collapsing the wide wv classes
        # that dominated the widen-mode device time (BASELINE.md round-4).
        from audio_pattern_discovery_tpu.config import DTWConfig
        from audio_pattern_discovery_tpu.ops.dtw_pallas import (
            dtw_tile_lane_diag_pairs,
            effective_lane_stack,
            tile_rep_lengths,
        )
        from audio_pattern_discovery_tpu.parallel.pair_scheduler import (
            make_tile_lane_diag_class_fn,
        )

        # Chain-interleave stack: the bench measures whatever the config
        # DEFAULT ships (bitwise-stable knob; APD_BENCH_STACK overrides
        # for A/B sweeps without touching the config).
        stack = effective_lane_stack(
            int(os.environ.get("APD_BENCH_STACK", DTWConfig().lane_stack)),
            SEQ_LEN, LATENT_DIM,
        )

        diag_class = make_tile_lane_diag_class_fn(
            lens_s, nT, ti, SEQ_LEN, BAND, K
        )
        rep = jnp.asarray(tile_rep_lengths(lens_s, nT, ti, K))
        diag_by: dict = {}
        # Production orientation (round 4): LONG side on rows — the
        # corridor half-width is then exactly `band` for every pair, so
        # the wide-wv classes collapse to the equal-length stripe
        # (pair_scheduler.all_pairs_distances_tiled, orientation comment).
        for i, j in all_pairs:
            diag_by.setdefault(diag_class(j, i), []).append((j, i))
        _merge_thin_classes(diag_by)
        dcls_of = {p: c for c, ps in diag_by.items() for p in ps}
        dgroups: dict = {}
        for p in pairs:
            q = (p[1], p[0])          # same sampled mix, swapped orientation
            dgroups.setdefault(dcls_of[q], []).append(q)
        dparts = [
            (
                cls,
                jnp.asarray(np.array([p[0] for p in ps], np.int32)),
                jnp.asarray(np.array([p[1] for p in ps], np.int32)),
            )
            for cls, ps in sorted(dgroups.items())
        ]
        log("diag lane classes: " + ", ".join(
            f"rows={c[0]} wv={c[1]}: {len(ii)} tile-pairs"
            for c, ii, jjj in dparts
        ) + f"; stack={stack}")

        def drun():
            return [
                dtw_tile_lane_diag_pairs(
                    feats, lens, rep, ii, jjc, ti=ti, band=BAND,
                    wv_max=cls[1], rows=cls[0], stack=stack,
                    kmax=(cls[2] if len(cls) > 2 else 1),
                )
                for cls, ii, jjc in dparts
            ]

        t0 = time.perf_counter()
        tdrain(drun())
        log(f"diag lane kernel compile+warm: {time.perf_counter() - t0:.1f}s")
        outs = [drun() for _ in range(2)]
        for o in outs:
            tdrain(o)
        windows = []
        # 6 windows (vs 3 for the comparison rows): this is the metric of
        # record, and tunnel weather moves 2-3x within a single process's
        # lifetime (BASELINE.md round-4 bench notes) — more windows = a
        # better chance one lands device-bound.  ~9 s extra in a healthy
        # window.
        for w in range(6):
            t0 = time.perf_counter()
            outs = [drun() for _ in range(TPU_ITERS)]
            for o in outs:
                tdrain(o)
            windows.append((time.perf_counter() - t0) / TPU_ITERS)
        log(
            "diag lane kernel pipelined windows: "
            + ", ".join(f"{tile_pairs_n / w:,.0f}" for w in windows)
            + " pairs/s (reporting best)"
        )
        device_s = min(windows)
        # Median of the same 6 windows: the headline takes best-of-6 while
        # every comparison row takes best-of-3 (the asymmetry VERDICT r4
        # flagged); reporting the median alongside keeps `value` comparable
        # across rounds while making the window spread part of the record.
        headline_median_s = sorted(windows)[len(windows) // 2]
        BATCH_EFF = tile_pairs_n
    else:
        # No TPU (debug run): fall back to the scan wavefront, still on-device.
        from audio_pattern_discovery_tpu.ops.dtw import dtw_batch

        small = min(512, host_pairs)
        args = (
            jnp.asarray(a_np[:small]),
            jnp.asarray(b_np[:small]),
            jnp.asarray(la_np[:small]),
            jnp.asarray(lb_np[:small]),
        )
        np.asarray(
            dtw_batch(*args, band=BAND, normalize="path_len", band_mode="diag")
        )
        t0 = time.perf_counter()
        np.asarray(
            dtw_batch(*args, band=BAND, normalize="path_len", band_mode="diag")
        )
        device_s = (time.perf_counter() - t0) * (BATCH / small)
        headline_median_s = device_s
        BATCH_EFF = BATCH

    tpu_pairs_per_sec = BATCH_EFF / device_s
    log(f"device DTW: {tpu_pairs_per_sec:,.0f} pairs/s ({device_s * 1e3:.1f} ms/batch)")

    # ---- secondary metric: spectrogram frames/sec per chip (stderr) -------
    # Measured the way the discovery pipeline runs it: the streaming tile
    # path (spectrogram_corpus) over int16 clips with its dispatch pipeline,
    # including host tile assembly — best of 3 passes (steady state), not a
    # single synchronized dispatch.
    if on_tpu:
        # The streaming spectrogram metric INCLUDES its 21 MB of int16
        # uploads by design (that is the production stage).  Gate it on a
        # 2 MB upload probe: in the observed upload-only collapse windows
        # (0.01-0.4 MB/s while dispatch RPC stays ~27 ms) the section
        # would stall the driver's round-end bench for tens of minutes for
        # a stderr-only metric.
        t0 = time.perf_counter()
        np.asarray(jnp.asarray(np.zeros(512 * 1024, np.float32))[:1])
        up_mb_s = 2.0 / max(time.perf_counter() - t0, 1e-9)
        log(f"upload probe: {up_mb_s:.1f} MB/s")
    if on_tpu and up_mb_s < 1.0:
        log(
            "upload path degraded (< 1 MB/s): skipping the streaming "
            "spectrogram metric this run (weather, not regression — "
            "tools/tunnel_probe.py / BASELINE.md round-4 weather notes)"
        )
    elif on_tpu:
        from audio_pattern_discovery_tpu.config import SpectrogramConfig
        from audio_pattern_discovery_tpu.ops.spectrogram import spectrogram_corpus

        sp_cfg = SpectrogramConfig()
        SP_B, SP_SEC = 8, 30                  # 8 thirty-second 44.1 kHz clips
        sp_sigs = [
            (rng.normal(0, 0.1, SP_SEC * 44_100) * 3276.8)
            .clip(-32768, 32767)
            .astype(np.int16)
            for _ in range(SP_B)
        ]
        sp_scales = np.ones(SP_B, np.float32)

        def sp_run():
            # Device-resident output — the production path for corpora under
            # the HBM budget (the pipeline consumes spectrograms on-device;
            # no [B, F, bins] download).  The scalar materialization is the
            # honest sync barrier: it cannot resolve until every tile ran.
            specs_dev, fc, _ = spectrogram_corpus(
                sp_sigs, sp_cfg, scales=sp_scales, return_device=True
            )
            np.asarray(specs_dev[:, -1, 0])
            return fc

        sp_run()  # compile + warm
        sp_best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            fc = sp_run()
            sp_best = max(sp_best, int(fc.sum()) / (time.perf_counter() - t0))
        log(
            f"spectrogram: {sp_best:,.0f} frames/s per chip "
            f"(streaming int16 tiles, device-resident, {int(fc.sum())} "
            "frames, best of 3)"
        )

    # ---- CPU baseline: native C++ (Rust-equivalent) ----------------------
    # Two rows bracket the "Rust CPU baseline" interpretation (SURVEY.md SS3
    # row 6 flags the reference as possibly rayon-parallel): single-core is
    # the metric of record for vs_baseline; the all-cores row is measured and
    # logged so the headline multiple can be stated against both.
    mt_pairs_per_sec = None
    ncores = 1
    if native.available():
        import os

        sl = slice(0, CPU_PAIRS)
        native.dtw_batch_cpu(  # warm
            a_np[sl], b_np[sl], la_np[sl], lb_np[sl],
            band=BAND, normalize="path_len", n_threads=1, band_mode="diag",
        )
        # Best of 3: the shared host vCPU throttles 3-10x in bad windows
        # (measured 4.4k-18k pairs/s for identical work across one day);
        # best-of-3 keeps vs_baseline from swinging with the weather.
        cpu_s = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            native.dtw_batch_cpu(
                a_np[sl], b_np[sl], la_np[sl], lb_np[sl],
                band=BAND, normalize="path_len", n_threads=1,
                band_mode="diag",
            )
            cpu_s = min(cpu_s, time.perf_counter() - t0)
        cpu_pairs_per_sec = CPU_PAIRS / cpu_s
        log(f"CPU baseline (1 core C++, best of 3): "
            f"{cpu_pairs_per_sec:,.0f} pairs/s")

        ncores = len(os.sched_getaffinity(0)) or os.cpu_count() or 1
        if ncores > 1:
            mt_pairs = min(host_pairs, CPU_PAIRS * ncores)
            slm = slice(0, mt_pairs)
            native.dtw_batch_cpu(  # warm (thread pool spin-up)
                a_np[slm], b_np[slm], la_np[slm], lb_np[slm],
                band=BAND, normalize="path_len", n_threads=0,
                band_mode="diag",
            )
            t0 = time.perf_counter()
            native.dtw_batch_cpu(
                a_np[slm], b_np[slm], la_np[slm], lb_np[slm],
                band=BAND, normalize="path_len", n_threads=0,
                band_mode="diag",
            )
            mt_pairs_per_sec = mt_pairs / (time.perf_counter() - t0)
            log(
                f"CPU baseline ({ncores} cores C++): {mt_pairs_per_sec:,.0f}"
                f" pairs/s -> single chip = "
                f"{tpu_pairs_per_sec / mt_pairs_per_sec:.1f}x all-cores, "
                f"{tpu_pairs_per_sec / cpu_pairs_per_sec:.1f}x 1-core"
            )
        else:
            # This host exposes ONE core, so the rayon-parallel reading of
            # the "Rust CPU baseline" cannot be measured here; state the
            # bracket arithmetically (linear scaling is rayon's best case).
            for hypo in (16, 32):
                proj = cpu_pairs_per_sec * hypo
                log(
                    f"CPU baseline ({hypo}-core projection, linear scaling): "
                    f"{proj:,.0f} pairs/s -> single chip = "
                    f"{tpu_pairs_per_sec / proj:.1f}x, v5e-8 = "
                    f"{8 * tpu_pairs_per_sec / proj:.1f}x"
                )
    else:
        log("native library unavailable; using recorded baseline")
        cpu_pairs_per_sec = 50_000.0  # conservative single-core estimate

    vs_baseline = tpu_pairs_per_sec / cpu_pairs_per_sec
    # Self-describing multicore reading (VERDICT r2 weak #3): the metric of
    # record is vs 1 core; the rayon-parallel interpretation of the Rust
    # baseline is MEASURED when this host exposes >1 core, else stated as the
    # 32-core linear projection (rayon's best case) so the JSON line carries
    # both readings rather than only the flattering one.
    if mt_pairs_per_sec is not None:
        vs_multi = tpu_pairs_per_sec / mt_pairs_per_sec
        multi_kind = f"measured_{ncores}_cores"
    else:
        vs_multi = tpu_pairs_per_sec / (cpu_pairs_per_sec * 32)
        multi_kind = "projected_32_cores_linear"
    # 3 significant digits, not 2 decimals: the ratios span ~1e-4 (CPU
    # fallback path, where the jnp scan is slower than the C++ core) to
    # ~1e2 (TPU), and a fixed decimal rounding collapses the small end to
    # a dishonest 0.0.
    sig3 = lambda v: float(f"{v:.3g}")
    line = {
        "metric": "banded_dtw_pair_alignments_per_sec",
        "value": round(tpu_pairs_per_sec, 1),
        "value_median": round(BATCH_EFF / headline_median_s, 1),
        "unit": "pairs/s",
        "vs_baseline": sig3(vs_baseline),
        "vs_baseline_multicore": sig3(vs_multi),
        "multicore_baseline_kind": multi_kind,
    }
    if backend_note:
        # The number above is NOT a TPU measurement — make the record
        # self-describing rather than silently reporting a CPU rate.
        line["backend"] = backend_note
    print(json.dumps(line))
    return 0


if __name__ == "__main__":
    sys.exit(main())
