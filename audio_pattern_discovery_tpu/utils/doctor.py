"""Environment diagnostics: `python -m audio_pattern_discovery_tpu --doctor`.

The production backend here is a TPU behind a remote tunnel whose observed
behavior swings enormously between windows (per-process handshake 8-450 s,
~27 ms dispatch RPC floor, HBM path measured 3-46x below the datasheet —
BASELINE.md round-3 measurements).  When a run is slow, the first question
is "weather or regression?"; the doctor measures the live values of exactly
the quantities the pipeline's performance model depends on so the answer
takes one command instead of a profiling session.

Every probe is individually guarded: a dead backend or missing native lib
degrades that one entry to an "error" string, never the whole report.
"""

from __future__ import annotations

import os
import time


def _guard(fn):
    try:
        return fn()
    except Exception as e:  # noqa: BLE001 - diagnostics must never crash
        return {"error": f"{type(e).__name__}: {e}"}


def _versions() -> dict:
    import jax
    import jaxlib
    import numpy

    import audio_pattern_discovery_tpu as apd

    return {
        "audio_pattern_discovery_tpu": apd.__version__,
        "jax": jax.__version__,
        "jaxlib": jaxlib.__version__,
        "numpy": numpy.__version__,
    }


def _host() -> dict:
    info: dict = {"cpus": os.cpu_count()}
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    info["mem_total_gb"] = round(
                        int(line.split()[1]) / 1024**2, 1
                    )
                    break
    except OSError:
        pass
    return info


def _native() -> dict:
    from audio_pattern_discovery_tpu import native

    return {"available": native.available()}


def _compile_cache() -> dict:
    import jax

    cache_dir = jax.config.jax_compilation_cache_dir
    out: dict = {"dir": cache_dir}
    if cache_dir and os.path.isdir(cache_dir):
        entries = [
            os.path.join(cache_dir, n) for n in os.listdir(cache_dir)
        ]
        files = [p for p in entries if os.path.isfile(p)]
        out["entries"] = len(files)
        out["bytes"] = sum(os.path.getsize(p) for p in files)
    else:
        out["entries"] = 0
    return out


def _device_probes(hbm_mb: int) -> dict:
    """Backend handshake + the two tunnel-weather numbers that matter.

    dispatch_floor_ms: round-trip of a trivially small jitted program —
    the per-dispatch RPC cost every block dispatch pays (healthy ~27 ms
    through the tunnel, microseconds on local backends).
    hbm_gbps: streaming bandwidth of a jitted x+1 over a `hbm_mb`-MB f32
    array (read + write counted) — the observable HBM path; the all-pairs
    DTW design is sized against this number (BASELINE.md round 3).
    Results come to host via np.asarray, the honest sync barrier on the
    remote-relay backend (utils/timer.py).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    out: dict = {}
    t0 = time.perf_counter()
    devices = jax.devices()
    out["handshake_s"] = round(time.perf_counter() - t0, 3)
    out["platform"] = devices[0].platform
    out["n_devices"] = len(devices)
    out["device_kind"] = getattr(devices[0], "device_kind", "?")

    tiny = jax.jit(lambda x: x + 1.0)
    np.asarray(tiny(jnp.float32(0.0)))  # compile + warm
    reps = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(tiny(jnp.float32(0.0)))
        reps.append(time.perf_counter() - t0)
    out["dispatch_floor_ms"] = round(min(reps) * 1e3, 2)

    n = hbm_mb * 1024 * 1024 // 4
    x = jnp.arange(n, dtype=jnp.float32)
    big = jax.jit(lambda x: x + 1.0)
    np.asarray(big(x)[:1])  # compile + warm (slice keeps the pull tiny)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        y = big(x)
        np.asarray(y[:1])
        best = min(best, time.perf_counter() - t0)
    out["hbm_gbps"] = round(2 * n * 4 / best / 1e9, 2)
    out["hbm_probe_mb"] = hbm_mb

    # Host->device upload bandwidth: the third independent weather axis —
    # measured collapsing to 0.08 MB/s while dispatch RPC stayed a healthy
    # 27 ms (2026-08-19) — and the one that bounds the config-5 spectrogram
    # stage and any fresh-corpus DTW job.  8 MB keeps the probe ~1 s when
    # healthy and ~2 min in the worst observed window.
    up = np.empty(2 * 1024 * 1024, np.float32)
    t0 = time.perf_counter()
    xd = jnp.asarray(up)
    np.asarray(xd[:1])
    out["upload_mb_s"] = round(up.nbytes / 2**20 / (time.perf_counter() - t0), 2)
    return out


def run_doctor(probe_device: bool = True, hbm_mb: int = 64) -> dict:
    """Collect the full diagnostic report as a JSON-serializable dict."""
    report = {
        "versions": _guard(_versions),
        "host": _guard(_host),
        "native_lib": _guard(_native),
        "compile_cache": _guard(_compile_cache),
        "env": {
            k: os.environ[k]
            for k in ("APD_FORCE_CPU", "APD_TPU_TESTS", "JAX_PLATFORMS",
                      "APD_NO_COMPILE_CACHE", "APD_COMPILE_CACHE_DIR")
            if k in os.environ
        },
    }
    if probe_device:
        report["device"] = _guard(lambda: _device_probes(hbm_mb))
    return report
