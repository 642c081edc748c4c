"""audio_pattern_discovery_tpu: TPU-native audio pattern discovery.

A brand-new JAX/XLA/Pallas framework with the capabilities of
dkohlsdorf/audio_pattern_discovery (Rust, CPU): unsupervised discovery of
recurring patterns in collections of audio recordings.  Public entry point
(preserved from the reference, BASELINE.json north_star): a directory of WAV
files in -> discovered pattern clusters + DTW alignments out.

See SURVEY.md for the structural analysis (and its SS0 provenance caveat:
the reference mount was empty at survey time, so reference citations are to
the driver-authored capability spec, not file:line).
"""

__version__ = "0.1.0"

import os as _os


def _enable_compilation_cache() -> None:
    """Point JAX at a persistent on-disk compilation cache.

    Each CLI invocation is a fresh process; without this every run repays
    the full XLA compile cost (~2-3 min on the TPU tunnel) for identical
    programs.  Opt out with APD_NO_COMPILE_CACHE=1.
    """
    if _os.environ.get("APD_NO_COMPILE_CACHE"):
        return
    import jax

    # Scope the cache by a host-CPU fingerprint: XLA:CPU AOT entries embed
    # the compile machine's feature set, and the driver may run each round
    # on a different host — reusing another machine's entries floods stderr
    # with "could lead to execution errors such as SIGILL" warnings (and
    # risks exactly that).  A per-machine subdir self-heals on migration;
    # TPU entries are machine-independent but cheap to rebuild once.
    def _machine_tag() -> str:
        import hashlib

        try:
            # flags alone are too weak (same-family cloud VMs share them
            # while LLVM's tuning detection differs, which still trips the
            # AOT feature check); include the model name too.
            sig = []
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith(("flags", "model name")):
                        sig.append(line)
                        if len(sig) == 2:
                            break
            if sig:
                return hashlib.sha1("".join(sorted(sig)).encode()).hexdigest()[:12]
        except OSError:
            pass
        import platform

        return platform.machine() or "unknown"

    # CPU-context processes (tests, dryrun, APD_FORCE_CPU tools) skip the
    # persistent cache entirely: this jaxlib's XLA:CPU AOT loader compares
    # an entry's compile features (which include XLA-added tuning flags
    # like +prefer-no-scatter) against raw host detection, so RELOADING
    # even a same-process-written entry floods stderr with "could lead to
    # execution errors such as SIGILL" warnings — neither cpuinfo- nor
    # boot-scoping can fix that (review round 3: warnings observed from a
    # boot-scoped dir's own entries, and live migration preserves
    # boot_id anyway).  CPU compiles here are sub-second; TPU compiles
    # are minutes over the tunnel, so TPU contexts keep the stable
    # machine-tagged cache.  APD_TPU_TESTS=1 overrides the CPU signals:
    # tests/conftest.py exports JAX_PLATFORMS=cpu unconditionally, but
    # the axon plugin ignores it and the real-TPU suite must not lose
    # its cache.  An explicit APD_COMPILE_CACHE_DIR always wins.
    cpu_ctx = (
        bool(_os.environ.get("APD_FORCE_CPU"))
        or _os.environ.get("JAX_PLATFORMS", "").startswith("cpu")
    ) and _os.environ.get("APD_TPU_TESTS") != "1"
    if cpu_ctx and not _os.environ.get("APD_COMPILE_CACHE_DIR"):
        return
    cache_dir = _os.environ.get(
        "APD_COMPILE_CACHE_DIR",
        _os.path.join(
            _os.path.expanduser("~"), ".cache", "apd_jax_cache", _machine_tag()
        ),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - older jax without these flags
        pass


_enable_compilation_cache()

from audio_pattern_discovery_tpu.config import PipelineConfig  # noqa: F401
