"""Importing the package must never initialize a JAX backend.

A module-scope jnp scalar (e.g. ``INF = jnp.float32(...)``) constructs a
device array at import time, which initializes the default backend — on the
tunneled TPU that is a handshake (8 s to hours during outages) paid BEFORE
the CLI's APD_FORCE_CPU handling can force the CPU platform.  Found live:
a ~3 h backend outage turned every ``import audio_pattern_discovery_tpu.cli``
into a hang (BASELINE.md round-3 weather ledger)."""

import subprocess
import sys


def test_package_import_initializes_no_backend():
    code = (
        "import audio_pattern_discovery_tpu.cli\n"
        "import audio_pattern_discovery_tpu.pipeline\n"
        "import audio_pattern_discovery_tpu.query\n"
        "from jax._src import xla_bridge\n"
        "assert not xla_bridge._backends, (\n"
        "    'package import initialized JAX backend(s): '\n"
        "    + str(list(xla_bridge._backends))\n"
        ")\n"
        "print('clean')\n"
    )
    # A fresh interpreter (the suite's own process already has a backend);
    # JAX_PLATFORMS=cpu keeps the check meaningful even if a regression
    # sneaks in — the failure mode asserted is 'a backend exists at all',
    # not 'the TPU was touched'.
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=240,
    )
    assert out.returncode == 0, out.stderr
    assert "clean" in out.stdout
