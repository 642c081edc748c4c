#!/usr/bin/env python
"""One-shot tunnel weather probe: handshake, upload bandwidth, dispatch RPC
floor.  Used to decide when to run the upload-heavy benches (K=40k strip
job needs ~330 MB up; BASELINE.md round-3/4 weather ledgers).

Usage: python tools/tunnel_probe.py [MB]   (default 24)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    mb = float(sys.argv[1]) if len(sys.argv) > 1 else 24.0
    t0 = time.perf_counter()
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"handshake: {time.perf_counter() - t0:.1f}s ({dev})",
          file=sys.stderr)

    x = np.random.default_rng(0).normal(0, 1, (int(mb * 262144),)).astype(
        np.float32
    )
    t0 = time.perf_counter()
    xd = jnp.asarray(x)
    np.asarray(xd[0])
    up = time.perf_counter() - t0
    print(f"upload: {mb:.0f} MB in {up:.1f}s = {mb / up:.1f} MB/s",
          file=sys.stderr)

    f = jax.jit(lambda v: v[:8] + 1.0)
    np.asarray(f(xd))
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        np.asarray(f(xd))
    rpc = (time.perf_counter() - t0) / n * 1e3
    print(f"dispatch round-trip: {rpc:.1f} ms", file=sys.stderr)
    print(f'{{"up_mb_s": {mb / up:.2f}, "rpc_ms": {rpc:.1f}}}')
    return 0


if __name__ == "__main__":
    sys.exit(main())
