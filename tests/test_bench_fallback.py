"""bench.py must never die off-TPU (VERDICT r2 weak #1).

The driver runs `python bench.py` every round; its non-TPU fallback path is
exercised here as a subprocess under APD_FORCE_CPU=1 so a regression (the
round-2 NameError) can never reach the driver.  The JSON contract — ONE line
on stdout with the metric/value/vs_baseline fields — is asserted too.
"""

import json
import os
import pathlib
import subprocess

import pytest
import sys

REPO_ROOT = str(pathlib.Path(__file__).resolve().parents[1])


@pytest.mark.full
def test_bench_cpu_fallback_prints_json_line():
    env = {**os.environ, "APD_FORCE_CPU": "1"}
    r = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True,
        text=True,
        cwd=REPO_ROOT,
        env=env,
        # generous: the host has ONE core, so any concurrent process (a
        # TPU bench's host side, another suite) stretches this subprocess
        timeout=900,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected ONE json line on stdout, got: {r.stdout!r}"
    rec = json.loads(lines[0])
    assert rec["metric"] == "banded_dtw_pair_alignments_per_sec"
    assert rec["unit"] == "pairs/s"
    assert rec["value"] > 0
    assert rec["value_median"] > 0
    assert rec["value_median"] <= rec["value"] * 1.001  # best >= median
    assert rec["vs_baseline"] > 0
    # Round-3 addition: the multicore reading is self-describing.
    assert rec["vs_baseline_multicore"] > 0
    assert rec["multicore_baseline_kind"].startswith(("measured", "projected"))
