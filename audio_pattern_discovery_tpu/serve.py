"""Warm-process serving: a long-lived worker that holds the initialized
backend and its compiled executables, and serves discovery / update /
query / doctor requests over a Unix-domain socket.

Why this exists (measured on this backend, BASELINE.md round-3): a fresh
process pays a TPU handshake of 8-450 s (outages: hours) plus ~3-16 s of
per-executable activation (compile-cache deserialization + first-dispatch
program shipping) — fixed costs that dwarf the steady-state stage times
(AE train 1.5-1.7 s, contract-scale DTW ~25 s).  Batch jobs amortize them;
interactive or repeated small jobs (index a corpus, then query it many
times; nightly --update runs) repay them per invocation.  The serve loop
pays them ONCE per process lifetime: requests after the first reuse every
live executable, so a warm query costs its compute, not the backend tax.

This is the reference-shaped production analogue of SURVEY.md SS6
(metrics/observability, failure handling): the reference is a one-shot
CLI (SURVEY SS2 L5); on a backend with per-process costs this steep, a
resident worker IS the TPU-native equivalent of "run the binary again".

Protocol — newline-delimited JSON, one request per connection:

    client connects -> sends one JSON object + "\n" -> reads one JSON
    line back -> connection closes.

Requests (all fields beyond "cmd" optional unless noted):

    {"cmd": "ping"}
    {"cmd": "doctor", "probe_device": false}
    {"cmd": "discover", "wav_dir": ..., "out_dir": ...,
     "config": {...full config dict...}, "overrides": {"dtw.band": 32},
     "update": true}
    {"cmd": "query", "out_dir": ..., "wavs": [...], "top_k": 10,
     "config": {...}, "overrides": {...}}
    {"cmd": "shutdown"}

Responses: {"ok": true, "result": ...} or {"ok": false, "error": "...",
"traceback": "..."}.  Requests are served strictly one at a time — this
backend must never run two device jobs concurrently (CLAUDE.md), and the
serial loop makes that a protocol guarantee rather than an operator rule.
"""

from __future__ import annotations

import json
import os
import socket
import traceback
from pathlib import Path
from typing import Any

from audio_pattern_discovery_tpu.config import PipelineConfig
from audio_pattern_discovery_tpu.utils.logging import get_logger

# Generous per-line cap: a query report over a huge index is megabytes,
# not gigabytes; anything larger indicates a protocol error, and an
# unbounded readline would let a bad client exhaust host memory.
_MAX_LINE_BYTES = 256 << 20


def _request_config(req: dict, default: PipelineConfig) -> PipelineConfig:
    """Resolve the effective config for one request.

    Precedence: request "config" (a full to_dict() tree) replaces the
    server default; request "overrides" (dotted keys) then apply on top.
    Both optional — an empty request runs the server's default config.
    """
    cfg = (
        PipelineConfig.from_dict(req["config"]) if req.get("config") else default
    )
    if req.get("overrides"):
        cfg = cfg.override(dict(req["overrides"]))
    return cfg.validate()


def _handle(req: dict, default_cfg: PipelineConfig, log) -> Any:
    cmd = req.get("cmd")
    if cmd == "ping":
        return {"pong": True, "pid": os.getpid()}
    if cmd == "doctor":
        from audio_pattern_discovery_tpu.utils.doctor import run_doctor

        return run_doctor(probe_device=bool(req.get("probe_device", False)))
    if cmd == "discover":
        from audio_pattern_discovery_tpu.pipeline import discover

        if "wav_dir" not in req:
            raise ValueError("discover: 'wav_dir' is required")
        out_dir = Path(req.get("out_dir", "apd_out"))
        cfg = _request_config(req, default_cfg)
        result = discover(
            Path(req["wav_dir"]),
            cfg,
            out_dir=out_dir,
            logger=log,
            update_from=out_dir if req.get("update") else None,
        )
        return {
            "out_dir": str(out_dir),
            "n_clips": len(result.clips),
            "n_segments": len(result.segments),
            "n_clusters": len(result.clusters),
            "timings_s": result.counters.timings_s,
        }
    if cmd == "query":
        from audio_pattern_discovery_tpu.query import query_corpus

        if "out_dir" not in req or not req.get("wavs"):
            raise ValueError("query: 'out_dir' and non-empty 'wavs' required")
        cfg = _request_config(req, default_cfg)
        return query_corpus(
            Path(req["out_dir"]),
            [Path(w) for w in req["wavs"]],
            cfg,
            top_k=int(req.get("top_k", 10)),
            logger=log,
        )
    raise ValueError(f"unknown cmd {cmd!r}")


def serve(
    socket_path: str | Path,
    config: PipelineConfig | None = None,
    logger=None,
    max_requests: int | None = None,
) -> int:
    """Run the serve loop until a shutdown request (or max_requests).

    Returns the number of requests served.  The socket file is created
    fresh (a stale leftover from a dead server is replaced) and removed
    on exit.
    """
    socket_path = Path(socket_path)
    default_cfg = (config or PipelineConfig()).validate()
    log = logger or get_logger()
    if socket_path.exists():
        # Replace only a DEAD server's leftover: if something answers on
        # the socket, starting a second worker here would race it for the
        # device — refuse instead.
        probe = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        try:
            probe.settimeout(1.0)
            probe.connect(str(socket_path))
        except OSError:
            socket_path.unlink()
        else:
            probe.close()
            raise RuntimeError(
                f"{socket_path}: a live server is already answering"
            )
        finally:
            probe.close()
    srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    served = 0
    try:
        srv.bind(str(socket_path))
        srv.listen(1)
        log.info("serving on %s (pid %d)", socket_path, os.getpid())
        while True:
            conn, _ = srv.accept()
            try:
                with conn.makefile("rwb") as f:
                    line = f.readline(_MAX_LINE_BYTES)
                    if not line.strip():
                        continue
                    try:
                        req = json.loads(line)
                        if not isinstance(req, dict):
                            raise ValueError("request must be a JSON object")
                        if req.get("cmd") == "shutdown":
                            f.write(b'{"ok": true, "result": "bye"}\n')
                            f.flush()
                            served += 1
                            return served
                        result = _handle(req, default_cfg, log)
                        resp = {"ok": True, "result": result}
                    except Exception as exc:  # noqa: BLE001 — fault isolation:
                        # a bad request must not take down the warm worker
                        # (its whole value is surviving to the next request).
                        log.warning("request failed: %s", exc)
                        resp = {
                            "ok": False,
                            "error": f"{type(exc).__name__}: {exc}",
                            "traceback": traceback.format_exc(),
                        }
                    f.write(json.dumps(resp).encode() + b"\n")
                    f.flush()
                    served += 1
            finally:
                conn.close()
            if max_requests is not None and served >= max_requests:
                return served
    finally:
        srv.close()
        try:
            socket_path.unlink()
        except OSError:
            pass


def request(
    socket_path: str | Path, req: dict, timeout: float | None = None
) -> dict:
    """Send one request to a running server and return the response
    envelope ({"ok": ..., ...}).  Raises OSError if the server is
    unreachable; protocol/handler failures come back as ok=False."""
    c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    try:
        c.settimeout(timeout)
        c.connect(str(Path(socket_path)))
        with c.makefile("rwb") as f:
            f.write(json.dumps(req).encode() + b"\n")
            f.flush()
            line = f.readline(_MAX_LINE_BYTES)
        if not line:
            raise OSError("server closed the connection without a response")
        return json.loads(line)
    finally:
        c.close()
