"""Native-streaming serving-latency artifact: boots a streaming_mode=native
server (causal flagship, shared lane engine), drives N concurrent WS
streams with tools/load_sim.py's client, and writes LOADTEST_r*.json with
partial-latency percentiles — the serving-surface proof of the <100 ms
p50 partial target (BASELINE.md north star) in the shipped scale-out mode
(config.py recommends native for scale).

    python tools/loadtest_native.py --streams 16 --duration 60 \
        --out LOADTEST_r03.json [--preset large-streaming]
"""

from __future__ import annotations

import pathlib
import sys as _sys

_REPO = pathlib.Path(__file__).resolve().parents[1]
_sys.path.insert(0, str(_REPO))
_sys.path.insert(0, str(_REPO / "tools"))

import argparse
import asyncio
import json
import os
import socket
import subprocess
import time


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


async def drive(port: int, streams: int, duration: float) -> dict:
    import aiohttp

    from load_sim import pct, stream_client

    base = f"http://localhost:{port}"
    stats = {"batch": [], "partial": []}
    stop = asyncio.Event()
    async with aiohttp.ClientSession() as session:
        tasks = [asyncio.create_task(stream_client(
            session, f"{base}/v2/decode/stream/default", stats, stop,
            synth_seed=200 + i))
            for i in range(streams)]
        await asyncio.sleep(duration)
        stop.set()
        await asyncio.gather(*tasks, return_exceptions=True)
        async with session.get(f"{base}/metrics") as resp:
            metrics = await resp.json()
    lat = [x[0] for x in stats["partial"]]
    return {
        "streaming_mode": "native",
        "streams": streams,
        "duration_s": duration,
        "partials": len(lat),
        "partial_p50_ms": round(pct(lat, 50) * 1e3, 1),
        "partial_p95_ms": round(pct(lat, 95) * 1e3, 1),
        # long-lived clients: sessions ≈ streams unless errors churn them
        "client_sessions": stats.get("sessions", 0),
        "client_reconnects": stats.get("reconnects", 0),
        "client_errors": stats.get("errors", {}),
        "server_metrics": {k: metrics.get(k)
                           for k in ("active_streams", "total_streams",
                                     "batcher", "lane_engine")
                           if k in metrics},
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--streams", type=int, default=16)
    parser.add_argument("--duration", type=float, default=60.0)
    parser.add_argument("--preset", default="large-streaming")
    parser.add_argument("--chunk-frames", type=int, default=64)
    parser.add_argument("--out", default="LOADTEST_r03.json")
    parser.add_argument("--warmup-timeout", type=float, default=1800.0)
    parser.add_argument("--server-log", default=None,
                        help="capture server stdout/stderr to this file "
                             "(default: discarded) — session-churn "
                             "diagnosis needs the server's close reasons")
    args = parser.parse_args()

    port = _free_port()
    env = dict(os.environ)
    env.update({
        "AMIRA_MODEL_PRESET": args.preset,
        "AMIRA_STREAMING_MODE": "native",
        "AMIRA_NATIVE_CHUNK_FRAMES": str(args.chunk_frames),
        "AMIRA_MAX_CONCURRENT_STREAMS": str(max(args.streams, 10)),
        "AMIRA_SERVER_PORT": str(port),
        "AMIRA_VOCABULARY_PATH": str(_REPO / "model-repo" / "vocab.txt"),
    })
    # trained causal checkpoint when present: partials carry real text
    # (tools/train_synth.py --preset large-streaming)
    ckpt = _REPO / "model-repo" / "large-synth-stream"
    if ckpt.is_dir() and args.preset == "large-streaming":
        env["AMIRA_CHECKPOINT_PATH"] = str(ckpt)
    log_f = (open(args.server_log, "w") if args.server_log
             else subprocess.DEVNULL)
    proc = subprocess.Popen(
        [_sys.executable, "-m", "amira_rust_asr_server_tpu.server",
         "--port", str(port)],
        cwd=_REPO, env=env, stdout=log_f, stderr=subprocess.STDOUT)
    try:
        # wait for warmup (first flagship compile can take minutes)
        import urllib.request
        t0 = time.time()
        while True:
            try:
                urllib.request.urlopen(
                    f"http://localhost:{port}/health", timeout=2)
                break
            except Exception:  # noqa: BLE001
                if time.time() - t0 > args.warmup_timeout:
                    raise SystemExit("server never became healthy")
                if proc.poll() is not None:
                    raise SystemExit(f"server died rc={proc.returncode}")
                time.sleep(5)
        print(f"server healthy after {time.time()-t0:.0f}s; driving "
              f"{args.streams} streams for {args.duration:.0f}s",
              flush=True)
        result = asyncio.run(drive(port, args.streams, args.duration))
        result["preset"] = args.preset
        result["chunk_frames"] = args.chunk_frames
        with open(args.out, "w", encoding="utf-8") as f:
            json.dump(result, f, indent=2)
        print(json.dumps(result))
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=20)
        except subprocess.TimeoutExpired:
            proc.kill()


if __name__ == "__main__":
    main()
