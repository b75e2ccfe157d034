"""Serving load simulator: concurrent batch + streaming clients against a
running server, reporting latency percentiles and batcher efficiency.

Analogue of the reference's connection-pool latency sim
(ref: src/bin/test_connection_pool.rs) retargeted at what actually matters
here: how well the continuous batcher packs concurrent work.

    python tools/load_sim.py --host localhost --port 8057 \
        --batch-clients 8 --stream-clients 4 --duration 30
"""

from __future__ import annotations

import pathlib
import sys as _sys

_sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import argparse
import asyncio
import base64
import json
import time

import numpy as np


async def batch_client(session, url, stats, stop, seconds=2.0):
    rng = np.random.default_rng()
    while not stop.is_set():
        pcm = (rng.standard_normal(int(seconds * 16000)) * 3000) \
            .astype("<i2").tobytes()
        t0 = time.perf_counter()
        async with session.post(url, json={
                "audio_buffer": base64.b64encode(pcm).decode()}) as resp:
            await resp.json()
            stats["batch"].append((time.perf_counter() - t0,
                                   resp.status))


def _synth_stream_pcm(seed: int, seconds: float = 12.0) -> bytes:
    """Deterministic synthspeech audio (the trained checkpoints' grammar)
    so native-mode partials carry real text, not noise-blanks."""
    from amira_rust_asr_server_tpu.testing.synthspeech import (
        random_token_ids, synth_token_ids)
    rng = np.random.default_rng(seed)
    parts, total = [], 0
    n = int(seconds * 16000)
    while total < n:
        w = synth_token_ids(random_token_ids(rng, 4, 18), noise=0.01,
                            rate=float(rng.uniform(0.85, 1.25)), rng=rng)
        parts.append(w)
        total += len(w)
    wave = np.concatenate(parts)[:n]
    return (np.clip(wave, -1, 1) * 32767).astype("<i2").tobytes()


async def stream_client(session, url, stats, stop, synth_seed=None):
    """One LONG-LIVED websocket per client: clips loop back-to-back in the
    same connection (live-captioning usage), reconnecting only on error —
    server-side session churn shows up as stats["reconnects"] instead of
    being buried in by-design per-clip reconnects. Heartbeat frames
    (message="processing", emitted during cold-dispatch spikes) keep the
    session alive but are excluded from partial latency."""
    import aiohttp
    rng = np.random.default_rng()
    pcm = _synth_stream_pcm(synth_seed) if synth_seed is not None else None
    stats.setdefault("reconnects", 0)
    stats.setdefault("sessions", 0)
    first = True
    while not stop.is_set():
        try:
            async with session.ws_connect(url) as ws:
                stats["sessions"] += 1
                if not first:
                    stats["reconnects"] += 1
                first = False
                ci = 0
                while not stop.is_set():
                    if pcm is not None:
                        chunk = pcm[ci * 3200:(ci + 1) * 3200]
                        ci = (ci + 1) % (len(pcm) // 3200)
                    else:
                        chunk = (rng.standard_normal(1600) * 3000) \
                            .astype("<i2").tobytes()
                    t0 = time.perf_counter()
                    await ws.send_bytes(chunk)
                    try:
                        # read until the real partial for this chunk
                        # (skip keepalive heartbeats)
                        while True:
                            msg = await asyncio.wait_for(ws.receive(),
                                                         timeout=10)
                            if msg.type != aiohttp.WSMsgType.TEXT:
                                raise ConnectionError(f"ws {msg.type}")
                            d = json.loads(msg.data)
                            if d.get("message") == "processing":
                                continue
                            stats["partial"].append(
                                (time.perf_counter() - t0, 200))
                            break
                    except asyncio.TimeoutError:
                        pass
                    await asyncio.sleep(0.1)
                await ws.send_bytes(b"\xff")
        except Exception as e:  # noqa: BLE001 — keep hammering
            # churn diagnosis: count WHY sessions die, not just that they do
            key = f"{type(e).__name__}: {e}"[:120]
            errs = stats.setdefault("errors", {})
            errs[key] = errs.get(key, 0) + 1
            await asyncio.sleep(0.5)


def pct(xs, q):
    if not xs:
        return 0.0
    return sorted(xs)[min(len(xs) - 1, int(q / 100 * len(xs)))]


async def main() -> None:
    import aiohttp
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="localhost")
    parser.add_argument("--port", type=int, default=8057)
    parser.add_argument("--batch-clients", type=int, default=8)
    parser.add_argument("--stream-clients", type=int, default=4)
    parser.add_argument("--duration", type=float, default=30.0)
    parser.add_argument("--synth", action="store_true",
                        help="stream deterministic synthspeech audio "
                             "instead of noise (real partial text on "
                             "trained checkpoints)")
    parser.add_argument("--json-out", default=None,
                        help="also write the result JSON to this path")
    args = parser.parse_args()

    base = f"http://{args.host}:{args.port}"
    stats = {"batch": [], "partial": []}
    stop = asyncio.Event()
    async with aiohttp.ClientSession() as session:
        tasks = [
            asyncio.create_task(batch_client(
                session, f"{base}/v2/decode/batch/default", stats, stop))
            for _ in range(args.batch_clients)
        ] + [
            asyncio.create_task(stream_client(
                session, f"{base}/v2/decode/stream/default", stats, stop,
                synth_seed=(100 + i) if args.synth else None))
            for i in range(args.stream_clients)
        ]
        await asyncio.sleep(args.duration)
        stop.set()
        await asyncio.gather(*tasks, return_exceptions=True)

        async with session.get(f"{base}/metrics") as resp:
            metrics = await resp.json()

    lat_b = [x[0] for x in stats["batch"] if x[1] == 200]
    lat_p = [x[0] for x in stats["partial"]]
    out = {
        "batch_requests": len(stats["batch"]),
        "batch_ok": len(lat_b),
        "batch_rejected": sum(1 for x in stats["batch"]
                              if x[1] in (429, 503)),
        "batch_p50_ms": round(pct(lat_b, 50) * 1e3, 1),
        "batch_p95_ms": round(pct(lat_b, 95) * 1e3, 1),
        "partials": len(lat_p),
        "partial_p50_ms": round(pct(lat_p, 50) * 1e3, 1),
        "partial_p95_ms": round(pct(lat_p, 95) * 1e3, 1),
        "batcher": metrics.get("batcher"),
        "stream_clients": args.stream_clients,
        "batch_clients": args.batch_clients,
        "duration_s": args.duration,
        "synth_audio": bool(args.synth),
    }
    print(json.dumps(out, indent=2))
    if args.json_out:
        with open(args.json_out, "w", encoding="utf-8") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    asyncio.run(main())
