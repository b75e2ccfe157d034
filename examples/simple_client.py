"""Example client: batch POST + WebSocket streaming.

Usage parity with the reference's example (ref: examples/simple_client.rs):

    python examples/simple_client.py batch  path/to/audio.wav
    python examples/simple_client.py stream path/to/audio.wav
    python examples/simple_client.py batch --synth 3.0   # synthetic tone

Streams send 100 ms PCM chunks followed by the end-of-stream control byte
(0xFF); keepalive is a single 0x00 byte.
"""

from __future__ import annotations

import argparse
import asyncio
import base64
import json
import struct
import sys
import urllib.request
import wave

import numpy as np

END_BYTE = b"\xff"
KEEPALIVE_BYTE = b"\x00"


def load_pcm(args) -> bytes:
    if args.synth is not None:
        t = np.arange(int(args.synth * 16000)) / 16000.0
        sig = 0.3 * np.sin(2 * np.pi * 440.0 * t)
        return (sig * 32767).astype("<i2").tobytes()
    with wave.open(args.audio, "rb") as w:
        assert w.getframerate() == 16000, "expected 16 kHz audio"
        assert w.getsampwidth() == 2, "expected 16-bit PCM"
        frames = w.readframes(w.getnframes())
        if w.getnchannels() == 2:  # downmix
            x = np.frombuffer(frames, "<i2").reshape(-1, 2)
            frames = (x.mean(axis=1).astype("<i2")).tobytes()
        return frames


def run_batch(args, pcm: bytes) -> None:
    url = f"http://{args.host}:{args.port}/v2/decode/batch/{args.model}"
    body = {"audio_buffer": base64.b64encode(pcm).decode(),
            "opaque": {"client": "simple_client.py"}}
    if args.lattice:
        # beam-mode servers only: adds a prefix-merged rescoring DAG of
        # the n-best hypotheses to metadata (docs/Operations.md)
        body["lattice"] = True
        body["n_best"] = args.n_best
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(),
        headers={"content-type": "application/json"})
    resp = json.loads(urllib.request.urlopen(req, timeout=300).read())
    print("status:      ", resp["status"])
    print("transcription:", resp["transcription"])
    md = resp.get("metadata", {})
    print(f"audio samples={md.get('audio_length_samples')} "
          f"frames={md.get('features_length')} "
          f"encoded={md.get('encoded_length')} "
          f"tokens={len(md.get('tokens', []))}")
    if "n_best" in md:
        for i, alt in enumerate(md["n_best"]):
            print(f"  n_best[{i}]: {alt['score']:9.3f}  {alt['text']!r}")
    if "lattice" in md:
        lat = md["lattice"]
        print(f"lattice: {lat['n_nodes']} nodes, {len(lat['arcs'])} arcs, "
              f"{len(lat['finals'])} finals")
        for (src, dst, tok, frame), t_s in list(
                zip(lat["arcs"], lat["arc_times_s"]))[:8]:
            piece = lat.get("pieces", {}).get(str(tok), tok)
            print(f"  arc {src:3d} -> {dst:3d}  {piece!r:14} @ {t_s:.2f}s")


async def run_stream(args, pcm: bytes) -> None:
    import aiohttp
    url = f"http://{args.host}:{args.port}/v2/decode/stream/{args.model}"
    chunk = 2 * 1600  # 100 ms of 16-bit PCM
    async with aiohttp.ClientSession() as session:
        async with session.ws_connect(url) as ws:
            async def reader():
                async for msg in ws:
                    if msg.type != aiohttp.WSMsgType.TEXT:
                        break
                    data = json.loads(msg.data)
                    tag = (" (heartbeat)"
                           if data.get("message") == "processing" else "")
                    line = (f"[{data['status']}]{tag} "
                            f"{data['transcription'][:80]!r}")
                    print(line)
                    if data["status"] in ("COMPLETE", "ERROR"):
                        return

            reader_task = asyncio.create_task(reader())
            for i in range(0, len(pcm), chunk):
                await ws.send_bytes(pcm[i:i + chunk])
                await asyncio.sleep(0.1)  # real-time pacing
            await ws.send_bytes(END_BYTE)
            await asyncio.wait_for(reader_task, timeout=60)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("mode", choices=["batch", "stream"])
    parser.add_argument("audio", nargs="?", help="16 kHz 16-bit wav")
    parser.add_argument("--synth", type=float, default=None,
                        help="generate N seconds of 440 Hz tone instead")
    parser.add_argument("--host", default="localhost")
    parser.add_argument("--port", type=int, default=8057)
    parser.add_argument("--model", default="default")
    parser.add_argument("--lattice", action="store_true",
                        help="request a rescoring lattice (beam servers)")
    parser.add_argument("--n-best", type=int, default=4)
    args = parser.parse_args()
    if args.audio is None and args.synth is None:
        args.synth = 2.0
    pcm = load_pcm(args)
    print(f"audio: {len(pcm) // 2} samples "
          f"({len(pcm) / 32000.0:.2f}s)", file=sys.stderr)
    if args.mode == "batch":
        run_batch(args, pcm)
    else:
        asyncio.run(run_stream(args, pcm))


if __name__ == "__main__":
    main()
