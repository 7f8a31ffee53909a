"""Standalone device-plane benchmark: writes DEVICE_BENCH_r{N}.json.

Run on a machine whose TPU backend is live (the main bench guards this
section behind a probe because the tunnel wedges intermittently; this
tool exists so a recovered tunnel can be exploited the moment it appears,
independent of a full bench run):

    python tools/device_bench.py [--round 4] [--out DEVICE_BENCH_r04.json]

Measures, on the real chip:
  - decode_batch_device: record batch -> device-resident rows (marginal
    GB/s, excluding the per-dispatch tunnel latency artifact)
  - compress_batch_device: record batch -> device-resident frames
  - bit-exactness of both against the host engine / libzstd oracle
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def marginal(run, reps: int = 3):
    """Median marginal time of `run` (K-pass minus 1-pass, halved)."""
    pairs = []
    for _ in range(reps):
        t3 = _timed(lambda: [run() for _ in range(3)])
        t1 = _timed(run)
        pairs.append((t3 - t1) / 2)
    pairs.sort()
    return max(pairs[len(pairs) // 2], 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=4)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out_path = args.out or f"DEVICE_BENCH_r{args.round:02d}.json"

    import jax

    backend = jax.default_backend()
    dev = str(jax.devices()[0])
    result = {"backend": backend, "device": dev,
              "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S")}
    if backend != "tpu":
        result["error"] = f"backend is {backend}, not tpu"
        Path(out_path).write_text(json.dumps(result, indent=1))
        print(json.dumps(result))
        return 1

    import numpy as np
    import zstandard

    from bench import make_real_corpus
    from zstdsharp_tpu.decode.device_pipeline import decode_batch_device
    from zstdsharp_tpu.encode.device_pipeline import compress_batch_device

    data = make_real_corpus()

    # ---- decode plane ----
    zc = zstandard.ZstdCompressor(level=9, write_content_size=True)
    rec_size = 24 << 10
    frames = [zc.compress(data[i:i + rec_size])
              for i in range(0, 6 << 20, rec_size)]
    payload = sum(len(data[i:i + rec_size])
                  for i in range(0, 6 << 20, rec_size))

    def run_dec():
        outs, lens, host = decode_batch_device(frames)
        if outs:
            jax.block_until_ready(outs[-1])

    run_dec()  # compile
    # bit-exactness once (materialized)
    res, stats = decode_batch_device(frames, materialize=True)
    ok = all(res[i] == data[i * rec_size:(i + 1) * rec_size][:len(res[i])]
             for i in range(len(frames)))
    m = marginal(run_dec)
    e2e = _timed(run_dec)
    result["decode"] = {
        "payload_mb": payload >> 20, "frames": len(frames),
        "host_routed": stats["host_frames"], "bit_exact": bool(ok),
        "marginal_gbs": round(payload / m / 1e9, 4),
        "e2e_gbs": round(payload / e2e / 1e9, 4),
    }

    # ---- encode plane ----
    rec_size = 16 << 10
    recs = [data[i:i + rec_size] for i in range(0, 4 << 20, rec_size)]
    epayload = sum(map(len, recs))

    def run_enc():
        chunks, host = compress_batch_device(recs)
        if chunks:
            jax.block_until_ready(chunks[-1][1])

    run_enc()  # compile
    eframes, estats = compress_batch_device(recs, materialize=True)
    d = zstandard.ZstdDecompressor()
    eok = all(d.decompress(f, max_output_size=2 * rec_size) == r
              for f, r in zip(eframes, recs))
    em = marginal(run_enc)
    result["encode"] = {
        "payload_mb": epayload >> 20, "records": len(recs),
        "host_routed": estats["host_frames"], "oracle_ok": bool(eok),
        "csize": sum(map(len, eframes)),
        "marginal_gbs": round(epayload / em / 1e9, 4),
    }

    Path(out_path).write_text(json.dumps(result, indent=1))
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
