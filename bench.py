"""Benchmark entry point (driver contract: prints ONE JSON line).

Metric: level-1 encode+decode roundtrip throughput per chip on a Silesia-like
mixed corpus.  Baseline: the reference's published single-thread numbers on
dickens (BASELINE.md): compress L1 0.151 GB/s + decompress L1 0.485 GB/s
=> roundtrip 1/(1/0.151 + 1/0.485) = 0.1152 GB/s.

Sub-metrics (encode-only, decode-only, ratio vs libzstd) go to stderr.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import numpy as np

BASELINE_ROUNDTRIP_GBS = 1.0 / (1.0 / 0.151 + 1.0 / 0.485)  # 0.1152
CORPUS_MB = 8


def make_corpus(n_bytes: int) -> bytes:
    """Deterministic Silesia-like mix: natural text, structured records,
    near-incompressible, and run-heavy segments."""
    r = np.random.default_rng(20260816)
    parts = []
    words = [b"the", b"of", b"and", b"a", b"to", b"in", b"he", b"was", b"that",
             b"it", b"his", b"her", b"with", b"as", b"had", b"for", b"dickens",
             b"compression", b"entropy", b"probability", b"wonderful"]
    probs = r.dirichlet(np.ones(len(words)) * 0.5)
    while sum(map(len, parts)) < n_bytes:
        kind = r.integers(0, 10)
        if kind < 5:  # text
            idx = r.choice(len(words), 40_000, p=probs)
            parts.append(b" ".join(words[i] for i in idx))
        elif kind < 7:  # structured records
            recs = [b'{"id": %d, "status": "ok", "score": %d}' % (i, i * 7 % 997)
                    for i in range(6000)]
            parts.append(b",".join(recs))
        elif kind < 8:  # binary ramps
            parts.append((np.arange(120_000) % 251).astype(np.uint8).tobytes())
        elif kind < 9:  # runs
            parts.append(bytes([int(r.integers(0, 256))]) * 80_000)
        else:  # high entropy
            parts.append(r.integers(0, 256, 150_000, dtype=np.uint8).tobytes())
    return b"".join(parts)[:n_bytes]


def main() -> None:
    data = make_corpus(CORPUS_MB << 20)
    n = len(data)

    from zstdsharp_tpu.decode.frame import decompress
    from zstdsharp_tpu.encode.frame import compress

    # Warm up (builds the native engine) then measure steady state.
    frame = compress(data, 1)
    best_enc = min(_timed(lambda: compress(data, 1)) for _ in range(9))
    out = decompress(frame)
    assert out == data, "roundtrip mismatch"
    best_dec = min(_timed(lambda: decompress(frame)) for _ in range(9))

    enc_gbs = n / best_enc / 1e9
    dec_gbs = n / best_dec / 1e9
    rt_gbs = n / (best_enc + best_dec) / 1e9

    try:
        import zstandard

        oracle = len(zstandard.ZstdCompressor(level=1).compress(data))
        ratio_note = f"size ours={len(frame)} zstd-L1={oracle} (x{len(frame)/oracle:.3f})"
    except Exception:  # pragma: no cover
        ratio_note = f"size ours={len(frame)}"

    print(f"bench: encode {enc_gbs:.4f} GB/s, decode {dec_gbs:.4f} GB/s, "
          f"roundtrip {rt_gbs:.4f} GB/s, {ratio_note}", file=sys.stderr)

    # Dictionary batch path (the 10K-small-records headline config).
    try:
        from zstdsharp_tpu.decode.frame import Decompressor
        from zstdsharp_tpu.dictionary import train_dictionary
        from zstdsharp_tpu.encode.frame import Compressor

        recs = [b'{"id": %d, "name": "user%d", "score": %d}' % (i, i, i * 7 % 997)
                for i in range(5000)]
        dic = train_dictionary(recs[:1000], 4096)
        comp = Compressor(level=3)
        comp.load_dictionary(dic)
        frames_d = comp.wrap_many(recs)
        te = min(_timed(lambda: comp.wrap_many(recs)) for _ in range(3))
        dec = Decompressor()
        dec.load_dictionary(dic)
        assert dec.unwrap_many(frames_d) == recs
        td = min(_timed(lambda: dec.unwrap_many(frames_d)) for _ in range(3))
        tot = sum(map(len, recs))
        print(f"bench: dict batch (5K json records) encode {tot/te/1e6:.1f} MB/s, "
              f"decode {tot/td/1e6:.1f} MB/s, size {sum(map(len, frames_d))}",
              file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"bench: dict batch skipped ({e})", file=sys.stderr)

    # Device candidate-stage throughput (the TPU half of the hybrid encoder).
    try:
        import jax
        import jax.numpy as jnp

        from zstdsharp_tpu.ops.matcher import candidate_stage

        dev = jax.devices()[0]
        blk = np.frombuffer(data[: 64 << 17], np.uint8).reshape(64, 1 << 17)
        f = jax.jit(jax.vmap(lambda b: candidate_stage(b, 15)))
        blk_d = jax.device_put(jnp.asarray(blk), dev)
        jax.block_until_ready(f(blk_d))
        t = _timed(lambda: jax.block_until_ready(f(blk_d)))
        print(f"bench: device candidate stage {blk.size / t / 1e9:.3f} GB/s "
              f"on {dev}", file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"bench: device stage skipped ({e})", file=sys.stderr)

    print(json.dumps({
        "metric": "silesia_like_l1_roundtrip_per_chip",
        "value": round(rt_gbs, 6),
        "unit": "GB/s",
        "vs_baseline": round(rt_gbs / BASELINE_ROUNDTRIP_GBS, 6),
    }))


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
