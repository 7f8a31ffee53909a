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


def make_real_corpus(n_bytes: int = 8 << 20) -> bytes:
    """Real-file corpus assembled from data shipped in the image, mirroring
    Silesia's mix (no network access to fetch Silesia itself): source code
    (stdlib .py ~ samba), English prose (pydoc topics ~ dickens/webster),
    ELF binary (numpy's umath .so ~ mozilla), and structured records
    (dpkg status ~ nci).  Deterministic for a given image."""
    import pathlib
    import sysconfig

    parts = []
    std = pathlib.Path(sysconfig.get_paths()["stdlib"])
    acc = 0
    for p in sorted(std.glob("*.py")):
        parts.append(p.read_bytes())
        acc += len(parts[-1])
        if acc >= (3 << 20):
            break
    topics = std / "pydoc_data" / "topics.py"
    if topics.exists():
        parts.append(topics.read_bytes())
    status = pathlib.Path("/var/lib/dpkg/status")
    if status.exists():
        parts.append(status.read_bytes()[: 1 << 20])
    import numpy as _np

    so = sorted(pathlib.Path(_np.__file__).parent.rglob("*.so"),
                key=lambda p: -p.stat().st_size)
    if so:
        parts.append(so[0].read_bytes()[: 3 << 20])
    return b"".join(parts)[:n_bytes]


def main() -> None:
    data = make_corpus(CORPUS_MB << 20)
    n = len(data)

    from zstdsharp_tpu.decode.frame import decompress
    from zstdsharp_tpu.encode.frame import compress

    # Warm up (builds the native engine) then measure steady state.
    # Median-of-N with dispersion: a shared/throttled VM makes single-shot
    # (and even best-of-N) numbers unreproducible; the artifact records
    # median plus [min, max] so a regression is distinguishable from noise.
    frame = compress(data, 1)
    enc_times = sorted(_timed(lambda: compress(data, 1)) for _ in range(15))
    out = decompress(frame)
    assert out == data, "roundtrip mismatch"
    dec_times = sorted(_timed(lambda: decompress(frame)) for _ in range(15))

    med_enc, med_dec = enc_times[len(enc_times) // 2], dec_times[len(dec_times) // 2]
    enc_gbs = n / med_enc / 1e9
    dec_gbs = n / med_dec / 1e9
    rt_gbs = n / (med_enc + med_dec) / 1e9
    spread = {
        "encode_gbs": [round(n / enc_times[-1] / 1e9, 4), round(enc_gbs, 4),
                       round(n / enc_times[0] / 1e9, 4)],
        "decode_gbs": [round(n / dec_times[-1] / 1e9, 4), round(dec_gbs, 4),
                       round(n / dec_times[0] / 1e9, 4)],
        "reps": len(enc_times),
    }

    try:
        import zstandard

        oracle = len(zstandard.ZstdCompressor(level=1).compress(data))
        ratio_note = f"size ours={len(frame)} zstd-L1={oracle} (x{len(frame)/oracle:.3f})"
    except Exception:  # pragma: no cover
        ratio_note = f"size ours={len(frame)}"

    print(f"bench: encode {enc_gbs:.4f} GB/s, decode {dec_gbs:.4f} GB/s, "
          f"roundtrip {rt_gbs:.4f} GB/s, {ratio_note}", file=sys.stderr)

    # Real-file corpus (Silesia-style mix from image-shipped files): ratio
    # and speed vs libzstd at the fast and optimal ends.
    try:
        import zstandard

        real = make_real_corpus()
        for lvl in (1, 19):
            f = compress(real, lvl)
            te = min(_timed(lambda: compress(real, lvl)) for _ in range(3 if lvl == 1 else 1))
            zc = zstandard.ZstdCompressor(level=lvl, write_content_size=True)
            fz = zc.compress(real)
            tz = min(_timed(lambda: zc.compress(real)) for _ in range(3 if lvl == 1 else 1))
            assert decompress(f) == real
            print(f"bench: real corpus ({len(real)>>20}MB) L{lvl}: "
                  f"ours {len(f)} @ {len(real)/te/1e6:.1f} MB/s, "
                  f"libzstd {len(fz)} @ {len(real)/tz/1e6:.1f} MB/s "
                  f"(ratio x{len(f)/len(fz):.4f}, speed x{tz/te:.2f})",
                  file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"bench: real corpus skipped ({e})", file=sys.stderr)

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
        # path honesty: a silent mass fallback must be visible in the tail
        enc_path = getattr(comp._dict, "last_compress_path", "?")
        dec_path = getattr(dec._dict, "last_decompress_path", "?")
        print(f"bench: dict batch (5K json records) encode {tot/te/1e6:.1f} MB/s, "
              f"decode {tot/td/1e6:.1f} MB/s, size {sum(map(len, frames_d))} "
              f"[enc={enc_path} dec={dec_path}]",
              file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"bench: dict batch skipped ({e})", file=sys.stderr)

    # Device decode plane, end-to-end: frames -> Pallas entropy kernels ->
    # pointer-jumping LZ executor -> decoded rows in HBM (the deployment
    # is record-batch decode feeding on-device consumers; outputs never
    # cross back).  Timing uses the marginal method (K passes minus 1,
    # forced sync) because the tunnel adds ~35 ms latency per dispatch
    # plus a 0.02 GB/s D2H ceiling that is an artifact of this test rig,
    # not of the chip.
    try:
        # Probe the backend in a throwaway subprocess first: when the TPU
        # tunnel wedges, backend discovery blocks indefinitely (observed
        # 2026-08-17), and a hang here would stall the whole bench.
        import subprocess

        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; raise SystemExit(0 if jax.default_backend() == 'tpu' else 1)"],
            timeout=180, capture_output=True)
        tpu_probe_ok = probe.returncode == 0
        if not tpu_probe_ok:
            raise RuntimeError("no TPU backend (probe)")

        import jax

        if jax.default_backend() != "tpu":
            raise RuntimeError("no TPU backend")

        from zstdsharp_tpu.decode.device_pipeline import decode_batch_device

        zc = zstandard.ZstdCompressor(level=9, write_content_size=True)
        rec_size = 24 << 10
        frames = [zc.compress(data[i : i + rec_size])
                  for i in range(0, 6 << 20, rec_size)]
        payload = sum(len(data[i : i + rec_size])
                      for i in range(0, 6 << 20, rec_size))

        def run_pipeline():
            outs, lens, host = decode_batch_device(frames)
            if outs:
                jax.block_until_ready(outs[-1])
            return len(host)

        n_host = run_pipeline()  # compile
        pairs = []
        for _ in range(3):
            t5 = _timed(lambda: [run_pipeline() for _ in range(3)])
            t1 = _timed(run_pipeline)
            pairs.append((t5 - t1) / 2)
        pairs.sort()
        marg = max(pairs[1], 1e-9)
        e2e = _timed(run_pipeline)
        print(f"bench: device decode end-to-end {payload >> 20} MB batch "
              f"({len(frames)} frames, {n_host} host-routed): "
              f"{payload / marg / 1e9:.3f} GB/s marginal, "
              f"{payload / e2e / 1e9:.3f} GB/s incl. host plan+upload "
              f"on {jax.devices()[0]}", file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"bench: device decode plane skipped ({e})", file=sys.stderr)

    # Device encode plane: records -> greedy parse + FSE coding + frame
    # assembly wholly on device (encode/device_pipeline.py).
    try:
        # the decode section's subprocess probe already told us whether the
        # tunnel is alive; importing jax in-process would WEDGE otherwise
        if not locals().get("tpu_probe_ok"):
            raise RuntimeError("no TPU backend (probe)")
        import jax

        if jax.default_backend() != "tpu":
            raise RuntimeError("no TPU backend")

        from zstdsharp_tpu.encode.device_pipeline import compress_batch_device

        rec_size = 16 << 10
        recs = [data[i : i + rec_size] for i in range(0, 4 << 20, rec_size)]
        payload = sum(map(len, recs))

        def run_encode():
            chunks, host = compress_batch_device(recs)
            if chunks:
                jax.block_until_ready(chunks[-1][1])
            return sum(int(np.asarray(l).sum()) for _, _, l in chunks)

        csize = run_encode()  # compile
        pairs = []
        for _ in range(3):
            t5 = _timed(lambda: [run_encode() for _ in range(3)])
            t1 = _timed(run_encode)
            pairs.append((t5 - t1) / 2)
        pairs.sort()
        marg = max(pairs[1], 1e-9)
        print(f"bench: device encode {payload >> 20} MB batch "
              f"({len(recs)} records -> {csize} bytes): "
              f"{payload / marg / 1e9:.3f} GB/s marginal "
              f"on {jax.devices()[0]}", file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"bench: device encode plane skipped ({e})", file=sys.stderr)

    print(json.dumps({
        "metric": "silesia_like_l1_roundtrip_per_chip",
        "value": round(rt_gbs, 6),
        "unit": "GB/s",
        "vs_baseline": round(rt_gbs / BASELINE_ROUNDTRIP_GBS, 6),
        "spread_min_med_max": spread,
    }))


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
