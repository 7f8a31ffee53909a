"""Randomized differential soak harness (not collected by pytest).

Usage: python tools/soak.py [seconds] [seed]

Every trial compresses a random mixed payload with random parameters
(level x checksum x block splitter x targetCBlockSize x LDM x window) and
asserts bit-exact decode through BOTH libzstd and our decoder; one trial
in five exercises the dictionary batch path.  The raw-fallback rep/entropy
desync (fixed 2026-08-16) was found by exactly this harness at
level 13 / window_log 11.
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import zstandard as zstd

import zstdsharp_tpu as zt
from zstdsharp_tpu.decode.frame import Decompressor
from zstdsharp_tpu.dictionary import train_dictionary
from zstdsharp_tpu.encode.frame import Compressor
from zstdsharp_tpu.encode.params import CCtxParams


def payload(r, n):
    parts = []
    while sum(map(len, parts)) < n:
        k = int(r.integers(0, 8))
        if k == 0:
            parts.append(r.integers(0, 256, int(r.integers(1, 5000)),
                                    dtype=np.uint8).tobytes())
        elif k == 1:
            parts.append(b"lorem ipsum dolor sit " * int(r.integers(1, 400)))
        elif k == 2:
            parts.append(bytes([int(r.integers(0, 256))]) * int(r.integers(1, 20000)))
        elif k == 3:
            parts.append(bytes(int(r.integers(1, 300))))
        elif k == 4:
            seed = r.integers(0, 256, int(r.integers(8, 200)), dtype=np.uint8).tobytes()
            parts.append(seed * int(r.integers(2, 100)))
        elif k == 5:
            parts.append(np.arange(int(r.integers(10, 9000)), dtype=np.uint8).tobytes())
        elif k == 6:
            parts.append(r.integers(0, 4, int(r.integers(10, 30000)),
                                    dtype=np.uint8).tobytes())
        else:
            parts.append(b'{"x": %d}' % int(r.integers(0, 1 << 30)))
    return b"".join(parts)[:n]


def main(duration: float, seed: int) -> int:
    r = np.random.default_rng(seed)
    dsamples = [b'{"u": %d, "v": "%s"}' % (i, b"a" * (i % 90)) for i in range(500)]
    dic = train_dictionary(dsamples, 2048)
    dcomp = Compressor(level=3)
    dcomp.load_dictionary(dic)
    ddec = Decompressor()
    ddec.load_dictionary(dic)
    zdz = zstd.ZstdDecompressor(dict_data=zstd.ZstdCompressionDict(dic))

    t_end = time.time() + duration
    trials = fails = 0
    while time.time() < t_end and fails <= 5:
        if int(r.integers(0, 10)) < 8:
            n = int(r.integers(0, 400_000))
            data = payload(r, n) if n else b""
            level = int(r.choice([-7, -1, 1, 2, 3, 4, 5, 6, 7, 9, 11, 13, 14, 16, 19, 22]))
            p = CCtxParams(
                compression_level=level,
                checksum_flag=bool(r.integers(0, 2)),
                block_splitter=[None, True, False][int(r.integers(0, 3))],
                target_cblock_size=int(r.choice([0, 0, 0, 777, 4096])),
                ldm=[None, True][int(r.integers(0, 2))],
                window_log=int(r.choice([0, 0, 0, 10, 11, 14, 18, 24])))
            try:
                frame = zt.compress(data, params=p)
                ref = zstd.ZstdDecompressor(max_window_size=1 << 27).decompress(
                    frame, max_output_size=n + 64)
                own = zt.decompress(frame, max_window_log=27)
                if ref != data or own != data:
                    print(f"MISMATCH trial {trials}: n={n} level={level} {p}",
                          flush=True)
                    fails += 1
            except Exception as e:  # noqa: BLE001 - report and count
                print(f"EXC trial {trials}: n={n} level={level} {p}: "
                      f"{type(e).__name__} {e}", flush=True)
                fails += 1
        else:
            recs = [payload(r, int(r.integers(1, 400)))
                    for _ in range(int(r.integers(1, 40)))]
            try:
                frames = dcomp.wrap_many(recs)
                if ddec.unwrap_many(frames) != recs:
                    print(f"DICT MISMATCH trial {trials}", flush=True)
                    fails += 1
                elif any(zdz.decompress(f, max_output_size=len(s) + 64) != s
                         for f, s in zip(frames, recs)):
                    print(f"DICT ORACLE MISMATCH trial {trials}", flush=True)
                    fails += 1
            except Exception as e:  # noqa: BLE001
                print(f"DICT EXC trial {trials}: {type(e).__name__} {e}", flush=True)
                fails += 1
        trials += 1
    print(f"soak: {trials} trials, {fails} failures", flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    dur = float(sys.argv[1]) if len(sys.argv) > 1 else 600
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0xC0FFEE
    raise SystemExit(main(dur, seed))
