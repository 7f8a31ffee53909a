"""Randomized streaming soak (not collected by pytest).

Usage: python tools/soak_stream.py [seconds] [seed]

Every trial drives CompressionStream with random parameters — level,
checksum, dictionary (preloaded native context), LDM, targetCBlockSize,
window log — feeding a random mixed payload at random chunk sizes with
random flush points, then asserts bit-exact decode through BOTH libzstd
and our DecompressionStream (also at random read sizes).  Exercises the
round-4 native stream engine paths: dict preload, persistent LDM with
trim rebase, superblock emission, the chain-log degrade ladder, and the
zero-copy streaming decoder.
"""

import io
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import zstandard as zstd

from zstdsharp_tpu.encode.params import CCtxParams
from zstdsharp_tpu.streaming import CompressionStream, DecompressionStream


def payload(r, n):
    parts = []
    words = [b"soak ", b"stream ", b"native ", b"engine ", b"window "]
    while sum(map(len, parts)) < n:
        k = int(r.integers(0, 5))
        if k == 0:
            parts.append(r.integers(0, 256, int(r.integers(1, 8000)),
                                    dtype=np.uint8).tobytes())
        elif k == 1:
            parts.append(b"".join(words[int(i)]
                                  for i in r.integers(0, 5,
                                                      int(r.integers(1, 4000)))))
        elif k == 2:
            parts.append(bytes([int(r.integers(0, 256))])
                         * int(r.integers(1, 30000)))
        elif k == 3:
            base = r.integers(0, 256, 64, dtype=np.uint8).tobytes()
            parts.append(base * int(r.integers(1, 300)))
        else:
            parts.append(bytes(r.integers(97, 105, int(r.integers(1, 6000)),
                                          dtype=np.uint8)))
    return b"".join(parts)[:n]


def main():
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 120.0
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    r = np.random.default_rng(seed)
    words = [b"soak ", b"stream ", b"native ", b"engine ", b"window "]
    samples = [bytes(b"".join(words[int(i)] for i in r.integers(0, 5, 30)))
               for _ in range(150)]
    dict_bytes = zstd.train_dictionary(2048, samples).as_bytes()
    ddec = zstd.ZstdDecompressor(
        dict_data=zstd.ZstdCompressionDict(dict_bytes))
    pdec = zstd.ZstdDecompressor()

    t0 = time.time()
    trials = 0
    while time.time() - t0 < budget:
        n = int(r.integers(1, 400_000))
        data = payload(r, n)
        level = int(r.choice([-3, 1, 2, 3, 5, 7, 9, 13, 17, 19, 22]))
        p = CCtxParams(compression_level=level)
        use_dict = bool(r.integers(0, 3) == 0)
        if r.integers(0, 3) == 0:
            p.ldm = True
        if r.integers(0, 4) == 0:
            p.target_cblock_size = int(r.integers(300, 4000))
        if r.integers(0, 3) == 0:
            p.window_log = int(r.integers(10, 22))
        checksum = bool(r.integers(0, 2))
        p.checksum_flag = checksum

        sink = io.BytesIO()
        cs = CompressionStream(sink, params=p,
                               dictionary=dict_bytes if use_dict else None)
        pos = 0
        while pos < len(data):
            c = int(r.integers(1, 100_000))
            cs.write(data[pos:pos + c])
            pos += c
            if r.integers(0, 4) == 0:
                cs.flush()
        cs.close()
        frame = sink.getvalue()

        dec = ddec if use_dict else pdec
        got = dec.decompress(frame, max_output_size=len(data) + 1024)
        assert got == data, (
            f"libzstd mismatch: seed={seed} trial={trials} level={level} "
            f"dict={use_dict} ldm={p.ldm} tcbs={p.target_cblock_size} "
            f"wlog={p.window_log} n={n}")

        ds = DecompressionStream(
            io.BytesIO(frame),
            dictionary=dict_bytes if use_dict else None)
        out = []
        while True:
            chunk = ds.read(int(r.integers(1, 120_000)))
            if not chunk:
                break
            out.append(chunk)
        assert b"".join(out) == data, (
            f"our stream decode mismatch: seed={seed} trial={trials} "
            f"level={level} dict={use_dict} ldm={p.ldm} "
            f"tcbs={p.target_cblock_size} wlog={p.window_log} n={n}")
        trials += 1
    print(f"soak_stream: {trials} trials clean in {time.time() - t0:.0f}s "
          f"(seed {seed})")


if __name__ == "__main__":
    main()
