"""Robustness: malformed inputs must raise ZstdError (never crash, never
return wrong data silently) — transplants the reference's corruption tests
(ZstdNetTests.cs:166-213) plus randomized mutation fuzzing vs the oracle."""

import numpy as np
import pytest
import zstandard

from zstdsharp_tpu.decode.frame import decompress
from zstdsharp_tpu.encode.frame import compress
from zstdsharp_tpu.errors import ZstdError


@pytest.fixture(scope="module")
def frame(rng):
    r = np.random.default_rng(99)
    data = (b"payload " * 4000) + r.integers(0, 256, 5000, dtype=np.uint8).tobytes()
    return zstandard.ZstdCompressor(level=5, write_checksum=True).compress(data), data


class TestCorruption:
    def test_every_single_byte_flip_is_caught_or_equal(self, frame):
        """Flip each of 200 sampled byte positions; decode must raise or
        (for don't-care header bits) still roundtrip to the same bytes."""
        blob, data = frame
        r = np.random.default_rng(7)
        positions = r.choice(len(blob), size=200, replace=False)
        silent_wrong = 0
        for p in positions:
            mutated = bytearray(blob)
            mutated[p] ^= 0x55
            try:
                out = decompress(bytes(mutated))
                if out != data:
                    silent_wrong += 1
            except ZstdError:
                pass  # a typed error is the only acceptable failure
        # checksum is on: silent wrong output must be impossible
        assert silent_wrong == 0

    def test_truncations(self, frame):
        blob, _ = frame
        for cut in (1, 4, 5, 9, len(blob) // 2, len(blob) - 1):
            with pytest.raises(ZstdError):
                decompress(blob[:cut])

    def test_header_lies_about_content_size(self, frame):
        blob, data = frame
        mutated = bytearray(blob)
        # FCS field starts after magic+FHD(+window); flip a size byte
        mutated[6] ^= 0xFF
        with pytest.raises(ZstdError):
            decompress(bytes(mutated))

    def test_random_garbage(self, rng):
        for n in (4, 10, 100, 1000):
            blob = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
            try:
                decompress(blob)
            except ZstdError:
                pass  # expected: any failure must be a typed error

    def test_magic_prefixed_garbage(self, rng):
        blob = (0xFD2FB528).to_bytes(4, "little") + \
            rng.integers(0, 256, 500, dtype=np.uint8).tobytes()
        with pytest.raises(ZstdError):
            decompress(blob)


class TestOwnFramesFuzzed:
    def test_mutation_fuzz_own_encoder(self, text_corpus):
        data = text_corpus[:100_000]
        blob = compress(data, 5, checksum=True)
        r = np.random.default_rng(3)
        for _ in range(100):
            mutated = bytearray(blob)
            for _ in range(int(r.integers(1, 4))):
                mutated[int(r.integers(0, len(blob)))] ^= int(r.integers(1, 256))
            try:
                out = decompress(bytes(mutated))
                assert out == data  # checksum must catch everything else
            except ZstdError:
                pass  # never IndexError/TypeError/... — those are crashes

    def test_concatenated_partial_frame(self, text_corpus):
        a = compress(text_corpus[:1000], 3)
        with pytest.raises(ZstdError):
            decompress(a + a[: len(a) // 2])


class TestFeatureMatrixDifferential:
    """Randomized parameter-combination fuzz: every frame we emit must be
    accepted bit-exactly by libzstd AND by our own decoder (the reference's
    differential strategy, ZstdTest.cs:69 shape, over the full feature
    matrix: levels x splitter x targetCBlockSize x LDM x checksum x flush)."""

    def _mixed_payload(self, r, n):
        parts = []
        while sum(map(len, parts)) < n:
            kind = int(r.integers(0, 5))
            if kind == 0:
                parts.append(b"lorem ipsum dolor sit amet " * int(r.integers(1, 60)))
            elif kind == 1:
                parts.append(r.integers(0, 256, int(r.integers(10, 4000)),
                                        dtype=np.uint8).tobytes())
            elif kind == 2:
                parts.append(bytes([int(r.integers(0, 256))]) * int(r.integers(4, 9000)))
            elif kind == 3:
                parts.append(b'{"k": %d}' % int(r.integers(0, 10 ** 9)))
            else:
                seed = r.integers(0, 256, 64, dtype=np.uint8).tobytes()
                parts.append(seed * int(r.integers(2, 40)))
        return b"".join(parts)[:n]

    def test_random_param_combinations(self):
        import zstandard

        from zstdsharp_tpu.encode.frame import compress as zc
        from zstdsharp_tpu.encode.params import CCtxParams

        r = np.random.default_rng(20260816)
        for trial in range(30):
            n = int(r.integers(100, 300_000))
            data = self._mixed_payload(r, n)
            level = int(r.choice([-5, -1, 1, 2, 3, 5, 7, 9, 12, 13, 16, 19]))
            p = CCtxParams(
                compression_level=level,
                checksum_flag=bool(r.integers(0, 2)),
                block_splitter=bool(r.integers(0, 2)) or None,
                target_cblock_size=int(r.choice([0, 0, 1340, 4096])),
                ldm=bool(r.integers(0, 2)) or None,
            )
            frame = zc(data, params=p)
            ref = zstandard.ZstdDecompressor().decompress(
                frame, max_output_size=2 * n + 64)
            assert ref == data, f"trial {trial}: level {level} params {p}"
            assert decompress(frame) == data

    def test_random_stream_flush_points(self):
        import io

        import zstandard

        from zstdsharp_tpu.streaming import CompressionStream

        r = np.random.default_rng(77)
        for trial in range(10):
            data = self._mixed_payload(r, int(r.integers(1000, 400_000)))
            sink = io.BytesIO()
            cs = CompressionStream(sink, level=int(r.choice([1, 3, 9, 13])))
            pos = 0
            while pos < len(data):
                step = int(r.integers(1, 70_000))
                cs.write(data[pos : pos + step])
                pos += step
                if r.integers(0, 3) == 0:
                    cs.flush()
            cs.close()
            out = zstandard.ZstdDecompressor().decompress(
                sink.getvalue(), max_output_size=2 * len(data) + 64)
            assert out == data, f"trial {trial}"
            assert decompress(sink.getvalue()) == data


def test_corrupt_frame_fuzz_native():
    """Bit flips, truncations, and injections into valid frames at several
    levels must raise ZstdError (or decode silently where the corruption
    lands in literal payload — matching libzstd without checksums), never
    escape as a non-zstd exception or crash."""
    import random

    import numpy as np

    from zstdsharp_tpu.encode.frame import compress
    from zstdsharp_tpu.decode.frame import decompress

    r = np.random.default_rng(99)
    rng = random.Random(7)
    words = [b"alpha", b"beta", b"gamma"]
    base = b" ".join(words[int(i)] for i in r.integers(0, 3, 8000))
    corpora = [compress(base, lvl) for lvl in (1, 9, 19)]
    for _ in range(1500):
        f = bytearray(rng.choice(corpora))
        mode = rng.random()
        if mode < 0.5:
            for _ in range(rng.randint(1, 8)):
                f[rng.randrange(len(f))] ^= 1 << rng.randrange(8)
        elif mode < 0.75:
            f = f[: rng.randrange(1, len(f))]
        else:
            ins = rng.randrange(len(f))
            f = f[:ins] + bytes([rng.randrange(256)] * rng.randint(1, 64)) + f[ins:]
        try:
            decompress(bytes(f))
        except (ZstdError, MemoryError):
            pass
