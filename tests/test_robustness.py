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
            except (ZstdError, Exception):
                pass
        # checksum is on: silent wrong output must be impossible
        assert silent_wrong == 0

    def test_truncations(self, frame):
        blob, _ = frame
        for cut in (1, 4, 5, 9, len(blob) // 2, len(blob) - 1):
            with pytest.raises((ZstdError, Exception)):
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
            except (ZstdError, Exception):
                pass

    def test_concatenated_partial_frame(self, text_corpus):
        a = compress(text_corpus[:1000], 3)
        with pytest.raises((ZstdError, Exception)):
            decompress(a + a[: len(a) // 2])
