"""Bit-exactness vs libzstd — the reference's central differential contract
(ZstdTest.cs:69-90 asserts compressed bytes identical at every level).

The exact-path encoder reproduces zstd v1.5.1 semantics (the reference's
version).  The live oracle is libzstd 1.5.7, whose fast-strategy output is
bitwise unchanged since 1.5.1, so fast-strategy combinations assert strict
byte identity.  The doubleFast matcher was rewritten upstream after 1.5.1
(different visit/insert schedule), so dfast combinations assert byte
identity where it is known to hold and a tight size envelope elsewhere.
"""

import numpy as np
import pytest
import zstandard

from zstdsharp_tpu.decode.frame import decompress
from zstdsharp_tpu.encode.frame import Compressor, compress


def oracle(data: bytes, level: int, checksum: bool = False) -> bytes:
    return zstandard.ZstdCompressor(
        level=level, write_content_size=True,
        write_checksum=checksum).compress(data)


def _text(n, seed=42):
    r = np.random.default_rng(seed)
    words = [b"the", b"quick", b"brown", b"fox", b"jumps", b"compression",
             b"entropy", b"data", b"stream", b"block", b"sequence",
             b"huffman", b"finite", b"state"]
    out = b" ".join(words[int(i)] for i in r.integers(0, len(words), n // 5 + 2))
    return out[:n]


def _jsonish(n, seed=123):
    r = np.random.default_rng(seed)
    parts = []
    while sum(map(len, parts)) < n:
        parts.append(b'{"id": %d, "name": "user%d", "active": true},'
                     % (int(r.integers(0, 10**9)), int(r.integers(0, 10**4))))
    return b"".join(parts)[:n]


def _binary(n, seed=5):
    r = np.random.default_rng(seed)
    return r.integers(0, 256, n, dtype=np.uint8).tobytes()


def _periodic(n, seed=9):
    r = np.random.default_rng(seed)
    seed_block = r.integers(0, 256, 64, dtype=np.uint8).tobytes()
    return (seed_block * (n // 64 + 1))[:n]


CORPORA = {
    "text": _text,
    "json": _jsonish,
    "binary": _binary,
    "periodic": _periodic,
}

# (level, size) combinations that resolve to the fast strategy and must be
# byte-identical with the oracle (Clevels.cs:8 rows with strat == fast).
FAST_COMBOS = [
    (1, 1_000), (1, 16_000), (1, 100_000), (1, 300_000), (1, 805_000),
    (2, 1_000), (2, 16_000),                 # <=128KB classes: fast
    (2, 100_000),                            # <=128KB class row 2: fast
    (2, 300_000), (2, 805_000),              # >256KB class: fast
]

# dfast combinations: exact 1.5.1 semantics; the 1.5.7 oracle may pick a
# different sequence occasionally, so assert identity-or-tight-envelope.
DFAST_COMBOS = [
    (3, 1_000), (3, 16_000), (3, 300_000), (3, 805_000), (4, 805_000),
    (2, 140_000), (4, 300_000),
]


class TestFastStrategyBitIdentity:
    @pytest.mark.parametrize("kind", list(CORPORA))
    @pytest.mark.parametrize("level,size", FAST_COMBOS)
    def test_frames_byte_identical(self, kind, level, size):
        data = CORPORA[kind](size)
        ours = compress(data, level)
        theirs = oracle(data, level)
        assert ours == theirs, (
            f"{kind}/{size}B L{level}: {len(ours)} vs {len(theirs)} bytes")

    def test_empty_and_tiny(self):
        for data in (b"", b"a", b"ab", b"abcabcabc", b"\x00" * 100):
            for level in (1, 2, 3):
                assert compress(data, level) == oracle(data, level)

    def test_checksum_frames_identical(self):
        data = _text(200_000)
        ours = compress(data, 1, checksum=True)
        theirs = oracle(data, 1, checksum=True)
        assert ours == theirs

    def test_compressor_api_takes_exact_path(self):
        data = _jsonish(250_000)
        c = Compressor(level=1)
        assert c.wrap(data) == oracle(data, 1)

    def test_multi_block_frames(self):
        # > 128KB inputs exercise cross-block entropy repeat + repcodes
        data = _text(700_000, seed=77)
        assert compress(data, 1) == oracle(data, 1)
        assert compress(data, 2) == oracle(data, 2)

    def test_rle_and_incompressible_blocks(self):
        rle = b"Q" * 400_000
        assert compress(rle, 1) == oracle(rle, 1)
        rnd = _binary(400_000)
        assert compress(rnd, 1) == oracle(rnd, 1)
        # Heterogeneous content: libzstd 1.5.7's new content-adaptive block
        # pre-split (zstd_preSplit, absent from the 1.5.1 reference) moves
        # block boundaries, so frames differ; ours must stay no larger and
        # roundtrip through the oracle.
        mixed = rle[:200_000] + rnd[:200_000] + rle[:50_000]
        ours = compress(mixed, 1)
        theirs = oracle(mixed, 1)
        assert len(ours) <= len(theirs)
        assert zstandard.ZstdDecompressor().decompress(
            ours, max_output_size=len(mixed) + 1) == mixed


class TestDfastNearIdentity:
    @pytest.mark.parametrize("kind", list(CORPORA))
    @pytest.mark.parametrize("level,size", DFAST_COMBOS)
    def test_identical_or_tight(self, kind, level, size):
        data = CORPORA[kind](size)
        ours = compress(data, level)
        theirs = oracle(data, level)
        # always a valid frame the oracle decodes bit-exactly
        assert zstandard.ZstdDecompressor().decompress(
            ours, max_output_size=len(data) + 1) == data
        assert decompress(ours) == data
        if ours != theirs:
            assert len(ours) <= len(theirs) * 1.008, (
                f"{kind}/{size}B L{level}: {len(ours)} vs {len(theirs)}")

    def test_known_identical_case(self):
        # dfast on this corpus is byte-identical with the 1.5.7 oracle
        data = _text(805_000)
        assert compress(data, 4) == oracle(data, 4)


class TestOptExactStrategies:
    """The bt-optimal exact path (btopt/btultra/btultra2; ZstdOpt.cs:1046
    semantics with tree preservation across block limits + the exact block
    splitter, ZstdCompress.cs:4390).  The tree-preservation improvement
    means output is not byte-identical to the oracle; the contract is
    ratio at-or-below it."""

    @pytest.mark.parametrize("level", [16, 17, 18, 19, 22])
    def test_roundtrip_all_content(self, level):
        for gen in (_text, _jsonish, _binary, _periodic):
            data = gen(200_000)
            frame = compress(data, level)
            assert decompress(frame) == data
            assert zstandard.ZstdDecompressor().decompress(frame) == data

    @pytest.mark.parametrize("level", [19, 22])
    def test_ratio_beats_oracle_on_mixed(self, level):
        r = np.random.default_rng(77)
        data = (_text(400_000) + r.integers(0, 256, 150_000, np.uint8).tobytes()
                + _jsonish(300_000) + _periodic(200_000) + _text(300_000, 1))
        frame = compress(data, level)
        orc = oracle(data, level)
        assert decompress(frame) == data
        assert len(frame) <= len(orc) * 1.001, (len(frame), len(orc))

    @pytest.mark.parametrize("level", [16, 19])
    def test_ratio_close_on_text(self, level):
        data = _text(1_000_000)
        frame = compress(data, level)
        orc = oracle(data, level)
        assert decompress(frame) == data
        assert len(frame) <= len(orc) * 1.002, (len(frame), len(orc))

    def test_checksum_and_tiny_inputs(self):
        for data in (b"", b"a", b"abcabcabc" * 3, _text(900)):
            for level in (16, 19):
                frame = compress(data, level, checksum=True)
                assert zstandard.ZstdDecompressor().decompress(frame) == data
                assert decompress(frame) == data

    def test_rle_and_raw_partitions(self):
        # mixed block forcing raw sub-block emission (incompressible run)
        r = np.random.default_rng(3)
        data = (_text(120_000) + r.integers(0, 256, 120_000, np.uint8).tobytes()
                + b"\x55" * 100_000 + _text(120_000, 8))
        for level in (16, 19):
            frame = compress(data, level)
            assert decompress(frame) == data
            assert zstandard.ZstdDecompressor().decompress(frame) == data
            assert len(frame) <= len(oracle(data, level)) * 1.002
