"""Byte-identity vs the pinned libzstd 1.5.4 oracle (see oracle154.py).

Extends the identity matrix beyond what the 1.5.7 `zstandard` oracle can
witness: the reference's dfast strategy (rewritten upstream in 1.5.5) is
asserted STRICTLY identical here, closing the gap where test_bitexact.py
could only assert a size envelope (ZstdTest.cs:69-90 is the reference's
all-levels identity contract).
"""

import numpy as np
import pytest

from zstdsharp_tpu.decode.frame import decompress
from zstdsharp_tpu.encode.frame import compress

from oracle154 import available, compress154

pytestmark = pytest.mark.skipif(not available(),
                                reason="libzstd 1.5.4 not present")


def _text(n, seed=42):
    r = np.random.default_rng(seed)
    words = [b"the", b"quick", b"brown", b"fox", b"jumps", b"compression",
             b"entropy", b"data", b"stream", b"block", b"sequence",
             b"huffman", b"finite", b"state"]
    return b" ".join(words[int(i)]
                     for i in r.integers(0, len(words), n // 5 + 2))[:n]


def _jsonish(n, seed=123):
    r = np.random.default_rng(seed)
    parts = []
    while sum(map(len, parts)) < n:
        parts.append(b'{"id": %d, "name": "user%d", "active": true},'
                     % (int(r.integers(0, 10**9)), int(r.integers(0, 10**4))))
    return b"".join(parts)[:n]


def _periodic(n, seed=9):
    r = np.random.default_rng(seed)
    blk = r.integers(0, 256, 64, dtype=np.uint8).tobytes()
    return (blk * (n // 64 + 1))[:n]


CORPORA = {"text": _text, "json": _jsonish, "periodic": _periodic}

# (level, size) rows that resolve to the dfast strategy (Clevels.cs:8):
# level 3 everywhere, level 4 at the >256KB size classes, level 2 in the
# 128-256KB class.
DFAST_COMBOS = [
    (3, 1_000), (3, 16_000), (3, 100_000), (3, 300_000), (3, 805_000),
    (4, 300_000), (4, 805_000), (2, 140_000),
]

# fast-strategy rows must agree with BOTH oracles (1.5.4 and 1.5.7).
FAST_COMBOS = [(1, 16_000), (1, 300_000), (2, 16_000), (2, 805_000)]


class TestDfastIdentity154:
    @pytest.mark.parametrize("kind", list(CORPORA))
    @pytest.mark.parametrize("level,size", DFAST_COMBOS)
    def test_frames_byte_identical(self, kind, level, size):
        data = CORPORA[kind](size)
        ours = compress(data, level)
        theirs = compress154(data, level)
        assert ours == theirs, (
            f"{kind}/{size}B L{level}: {len(ours)} vs {len(theirs)} bytes")

    def test_checksum_frames(self):
        data = _text(120_000)
        assert compress(data, 3, checksum=True) == \
            compress154(data, 3, checksum=True)

    def test_roundtrip_154_frames(self):
        # our decoder consumes 1.5.4 frames at dfast levels
        data = _jsonish(250_000)
        assert decompress(compress154(data, 3)) == data


class TestNegativeLevelIdentity154:
    @pytest.mark.parametrize("size", [1_000, 16_000, 300_000, 805_000])
    def test_level_minus1_identical(self, size):
        # Level -1 is fast-strategy with targetLength 1, i.e. step 2 — the
        # same schedule as the unstepped matcher, which 1.5.4 still shares
        # with 1.5.1.  Deeper negative levels use accelerated stepping that
        # upstream changed after 1.5.1 (verified empirically: 1.5.4 output
        # at -3/-5 differs from the 1.5.1-exact matcher), so no available
        # oracle can witness them; they stay on the legacy pipeline, whose
        # output is consistently smaller.
        data = _text(size)
        assert compress(data, -1) == compress154(data, -1)


class TestFastIdentity154:
    @pytest.mark.parametrize("kind", list(CORPORA))
    @pytest.mark.parametrize("level,size", FAST_COMBOS)
    def test_frames_byte_identical(self, kind, level, size):
        data = CORPORA[kind](size)
        assert compress(data, level) == compress154(data, level)


class TestBtRatioGuardrail154:
    """The bt tiers (13-22) are deliberately NOT byte-compatible: this
    repo's optimal parser is a re-derived SoA implementation (see
    encode/seqstore.py), and the parses diverge from the first sequence
    (measured: ours picks (ll=18,ml=3) where 1.5.4 prices (ll=28,ml=9) on
    the text corpus).  The enforced contract at these levels is RATIO:
    output within a small envelope of the pinned oracle, and usually
    smaller (real corpora beat libzstd at 13-18).  These bounds pin the
    current state so regressions surface."""

    @pytest.mark.parametrize("kind", list(CORPORA))
    @pytest.mark.parametrize("level,bound", [(13, 1.05), (16, 1.015),
                                             (19, 1.005), (22, 1.005)])
    def test_size_envelope(self, kind, level, bound):
        for size in (16_000, 100_000, 300_000):
            data = CORPORA[kind](size)
            ours = len(compress(data, level))
            theirs = len(compress154(data, level))
            assert ours <= theirs * bound + 16, (
                f"{kind}/{size} L{level}: {ours} vs oracle {theirs}")
