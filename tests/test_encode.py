"""Encoder tests: our frames must decode bit-exactly via BOTH the libzstd
oracle and our own decoder, and compressed sizes must be competitive."""

import numpy as np
import pytest
import zstandard

from zstdsharp_tpu.decode import frame as dframe
from zstdsharp_tpu.encode import frame as eframe
from zstdsharp_tpu.encode.params import CCtxParams

LEVELS = [-3, 1, 2, 3, 5, 7, 9, 12, 13, 16, 19, 22]


def oracle_decompress(frame: bytes, expected_size: int | None = None) -> bytes:
    d = zstandard.ZstdDecompressor()
    if expected_size is not None:
        return d.decompress(frame, max_output_size=max(expected_size, 1))
    return d.decompress(frame)


class TestEncodeRoundtrip:
    @pytest.mark.parametrize("level", LEVELS)
    def test_text_roundtrip_oracle(self, level, text_corpus):
        data = text_corpus[:150_000]
        frame = eframe.compress(data, level)
        assert oracle_decompress(frame) == data
        assert dframe.decompress(frame) == data

    @pytest.mark.parametrize("level", [1, 3, 5])
    def test_binary_roundtrip(self, level, binary_corpus):
        data = binary_corpus[:150_000]
        frame = eframe.compress(data, level)
        assert oracle_decompress(frame) == data
        assert dframe.decompress(frame) == data

    @pytest.mark.parametrize("n", [0, 1, 2, 3, 4, 5, 8, 13, 31, 32, 63, 64, 100,
                                   255, 256, 1000, 1024, 65536])
    def test_edge_sizes(self, n, rng):
        data = rng.integers(0, 5, n, dtype=np.uint8).tobytes()
        frame = eframe.compress(data, 3)
        assert oracle_decompress(frame, n) == data
        assert dframe.decompress(frame) == data

    def test_multi_block_frame(self, text_corpus):
        # > 128KB forces multiple blocks; matches may cross block boundaries.
        data = (text_corpus[:200_000] + text_corpus[:100_000])
        frame = eframe.compress(data, 1)
        assert oracle_decompress(frame) == data
        assert dframe.decompress(frame) == data

    def test_rle_input(self):
        data = b"\x42" * 300_000
        frame = eframe.compress(data, 3)
        assert len(frame) < 100
        assert oracle_decompress(frame) == data
        assert dframe.decompress(frame) == data

    def test_incompressible_uses_raw_blocks(self, rng):
        data = rng.integers(0, 256, 200_000, dtype=np.uint8).tobytes()
        frame = eframe.compress(data, 3)
        assert len(frame) <= eframe.compress_bound(len(data))
        assert len(frame) < len(data) + 200  # raw blocks + headers only
        assert oracle_decompress(frame) == data

    def test_checksum(self, text_corpus):
        data = text_corpus[:10_000]
        frame = eframe.compress(data, 3, checksum=True)
        assert oracle_decompress(frame) == data
        assert dframe.decompress(frame) == data  # verifies checksum internally

    def test_compression_reduces_size(self, text_corpus):
        data = text_corpus[:150_000]
        for level in (1, 5):
            assert len(eframe.compress(data, level)) < len(data) // 2

    @pytest.mark.parametrize("level", [1, 3, 5, 9])
    def test_ratio_parity_vs_oracle(self, level, text_corpus):
        """Compressed size must stay within 20% of libzstd at the same level
        (round-1 target; PARITY.md tracks convergence to <= oracle)."""
        data = text_corpus[:150_000]
        ours = len(eframe.compress(data, level))
        theirs = len(zstandard.ZstdCompressor(level=level).compress(data))
        assert ours < theirs * 1.20, f"L{level}: ours {ours} vs oracle {theirs}"

    def test_ratio_beats_oracle_on_real_files(self):
        """Size <= libzstd on the bench real-file corpus at the cells the
        round-3 work closed: L1 byte-count parity, the lazy tier (5/9)
        strictly winning (VERDICT r2 item 6).  L19 remains within +0.1% and
        is tracked in PARITY.md rather than asserted; L13+ are covered by
        the bench artifact (content mix there is level-sensitive)."""
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).parent.parent))
        from bench import make_real_corpus

        data = make_real_corpus(4 << 20)
        for level in (1, 5, 9):
            ours = len(eframe.compress(data, level))
            theirs = len(zstandard.ZstdCompressor(level=level).compress(data))
            assert ours <= theirs * 1.0001, (
                f"L{level}: ours {ours} vs oracle {theirs}")

    def test_skippable_frame_writer(self):
        frame = eframe.write_skippable_frame(b"metadata", 3)
        variant, content = dframe.read_skippable_frame(frame)
        assert variant == 3 and content == b"metadata"

    def test_compressor_class(self, text_corpus):
        comp = eframe.Compressor(level=5)
        data = text_corpus[:20_000]
        frame = comp.wrap(data)
        assert oracle_decompress(frame) == data
        comp.level = 1
        assert comp.level == 1
        assert comp.get_compress_bound(1000) >= 1000

    def test_structured_json_like(self, sample_factory):
        data = b"".join(sample_factory() for _ in range(2000))
        for level in (1, 3, 9):
            frame = eframe.compress(data, level)
            assert oracle_decompress(frame) == data
            assert dframe.decompress(frame) == data


class TestBlockSplitterAndSuperblock:
    """Block splitter (ZSTD_deriveBlockSplitsHelper:4328 role) and
    targetCBlockSize (ZSTD_compressSuperBlock:584 role)."""

    @staticmethod
    def _block_sizes(frame: bytes) -> list[int]:
        arr = np.frombuffer(frame, np.uint8)
        hdr = dframe.parse_frame_header(arr)
        off, sizes = hdr.header_size, []
        while off < len(frame):
            bh = frame[off] | frame[off + 1] << 8 | frame[off + 2] << 16
            last, btype, bsize = bh & 1, (bh >> 1) & 3, bh >> 3
            sizes.append(bsize)
            off += 3 + (1 if btype == 1 else bsize)
            if last:
                break
        return sizes

    def test_splitter_partitions_heterogeneous_block(self, rng):
        words = [b"alpha", b"beta", b"gamma", b"delta", b"epsilon", b"zeta",
                 b"theta", b"kappa", b"lambda", b"sigma"]
        idx = rng.integers(0, len(words), 20_000)
        text = b" ".join(words[i] for i in idx)[: 64 << 10]
        rand = rng.integers(0, 256, 64 << 10, dtype=np.uint8).tobytes()
        mixed = text + rand  # one 128KB block with a sharp statistics change
        frame = eframe.compress(mixed, 19)
        assert oracle_decompress(frame) == mixed
        assert len(self._block_sizes(frame)) >= 2

    def test_target_cblock_size_bounds_partitions(self, text_corpus):
        data = text_corpus[:512_000]
        p = CCtxParams(compression_level=9, target_cblock_size=4096)
        frame = eframe.compress(data, params=p)
        assert oracle_decompress(frame) == data
        base = eframe.compress(data, 9)
        sizes = self._block_sizes(frame)
        assert len(sizes) > len(self._block_sizes(base))
        import statistics
        assert statistics.median(sizes) < 8192

    @pytest.mark.parametrize("level", [13, 16, 19])
    def test_high_level_ratio_near_oracle(self, level, text_corpus, rng):
        """Optimal-parser levels must stay within 6% of libzstd (adaptive
        prices + DUBT all-matches; PARITY.md tracks the remainder)."""
        data = text_corpus[:300_000] + rng.integers(
            0, 64, 50_000, dtype=np.uint8).tobytes()
        ours = len(eframe.compress(data, level))
        theirs = len(zstandard.ZstdCompressor(level=level).compress(data))
        assert ours < theirs * 1.06, f"L{level}: ours {ours} vs oracle {theirs}"


def test_tree_preservation_is_a_pure_win(text_corpus):
    """The bt levels deviate from the reference by keeping BT subtrees
    alive across block limits (PARITY.md deviation #1).  Assert the
    deviation's justification: output with preservation (default) is never
    larger than with the reference's block-boundary chop
    (ZT_TREE_PRESERVE=0), and both roundtrip.  Subprocesses because the
    knob is a read-once process static."""
    import os
    import pathlib
    import subprocess
    import sys
    import tempfile

    data = text_corpus[:400_000]
    with tempfile.NamedTemporaryFile(suffix=".bin", delete=False) as tf:
        tf.write(data)
        path = tf.name
    worker = (
        "import sys, pathlib\n"
        "sys.path.insert(0, %r)\n"
        "data = pathlib.Path(%r).read_bytes()\n"
        "from zstdsharp_tpu import compress, decompress\n"
        "f = compress(data, 19)\n"
        "assert decompress(f) == data\n"
        "print(len(f))\n"
    ) % (str(pathlib.Path(__file__).parent.parent), path)
    try:
        sizes = {}
        for flag in ("0", "1"):
            env = dict(os.environ, ZT_TREE_PRESERVE=flag)
            out = subprocess.run([sys.executable, "-c", worker],
                                 capture_output=True, text=True, env=env,
                                 timeout=300)
            assert out.returncode == 0, out.stderr[-400:]
            sizes[flag] = int(out.stdout)
        assert sizes["1"] <= sizes["0"], sizes
    finally:
        os.unlink(path)


def test_raw_fallback_keeps_rep_and_entropy_state(rng):
    """A block that falls back to RAW must not advance repcodes or
    repeat-mode entropy tables (ZSTD_confirmRepcodesAndEntropyTables
    role): later blocks' rep references would desync from the decoder.
    Small windows force tiny blocks with frequent raw fallbacks."""
    import zstandard

    text = b"the quick brown fox " * 400
    noise = rng.integers(0, 256, 30_000, dtype=np.uint8).tobytes()
    data = (text + noise + text + noise[:5_000] + text) * 3
    for level in (1, 3, 6, 13, 19):
        p = CCtxParams(compression_level=level, window_log=11)
        frame = eframe.compress(data, params=p)
        assert zstandard.ZstdDecompressor(max_window_size=1 << 27).decompress(
            frame, max_output_size=len(data) + 64) == data
        assert dframe.decompress(frame, max_window_log=27) == data


class TestSuperblockEmission:
    """True superblock format (ZstdCompressSuperblock.cs:584 role):
    sub-blocks around targetCBlockSize share one entropy table set — the
    first sub-block carries the tables, the rest use repeat modes."""

    def _blocks(self, frame):
        from zstdsharp_tpu.decode.frame import parse_frame_header
        hdr = parse_frame_header(np.frombuffer(frame, np.uint8))
        p = hdr.header_size
        out = []
        while True:
            bh = int.from_bytes(frame[p : p + 3], "little")
            last, btype, bsize = bh & 1, (bh >> 1) & 3, bh >> 3
            out.append((btype, bsize, bytes(frame[p + 3 : p + 3 + bsize])))
            p += 3 + (1 if btype == 1 else bsize)
            if last:
                break
        return out

    @pytest.mark.parametrize("tcbs", [1024, 4096])
    @pytest.mark.parametrize("level", [3, 9, 19])
    def test_roundtrip_and_target(self, tcbs, level, text_corpus):
        import statistics

        data = text_corpus[:400_000]
        p = CCtxParams(compression_level=level, target_cblock_size=tcbs)
        frame = eframe.compress(data, params=p)
        assert oracle_decompress(frame) == data
        sizes = [s for t, s, _ in self._blocks(frame) if t == 2]
        assert statistics.median(sizes) <= tcbs + 3

    def test_repeat_mode_sub_blocks(self, text_corpus):
        """Later sub-blocks of a block must use Repeat sequence modes
        (shared tables), not re-send NCounts."""
        data = text_corpus[:200_000]
        p = CCtxParams(compression_level=9, target_cblock_size=2048)
        frame = eframe.compress(data, params=p)
        assert oracle_decompress(frame) == data
        blocks = self._blocks(frame)
        repeat_headers = 0
        for t, s, payload in blocks[1:6]:
            if t != 2 or len(payload) < 8:
                continue
            # literals section: parse its header to find the seq section
            b0 = payload[0]
            lit_type = b0 & 3
            fmt = (b0 >> 2) & 3
            if lit_type in (0, 1):
                lh = 1 + (fmt & 1) + (fmt == 3)
                regen = 0
                n = lh + ((b0 >> 3) if fmt in (0, 2) else 0)
                continue  # raw/rle literal header parsing: skip detail
            # compressed literals (size_format 00/01 -> 3-byte header)
            if fmt in (0, 1):
                v = int.from_bytes(payload[0:3], "little")
                comp, lh = (v >> 14) & 0x3FF, 3
            elif fmt == 2:
                v = int.from_bytes(payload[0:4], "little")
                comp, lh = (v >> 18) & 0x3FFF, 4
            else:
                v = int.from_bytes(payload[0:5], "little")
                comp, lh = (v >> 22) & 0x3FFFF, 5
            seq = payload[lh + comp :]
            if not seq:
                continue
            nb = seq[0]
            off = 1
            if nb >= 128:
                off = 2 if nb < 0xFF else 3
            if len(seq) <= off:
                continue
            mode = seq[off]
            if mode == (3 << 6) + (3 << 4) + (3 << 2):
                repeat_headers += 1
            # treeless literals flag on later sub-blocks
            if lit_type == 3:
                repeat_headers += 1
        assert repeat_headers > 0, "no repeat-mode sub-blocks found"

    def test_mixed_content_trailing_raw(self, rng, text_corpus):
        """Incompressible spans inside a superblock fall to raw sub-blocks
        with repcode history kept consistent."""
        data = (text_corpus[:100_000]
                + rng.integers(0, 256, 200_000, np.uint8).tobytes()
                + text_corpus[:100_000])
        for tcbs in (1024, 4096):
            p = CCtxParams(compression_level=9, target_cblock_size=tcbs)
            frame = eframe.compress(data, params=p)
            assert oracle_decompress(frame) == data
