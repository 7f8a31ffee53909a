"""Differential decoder tests: our decoder must bit-exactly reproduce the
content of frames produced by the reference oracle (libzstd via the
`zstandard` module) at every compression level.

This transplants the reference's differential strategy
(ZstdSharp.Test/ZstdTest.cs:69-90) to the decode direction.
"""

from pathlib import Path

import numpy as np
import pytest
import zstandard

ROOT = Path(__file__).resolve().parent.parent

from zstdsharp_tpu.decode import frame as dframe
from zstdsharp_tpu.errors import ZstdError

LEVELS = [-5, -3, -1, 1, 2, 3, 5, 7, 9, 12, 16, 19, 22]


def oracle_compress(data: bytes, level: int = 3, checksum: bool = False,
                    threads: int = 0) -> bytes:
    return zstandard.ZstdCompressor(level=level, write_checksum=checksum).compress(data)


class TestDecodeDifferential:
    @pytest.mark.parametrize("level", LEVELS)
    def test_text_corpus_all_levels(self, level, text_corpus):
        data = text_corpus[:300_000]
        frame = oracle_compress(data, level)
        assert dframe.decompress(frame) == data

    @pytest.mark.parametrize("level", [-1, 1, 3, 9, 19])
    def test_binary_corpus(self, level, binary_corpus):
        frame = oracle_compress(binary_corpus[:200_000], level)
        assert dframe.decompress(frame) == binary_corpus[:200_000]

    def test_with_checksum(self, text_corpus):
        data = text_corpus[:50_000]
        frame = oracle_compress(data, 3, checksum=True)
        assert dframe.decompress(frame) == data

    def test_checksum_detects_corruption(self, text_corpus):
        data = text_corpus[:50_000]
        frame = bytearray(oracle_compress(data, 3, checksum=True))
        frame[-1] ^= 0xFF  # stored checksum
        with pytest.raises(ZstdError):
            dframe.decompress(bytes(frame))

    @pytest.mark.parametrize("n", [0, 1, 2, 3, 5, 13, 31, 32, 100, 255, 1024])
    def test_edge_sizes(self, n, rng):
        data = rng.integers(0, 4, n, dtype=np.uint8).tobytes()
        assert dframe.decompress(oracle_compress(data, 3)) == data

    def test_incompressible(self, rng):
        data = rng.integers(0, 256, 100_000, dtype=np.uint8).tobytes()
        for level in (1, 19):
            assert dframe.decompress(oracle_compress(data, level)) == data

    def test_rle_heavy(self):
        data = b"\x00" * 100_000 + b"ab" * 500 + b"\xff" * 77777
        for level in (1, 5, 19):
            assert dframe.decompress(oracle_compress(data, level)) == data

    def test_multi_frame(self, text_corpus):
        a, b = text_corpus[:10_000], text_corpus[10_000:30_000]
        frames = oracle_compress(a, 3) + oracle_compress(b, 7)
        assert dframe.decompress(frames) == a + b

    def test_skippable_frame(self, text_corpus):
        data = text_corpus[:5000]
        skip = (0x184D2A50).to_bytes(4, "little") + (7).to_bytes(4, "little") + b"payload"
        combined = skip + oracle_compress(data, 3)
        assert dframe.decompress(combined) == data
        variant, content = dframe.read_skippable_frame(skip)
        assert variant == 0 and content == b"payload"

    def test_unknown_content_size(self, text_corpus):
        # Streaming oracle emits frames without FCS.
        data = text_corpus[:150_000]
        cctx = zstandard.ZstdCompressor(level=5)
        frame = cctx.compressobj().compress(data) + cctx.compressobj().flush()
        # compressobj needs single object:
        obj = zstandard.ZstdCompressor(level=5).compressobj()
        frame = obj.compress(data) + obj.flush()
        assert dframe.decompress(frame) == data

    def test_long_window_mode(self, text_corpus):
        data = (text_corpus[:100_000] * 3)[:280_000]
        cctx = zstandard.ZstdCompressor(level=19,
            compression_params=zstandard.ZstdCompressionParameters.from_level(
                19, enable_ldm=True, window_log=24))
        frame = cctx.compress(data)
        assert dframe.decompress(frame, max_window_log=24) == data

    def test_window_limit_enforced(self, text_corpus):
        cctx = zstandard.ZstdCompressor(
            compression_params=zstandard.ZstdCompressionParameters.from_level(
                3, window_log=26))
        obj = cctx.compressobj()
        frame = obj.compress(text_corpus[:1000]) + obj.flush()
        with pytest.raises(ZstdError):
            dframe.decompress(frame, max_window_log=20)

    def test_garbage_rejected(self):
        with pytest.raises(ZstdError):
            dframe.decompress(b"not a zstd frame at all")

    def test_truncated_rejected(self, text_corpus):
        frame = oracle_compress(text_corpus[:10_000], 3)
        with pytest.raises(ZstdError):
            dframe.decompress(frame[: len(frame) // 2])


class TestFrameIntrospection:
    def test_frame_info(self, text_corpus):
        data = text_corpus[:20_000]
        frame = oracle_compress(data, 3, checksum=True)
        info = dframe.frame_info(frame)
        assert info.compressed_size == len(frame)
        assert info.decompressed_size == len(data)
        assert info.has_checksum

    def test_decompress_bound(self, text_corpus):
        data = text_corpus[:20_000]
        frame = oracle_compress(data, 3)
        assert dframe.decompress_bound(frame) >= len(data)


class TestZstdSideExoticFrames:
    """Frames produced by libzstd with advanced parameters must decode
    bit-exactly through every tier (the reference's differential strategy
    in the decode direction, ZstdTest.cs:69 role)."""

    def test_zstd_dictionary_frames(self, sample_factory):
        import zstandard

        from zstdsharp_tpu.decode.frame import Decompressor
        from zstdsharp_tpu.dictionary import train_dictionary

        samples = [sample_factory() for _ in range(300)]
        d = train_dictionary(samples, 2048)
        zd = zstandard.ZstdCompressionDict(d)
        dec = Decompressor()
        dec.load_dictionary(d)
        for lvl in (1, 3, 9, 19):
            zc = zstandard.ZstdCompressor(level=lvl, dict_data=zd)
            for s in samples[:40]:
                assert dec.unwrap(zc.compress(s)) == s

    def test_zstd_small_window_many_blocks(self, text_corpus):
        import zstandard

        from zstdsharp_tpu.decode.frame import decompress

        data = text_corpus[:400_000]
        p = zstandard.ZstdCompressionParameters.from_level(9, window_log=11)
        frame = zstandard.ZstdCompressor(compression_params=p).compress(data)
        assert decompress(frame) == data

    def test_zstd_ldm_large_window(self, rng):
        import zstandard

        from zstdsharp_tpu.decode.frame import decompress

        seg = rng.integers(0, 256, 700_000, dtype=np.uint8).tobytes()
        data = seg + b"filler " * 30_000 + seg[:400_000]
        p = zstandard.ZstdCompressionParameters.from_level(
            16, enable_ldm=1, window_log=24)
        frame = zstandard.ZstdCompressor(compression_params=p).compress(data)
        assert decompress(frame, max_window_log=26) == data

    def test_zstd_write_content_size_off(self, text_corpus):
        import zstandard

        from zstdsharp_tpu.decode.frame import decompress

        data = text_corpus[:100_000]
        zc = zstandard.ZstdCompressor(level=5, write_content_size=False)
        frame = zc.compress(data)
        assert decompress(frame) == data


def test_long_offset_decode_stress():
    """Matches at distances far beyond 64KB (long-offset regime the
    reference serves with its prefetch decoder, ZstdDecompressBlock.cs:2796):
    both directions must survive a >1MB window with cross-block matches."""
    import zstandard

    from zstdsharp_tpu.decode.frame import decompress as ours_d
    from zstdsharp_tpu.encode.frame import compress as ours_c

    r = np.random.default_rng(424242)
    unit = r.integers(0, 256, 80_000, dtype=np.uint8).tobytes()
    filler = (b"abcdefgh" * 20_000)  # 160KB of compressible distance
    data = unit + filler + unit + filler[:90_000] + unit  # offsets ~90K-240K
    # oracle frame (level 19 emits large offsets) -> our decoder
    blob = zstandard.ZstdCompressor(level=19).compress(data)
    assert ours_d(blob) == data
    # our frame at a long-window level -> oracle + ourselves
    frame = ours_c(data, 17)
    assert zstandard.ZstdDecompressor().decompress(
        frame, max_output_size=len(data) + 1) == data
    assert ours_d(frame) == data


def test_staged_decode_variant_matches():
    """The two-pass (array-staged) sequence decoder behind ZT_STAGED must
    produce identical output to the fused default."""
    import os
    import subprocess
    import sys

    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import numpy as np\n"
        "from zstdsharp_tpu.encode.frame import compress\n"
        "from zstdsharp_tpu.decode.frame import decompress\n"
        "r = np.random.default_rng(5)\n"
        "words = [b'zeta', b'eta', b'theta', b'iota']\n"
        "data = b' '.join(words[int(i)] for i in r.integers(0, 4, 200_000))\n"
        "for lvl in (1, 9, 19):\n"
        "    f = compress(data, lvl)\n"
        "    assert decompress(f) == data, lvl\n"
        "print('ok')\n" % str(ROOT))
    env = dict(os.environ, ZT_STAGED="1")
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0 and "ok" in r.stdout, r.stderr[-500:]


def test_long_offset_pipeline_boundary():
    """Frames whose history crosses the 16MB long-offset heuristic gate
    must decode bit-exact through both the fused and prefetch pipelines
    (the selection happens per block mid-frame)."""
    r = np.random.default_rng(11)
    words = [b"kappa", b"lambda", b"mu", b"nu"]
    base = b" ".join(words[int(i)] for i in r.integers(0, 4, 1_600_000))
    data = base + base[: 4 << 20] + base  # repeats at multi-MB distances
    assert len(data) > (18 << 20)
    frame = zstandard.ZstdCompressor(level=12, write_content_size=True).compress(data)
    assert dframe.decompress(frame) == data
