"""API-surface tests: external sequence API, workers, progression,
try_wrap, multi-dict selection, public package exports."""

import numpy as np
import pytest
import zstandard

import zstdsharp_tpu
from zstdsharp_tpu.decode.frame import Decompressor, decompress
from zstdsharp_tpu.encode.frame import Compressor, FrameEncoder, compress
from zstdsharp_tpu.encode.params import CCtxParams
from zstdsharp_tpu.encode.sequences_api import (Sequence, compress_sequences,
                                                generate_sequences,
                                                merge_block_delimiters)
from zstdsharp_tpu.errors import ZstdError


class TestSequenceApi:
    def test_generate_and_recompress(self, text_corpus):
        data = text_corpus[:60_000]
        seqs = generate_sequences(data, level=3)
        assert seqs[-1].match_length == 0 and seqs[-1].offset == 0
        # every non-delimiter sequence must reproduce its bytes
        pos = 0
        for s in seqs:
            pos += s.lit_length
            if s.offset:
                assert data[pos : pos + s.match_length] == \
                    data[pos - s.offset : pos - s.offset + s.match_length]
                pos += s.match_length
        assert pos == len(data)
        frame = compress_sequences(seqs, data)
        assert decompress(frame) == data
        assert zstandard.ZstdDecompressor().decompress(
            frame, max_output_size=len(data) + 1) == data

    def test_merge_delimiters(self):
        seqs = [Sequence(5, 2, 10), Sequence(0, 3, 0), Sequence(7, 1, 4),
                Sequence(0, 2, 0)]
        merged = merge_block_delimiters(seqs)
        assert merged[1].lit_length == 4  # 3 carried + 1
        assert merged[-1].offset == 0 and merged[-1].lit_length == 2

    def test_invalid_sequences_rejected(self, text_corpus):
        data = text_corpus[:1000]
        bad = [Sequence(99999, 10, 50), Sequence(0, len(data) - 60, 0)]
        with pytest.raises(ZstdError):
            compress_sequences(bad, data)

    def test_handcrafted_sequences(self):
        data = b"abcdabcdabcdabcd" + b"xyz"
        seqs = [Sequence(4, 4, 12), Sequence(0, 3, 0)]
        frame = compress_sequences(seqs, data)
        assert decompress(frame) == data


class TestWorkers:
    def test_multiframe_workers(self, text_corpus):
        data = (text_corpus * 3)[: 1 << 20]
        p = CCtxParams(compression_level=1, n_workers=4)
        frame = compress(data, params=p)
        assert decompress(frame) == data
        import io

        reader = zstandard.ZstdDecompressor().stream_reader(io.BytesIO(frame))
        assert reader.read() == data

    def test_workers_zero_single_frame(self, text_corpus):
        frame = compress(text_corpus[:10_000], 1)
        from zstdsharp_tpu.decode.frame import frame_info

        assert frame_info(frame).compressed_size == len(frame)


class TestIntrospection:
    def test_progression(self, text_corpus):
        params = CCtxParams(compression_level=1, content_size_flag=False)
        enc = FrameEncoder(params.resolve())
        enc.feed(text_corpus[:200_000])
        prog = enc.progression
        assert prog["ingested"] == 200_000
        assert prog["consumed"] % (1 << 17) == 0
        assert enc.to_flush_now() == prog["ingested"] - prog["consumed"]

    def test_try_wrap(self, text_corpus):
        comp = Compressor(level=3)
        ok, frame = comp.try_wrap(text_corpus[:10_000], dest_capacity=10)
        assert not ok and frame == b""
        ok, frame = comp.try_wrap(text_corpus[:10_000], dest_capacity=1 << 20)
        assert ok and decompress(frame) == text_corpus[:10_000]


class TestMultiDict:
    def test_dict_selection_by_id(self, rng):
        samples = [bytes(rng.integers(97, 110, 200, dtype=np.uint8)) + b'{"k":1}' * 20
                   for _ in range(40)]
        d1 = zstandard.train_dictionary(2048, samples[:20]).as_bytes()
        d2 = zstandard.train_dictionary(2048, samples[20:]).as_bytes()
        from zstdsharp_tpu.dictionary import ZstdCompressionDict

        z1, z2 = ZstdCompressionDict(d1), ZstdCompressionDict(d2)
        assert z1.dict_id != z2.dict_id
        dec = Decompressor()
        dec.load_dictionaries([d1, d2])
        f1 = zstandard.ZstdCompressor(
            dict_data=zstandard.ZstdCompressionDict(d1)).compress(samples[0])
        f2 = zstandard.ZstdCompressor(
            dict_data=zstandard.ZstdCompressionDict(d2)).compress(samples[-1])
        assert dec.unwrap(f1) == samples[0]
        assert dec.unwrap(f2) == samples[-1]


class TestPackageSurface:
    def test_top_level_exports(self, text_corpus):
        data = text_corpus[:5000]
        frame = zstdsharp_tpu.compress(data, level=5)
        assert zstdsharp_tpu.decompress(frame) == data
        assert zstdsharp_tpu.compress_bound(1000) >= 1000
        c = zstdsharp_tpu.Compressor(level=1)
        d = zstdsharp_tpu.Decompressor()
        assert d.unwrap(c.wrap(data)) == data

    def test_version(self):
        assert zstdsharp_tpu.__version__


class TestLongDistanceMatching:
    def test_ldm_finds_far_repeats(self):
        import numpy as np
        import zstandard

        words = [b"alpha", b"beta", b"gamma", b"delta", b"ep", b"ze", b"et", b"th"]

        def text(n, seed):
            rr = np.random.default_rng(seed)
            return b" ".join(words[i] for i in rr.choice(8, n))

        blk = text(300_000, 1)
        data = blk + text(250_000, 2) + blk  # repeat ~2.5 MB apart
        p_ldm = CCtxParams(compression_level=5, window_log=23, ldm=True)
        p_no = CCtxParams(compression_level=5, window_log=23, ldm=False,
                          chain_log=14)
        f_ldm = compress(data, params=p_ldm)
        f_no = compress(data, params=p_no)
        assert decompress(f_ldm, max_window_log=23) == data
        assert zstandard.ZstdDecompressor(max_window_size=1 << 23).decompress(
            f_ldm, max_output_size=len(data) + 1) == data
        assert len(f_ldm) < len(f_no) * 0.75

    def test_ldm_auto_resolution(self):
        p = CCtxParams(compression_level=19, window_log=27).resolve(1 << 24)
        assert p.ldm  # auto-on for large windows at high levels
        p2 = CCtxParams(compression_level=3).resolve(10_000)
        assert not p2.ldm


class TestTraceHooks:
    def test_trace_events(self, text_corpus):
        from zstdsharp_tpu.utils import trace

        events = []
        trace.register(events.append)
        try:
            data = text_corpus[:5000]
            frame = compress(data, 3)
            decompress(frame)
        finally:
            trace.unregister(events.append)
        kinds = [e.kind for e in events]
        assert "compress_begin" in kinds and "compress_end" in kinds
        assert "decompress_end" in kinds
        end = next(e for e in events if e.kind == "compress_end")
        assert end.dst_size == len(frame) and end.duration_s > 0


def test_find_frame_compressed_size():
    from zstdsharp_tpu.decode.frame import find_frame_compressed_size
    from zstdsharp_tpu.encode.frame import compress, write_skippable_frame

    a = compress(b"hello world " * 100, 3, checksum=True)
    b = compress(b"second frame", 1)
    skip = write_skippable_frame(b"meta", 0)
    stream = a + skip + b
    n1 = find_frame_compressed_size(stream)
    assert n1 == len(a)
    n2 = find_frame_compressed_size(stream[n1:])
    assert n2 == len(skip)
    assert find_frame_compressed_size(stream[n1 + n2:]) == len(b)


def test_estimate_sizes_positive_and_ordered():
    from zstdsharp_tpu.encode.params import estimate_cctx_size, estimate_dctx_size

    small = estimate_cctx_size(1)
    big = estimate_cctx_size(19)
    assert 0 < small < big
    assert estimate_dctx_size() > 0


def test_streaming_no_forward_progress_guard():
    import pytest

    from zstdsharp_tpu.decode.streaming import StreamingDecompressor
    from zstdsharp_tpu.errors import ZstdError

    d = StreamingDecompressor()
    d.feed(b"\x28\xb5\x2f\xfd")  # magic only; decoder now waits for header
    with pytest.raises(ZstdError):
        for _ in range(20):  # empty feeds: must abort, not spin forever
            d.feed(b"")


def test_n_workers_multiframe_stream():
    """compress(n_workers=N) emits a valid multi-frame stream (frame
    concatenation, RFC 8878 §3): every frame decodes through libzstd and
    the whole stream through our decoder."""
    import zstandard

    import zstdsharp_tpu as zt
    from zstdsharp_tpu.decode.frame import find_frame_compressed_size
    from zstdsharp_tpu.encode.params import CCtxParams

    rng = __import__("numpy").random.default_rng(9)
    data = rng.integers(0, 64, 600_000, dtype="uint8").tobytes()
    c = zt.compress(data, params=CCtxParams(compression_level=3, n_workers=4))
    assert zt.decompress(c) == data
    pos, parts = 0, []
    while pos < len(c):
        n = find_frame_compressed_size(c[pos:])
        parts.append(zstandard.ZstdDecompressor().decompress(
            c[pos : pos + n], max_output_size=len(data)))
        pos += n
    assert b"".join(parts) == data and len(parts) > 1


def test_parallel_multiframe_decode():
    """decompress(n_workers=N): frame-parallel decode of a multi-frame
    stream (the decode-side pair of compress(n_workers=))."""
    import numpy as np

    import zstdsharp_tpu as zt
    from zstdsharp_tpu.decode.frame import decompress
    from zstdsharp_tpu.encode.frame import write_skippable_frame
    from zstdsharp_tpu.encode.params import CCtxParams

    rng = np.random.default_rng(4)
    data = rng.integers(0, 50, 500_000, dtype="uint8").tobytes()
    stream = zt.compress(data, params=CCtxParams(compression_level=3,
                                                 n_workers=4))
    stream += write_skippable_frame(b"meta", 1)
    stream += zt.compress(b"tail frame", level=1)
    expect = data + b"tail frame"
    assert decompress(stream, n_workers=4) == expect
    assert decompress(stream) == expect


class TestSetTimeParamValidation:
    """set_parameter validates bounds at SET time, not at wrap
    (ZSTD_CCtx_setParameter:784 / ZSTD_cParam_getBounds:444)."""

    def test_every_public_param_bounds(self):
        import pytest

        from zstdsharp_tpu import Compressor
        from zstdsharp_tpu.encode.params import PARAM_BOUNDS
        from zstdsharp_tpu.errors import ZstdError

        c = Compressor()
        for name, (lo, hi) in PARAM_BOUNDS.items():
            if name == "compression_level":
                # levels clamp (ZSTD_cParam_clampBounds:702)
                c.set_parameter(name, hi + 1000)
                assert c.get_parameter(name) == hi
                c.set_parameter(name, lo - 1000)
                assert c.get_parameter(name) == lo
                continue
            c.set_parameter(name, lo)
            assert c.get_parameter(name) == lo
            c.set_parameter(name, hi)
            assert c.get_parameter(name) == hi
            with pytest.raises(ZstdError):
                c.set_parameter(name, hi + 1)
            if lo > 1:
                with pytest.raises(ZstdError):
                    c.set_parameter(name, lo - 1)

    def test_window_log_99_raises_at_set_time(self):
        import pytest

        from zstdsharp_tpu import Compressor
        from zstdsharp_tpu.errors import ZstdError

        c = Compressor()
        with pytest.raises(ZstdError):
            c.set_parameter("window_log", 99)

    def test_zero_resets_to_auto(self):
        from zstdsharp_tpu import Compressor

        c = Compressor()
        c.set_parameter("window_log", 20)
        c.set_parameter("window_log", 0)
        assert c.get_parameter("window_log") == 0
        assert c.wrap(b"hello world" * 100)

    def test_bools_and_tristates(self):
        import pytest

        from zstdsharp_tpu import Compressor
        from zstdsharp_tpu.errors import ZstdError

        c = Compressor()
        c.set_parameter("checksum_flag", 1)
        assert c.get_parameter("checksum_flag") is True
        with pytest.raises(ZstdError):
            c.set_parameter("checksum_flag", 2)
        c.set_parameter("ldm", None)
        c.set_parameter("ldm", True)
        assert c.get_parameter("ldm") is True
        with pytest.raises(ZstdError):
            c.set_parameter("no_such_param", 1)

    def test_update_during_stream_whitelist(self):
        import io

        import pytest

        from zstdsharp_tpu.encode.params import CCtxParams
        from zstdsharp_tpu.errors import ZstdError
        from zstdsharp_tpu.streaming import CompressionStream

        params = CCtxParams(compression_level=1)
        sink = io.BytesIO()
        cs = CompressionStream(sink, params=params)
        cs.write(b"some data")
        # whitelisted (ZSTD_isUpdateAuthorized:724)
        params.set_parameter("compression_level", 3)
        params.set_parameter("target_length", 64)
        # not whitelisted mid-stream
        with pytest.raises(ZstdError):
            params.set_parameter("window_log", 20)
        with pytest.raises(ZstdError):
            params.set_parameter("checksum_flag", 1)
        cs.close()
        params.set_parameter("window_log", 20)  # ok again after close

    def test_decompressor_param_bounds(self):
        import pytest

        from zstdsharp_tpu import Decompressor
        from zstdsharp_tpu.errors import ZstdError

        d = Decompressor()
        d.set_parameter("max_window_log", 27)
        assert d.get_upper_bound is not None
        with pytest.raises(ZstdError):
            d.set_parameter("max_window_log", 99)
        with pytest.raises(ZstdError):
            d.set_parameter("nonsense", 1)
