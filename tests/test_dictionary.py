"""Dictionary tests: training, loading, cross-compat with the libzstd oracle
(mirrors ZstdNetTests.cs dictionary coverage :19-39, :95-135, :149)."""

import numpy as np
import pytest
import zstandard

from zstdsharp_tpu.decode import frame as dframe
from zstdsharp_tpu.dictionary import ZstdCompressionDict, parse_dictionary, train_dictionary
from zstdsharp_tpu.encode.frame import Compressor
from zstdsharp_tpu.decode.frame import Decompressor
from zstdsharp_tpu.errors import ZstdError


@pytest.fixture(scope="module")
def samples():
    r = np.random.default_rng(1234)
    out = []
    for _ in range(80):
        n = int(r.integers(1, 10))
        body = "".join(
            f'{{"type": "object{r.integers(0, 100)}", "id": {r.integers(0, 1000)}, '
            f'"status": "active", "payload": "data{r.integers(0, 50)}"}},'
            for _ in range(n))
        out.append(body.encode())
    return out


@pytest.fixture(scope="module")
def oracle_dict(samples):
    return zstandard.train_dictionary(4096, samples).as_bytes()


class TestDictLoading:
    def test_parse_oracle_dictionary(self, oracle_dict):
        p = parse_dictionary(oracle_dict)
        assert p.dict_id != 0
        assert p.entropy is not None
        assert len(p.content) > 0
        assert len(p.entropy.rep) == 3

    def test_decompress_oracle_dict_frames(self, samples, oracle_dict):
        zd = zstandard.ZstdDictData = zstandard.ZstdCompressionDict(oracle_dict)
        ours = ZstdCompressionDict(oracle_dict)
        for s in samples[:20]:
            frame = zstandard.ZstdCompressor(level=3, dict_data=zd).compress(s)
            assert ours.decompress_with(frame) == s

    def test_compress_with_oracle_dict(self, samples, oracle_dict):
        ours = ZstdCompressionDict(oracle_dict)
        zd = zstandard.ZstdCompressionDict(oracle_dict)
        from zstdsharp_tpu.encode.params import CCtxParams

        for s in samples[:20]:
            frame = ours.compress_with(s, CCtxParams(compression_level=3))
            out = zstandard.ZstdDecompressor(dict_data=zd).decompress(
                frame, max_output_size=len(s) + 1)
            assert out == s

    def test_dictionary_improves_ratio(self, samples, oracle_dict):
        ours = ZstdCompressionDict(oracle_dict)
        from zstdsharp_tpu.encode.params import CCtxParams
        from zstdsharp_tpu.encode.frame import compress

        with_d = sum(len(ours.compress_with(s, CCtxParams(compression_level=3)))
                     for s in samples[:20])
        without = sum(len(compress(s, 3)) for s in samples[:20])
        assert with_d < without

    def test_wrong_dict_rejected(self, samples, oracle_dict):
        zd = zstandard.ZstdCompressionDict(oracle_dict)
        frame = zstandard.ZstdCompressor(level=3, dict_data=zd).compress(samples[0])
        with pytest.raises(ZstdError):
            dframe.decompress(frame)  # no dict loaded -> REPEAT modes fail or id check

    def test_raw_content_dictionary(self, samples):
        raw = b"".join(samples[:8])[:4096]
        ours = ZstdCompressionDict(raw)
        assert ours.dict_id == 0
        from zstdsharp_tpu.encode.params import CCtxParams

        frame = ours.compress_with(samples[0], CCtxParams(compression_level=3))
        assert ours.decompress_with(frame) == samples[0]


class TestTraining:
    def test_train_produces_valid_dictionary(self, samples):
        d = train_dictionary(samples, 4096)
        p = parse_dictionary(d)
        assert p.dict_id != 0 and p.entropy is not None

    def test_oracle_accepts_trained_dictionary(self, samples):
        d = train_dictionary(samples, 4096)
        zd = zstandard.ZstdCompressionDict(d)
        frame = zstandard.ZstdCompressor(level=3, dict_data=zd).compress(samples[0])
        out = zstandard.ZstdDecompressor(dict_data=zd).decompress(
            frame, max_output_size=len(samples[0]) + 1)
        assert out == samples[0]

    def test_roundtrip_with_trained_dictionary(self, samples):
        d = train_dictionary(samples, 4096)
        ours = ZstdCompressionDict(d)
        from zstdsharp_tpu.encode.params import CCtxParams

        for s in samples[:10]:
            frame = ours.compress_with(s, CCtxParams(compression_level=3))
            assert ours.decompress_with(frame) == s

    def test_trained_dictionary_improves_ratio(self, samples):
        d = train_dictionary(samples, 8192)
        ours = ZstdCompressionDict(d)
        from zstdsharp_tpu.encode.params import CCtxParams
        from zstdsharp_tpu.encode.frame import compress

        with_d = sum(len(ours.compress_with(s, CCtxParams(compression_level=3)))
                     for s in samples[:20])
        without = sum(len(compress(s, 3)) for s in samples[:20])
        assert with_d < without

    def test_deterministic(self, samples):
        assert train_dictionary(samples, 2048) == train_dictionary(samples, 2048)


class TestApiClasses:
    def test_compressor_decompressor_with_dict(self, samples, oracle_dict):
        comp = Compressor(level=3)
        comp.load_dictionary(oracle_dict)
        dec = Decompressor()
        dec.load_dictionary(oracle_dict)
        frame = comp.wrap(samples[0])
        assert dec.unwrap(frame) == samples[0]

    def test_try_unwrap_too_small(self, samples):
        from zstdsharp_tpu.encode.frame import compress

        frame = compress(samples[0] * 10, 3)
        dec = Decompressor()
        ok, _ = dec.try_unwrap(frame, max_decompressed_size=10)
        assert not ok
        ok, data = dec.try_unwrap(frame, max_decompressed_size=len(samples[0]) * 10)
        assert ok and data == samples[0] * 10


def test_optimize_train_from_buffer_sweep():
    """ZDICT_optimizeTrainFromBuffer_fastCover role: the (k, d) sweep must
    return a dictionary no worse than the default parameters."""
    from zstdsharp_tpu.dictionary import optimize_train_from_buffer, train_dictionary
    from zstdsharp_tpu.encode.frame import Compressor

    samples = [b'{"user": "u%d", "v": %d, "tags": ["a", "b"]}' % (i, i * 37 % 997)
               for i in range(400)]
    swept, params = optimize_train_from_buffer(samples, dict_size=2048, level=3)
    assert params["k"] >= 16 and params["d"] in (6, 8)
    base = train_dictionary(samples, 2048)

    def total(d):
        c = Compressor(level=3)
        c.load_dictionary(d)
        return sum(len(c.wrap(s)) for s in samples)

    assert total(swept) <= total(base) * 1.001
    # libzstd must accept the swept dictionary
    import zstandard
    zd = zstandard.ZstdCompressionDict(swept)
    out = zstandard.ZstdCompressor(level=3, dict_data=zd).compress(samples[0])
    assert len(out) > 0


def test_native_cdict_ddict_small_records():
    """Native CDict/DDict path (ZSTD_CDict/DDict roles): attach-mode
    matchers + dictionary entropy repeat; frames accepted by libzstd."""
    import zstandard

    from zstdsharp_tpu.decode.frame import Decompressor
    from zstdsharp_tpu.dictionary import train_dictionary
    from zstdsharp_tpu.encode.frame import Compressor

    samples = [b'{"k": "u%d", "v": %d, "t": [1, 2, %d]}' % (i, i * 37 % 997, i)
               for i in range(800)]
    d = train_dictionary(samples, 2048)
    comp = Compressor(level=3)
    comp.load_dictionary(d)
    frames = [comp.wrap(s) for s in samples]
    zd = zstandard.ZstdCompressionDict(d)
    dz = zstandard.ZstdDecompressor(dict_data=zd)
    for f, s in zip(frames, samples):
        assert dz.decompress(f, max_output_size=1000) == s
    dec = Decompressor()
    dec.load_dictionary(d)
    for f, s in zip(frames, samples):
        assert dec.unwrap(f) == s


def test_batch_wrap_unwrap_many():
    """Batch codec entries: one native call per batch, bit-exact through
    both libzstd and our decoder; mixed record sizes."""
    import zstandard

    from zstdsharp_tpu.decode.frame import Decompressor
    from zstdsharp_tpu.dictionary import train_dictionary
    from zstdsharp_tpu.encode.frame import Compressor

    samples = [b'{"n": %d, "payload": "%s"}' % (i, b"x" * (i % 200 + 1))
               for i in range(500)]
    d = train_dictionary(samples, 2048)
    comp = Compressor(level=3)
    comp.load_dictionary(d)
    frames = comp.wrap_many(samples)
    assert len(frames) == len(samples)
    zd = zstandard.ZstdCompressionDict(d)
    dz = zstandard.ZstdDecompressor(dict_data=zd)
    for f, s in zip(frames, samples):
        assert dz.decompress(f, max_output_size=2000) == s
    dec = Decompressor()
    dec.load_dictionary(d)
    assert dec.unwrap_many(frames) == samples
    # checksum path falls back element-wise and still roundtrips
    comp.set_parameter("checksum_flag", True)
    frames_ck = comp.wrap_many(samples[:50])
    assert dec.unwrap_many(frames_ck) == samples[:50]


def test_train_dictionary_flat_literal_distribution():
    """Near-uniform sample literals produce a flat 256-symbol Huffman table,
    which the weights format cannot serialize directly (raw caps at 128
    weights, FSE needs two distinct weights); the finalizer must perturb
    and still emit a libzstd-accepted dictionary."""
    import zstandard

    from zstdsharp_tpu.dictionary import train_dictionary
    from zstdsharp_tpu.encode.frame import Compressor

    samples = [b'{"k": %d}' % i for i in range(300)]
    d = train_dictionary(samples, 1024)
    zd = zstandard.ZstdCompressionDict(d)
    comp = Compressor(level=3)
    comp.load_dictionary(d)
    dz = zstandard.ZstdDecompressor(dict_data=zd)
    for s in samples[:30]:
        assert dz.decompress(comp.wrap(s), max_output_size=200) == s


class TestAdvisorRegressions:
    """Round-1 advisor findings: dictID checks on the native fast paths,
    checksum verification in batch unwrap, window_log cache correctness."""

    def _two_dicts(self):
        r = np.random.default_rng(99)
        mk = lambda tag: [
            (f'{{"{tag}": {int(r.integers(0, 999))}, "v": "{tag}{i}"}}' * 4).encode()
            for i in range(120)]
        sa, sb = mk("alpha"), mk("beta")
        da = zstandard.train_dictionary(2048, sa).as_bytes()
        db = zstandard.train_dictionary(2048, sb).as_bytes()
        return sa, sb, da, db

    def test_fast_path_rejects_wrong_dict_single(self):
        sa, sb, da, db = self._two_dicts()
        zd_a = zstandard.ZstdCompressionDict(da)
        frame = zstandard.ZstdCompressor(level=3, dict_data=zd_a).compress(sa[0])
        wrong = ZstdCompressionDict(db)
        with pytest.raises(ZstdError):
            wrong.decompress_with(frame)

    def test_fast_path_rejects_wrong_dict_batch(self):
        sa, sb, da, db = self._two_dicts()
        zd_a = zstandard.ZstdCompressionDict(da)
        frames = [zstandard.ZstdCompressor(level=3, dict_data=zd_a).compress(s)
                  for s in sa[:10]]
        wrong = ZstdCompressionDict(db)
        with pytest.raises(ZstdError):
            wrong.decompress_many(frames)
        dec = Decompressor()
        dec.load_dictionary(db)
        with pytest.raises(ZstdError):
            dec.unwrap_many(frames)

    def test_unwrap_many_verifies_checksum(self, samples, oracle_dict):
        comp = Compressor(level=3)
        comp.load_dictionary(oracle_dict)
        comp.set_parameter("checksum_flag", True)
        frames = comp.wrap_many(samples[:20])
        dec = Decompressor()
        dec.load_dictionary(oracle_dict)
        assert dec.unwrap_many(frames) == samples[:20]
        # Corrupt the stored checksum (last 4 bytes) of one frame: the
        # batch path must reject it, exactly like single unwrap does.
        bad = bytearray(frames[3])
        bad[-1] ^= 0xFF
        frames_bad = frames[:3] + [bytes(bad)] + frames[4:20]
        with pytest.raises(ZstdError):
            dec.unwrap_many(frames_bad)

    def test_window_covers_growing_records(self, oracle_dict):
        """A small record must not pin a too-small window_log for later
        larger records (resolve-cache key regression): every emitted frame
        must declare a window covering its content."""
        from zstdsharp_tpu.decode.frame import parse_frame_header

        comp = Compressor(level=1)
        comp.load_dictionary(oracle_dict)
        small = b"abcd" * 750          # ~3000 B
        big = (b"wxyz" * 40 + b"#") * 56  # ~9016 B, same coarse class
        for rec in (small, big, small, big):
            frame = comp.wrap(rec)
            hdr = parse_frame_header(np.frombuffer(frame, np.uint8))
            if not hdr.single_segment:
                assert hdr.window_size >= len(rec)
            out = zstandard.ZstdDecompressor(
                dict_data=zstandard.ZstdCompressionDict(oracle_dict)
            ).decompress(frame, max_output_size=len(rec) + 1)
            assert out == rec


class TestDictAttachHighLevels:
    """Attach-mode dictionary compression for the lazy and bt strategies
    (ZSTD_shouldAttachDict role, ZstdCompress.cs:2738): dictionary tables
    stay read-only, frames pay no per-call table copy."""

    def _setup(self):
        recs = [b'{"id": %d, "name": "user%d", "score": %d}'
                % (i, i, i * 7 % 997) for i in range(800)]
        from zstdsharp_tpu.dictionary import train_dictionary
        return recs, train_dictionary(recs[:400], 2048)

    @pytest.mark.parametrize("level", [5, 9, 12, 19])
    def test_oracle_decode_and_ratio(self, level):
        import zstandard

        from zstdsharp_tpu.decode.frame import Decompressor
        from zstdsharp_tpu.encode.frame import Compressor
        recs, dic = self._setup()
        comp = Compressor(level=level)
        comp.load_dictionary(dic)
        frames = comp.wrap_many(recs)
        zd = zstandard.ZstdDecompressor(
            dict_data=zstandard.ZstdCompressionDict(dic))
        for f, r in zip(frames, recs):
            assert zd.decompress(f, max_output_size=len(r)) == r
        dec = Decompressor()
        dec.load_dictionary(dic)
        assert dec.unwrap_many(frames) == recs
        zc = zstandard.ZstdCompressor(
            level=level, dict_data=zstandard.ZstdCompressionDict(dic))
        zsize = sum(len(zc.compress(r)) for r in recs)
        assert sum(map(len, frames)) <= zsize * 1.05


class TestBatchScratchRestore:
    """Round-4 regression: zt_decompress_many_ddict restored the table
    VALIDITY flags between frames but not the repeat-mode table-SOURCE
    markers (ll_src/of_src/ml_src), so a batch whose frames alternate
    between dict tables (Repeat_Mode) and per-frame FSE tables mis-decoded
    from the first mode switch on, silently dropped the whole batch to the
    element-wise path, and left the handle scratch poisoned for every later
    call (ZstdDecompress.cs:1216 multi-frame loop semantics: frames are
    independent)."""

    def _mixed_mode_batch(self):
        # Records sized/shaped so that level-3 dict compression alternates
        # table modes: the tiny json rows ride the dictionary's FSE tables,
        # the longer high-entropy rows force per-frame table definitions.
        r = np.random.default_rng(42)
        recs = []
        for i in range(200):
            if i % 3 == 2:
                recs.append(bytes(r.integers(0, 256, size=600, dtype=np.uint8)))
            else:
                recs.append(b'{"id": %d, "name": "user%d", "score": %d}'
                            % (i, i, i * 7 % 997))
        dic = train_dictionary([x for x in recs if x[:1] == b"{"][:60], 2048)
        comp = Compressor(level=3)
        comp.load_dictionary(dic)
        return recs, dic, comp.wrap_many(recs)

    def test_alternating_table_modes_native_batch(self):
        from zstdsharp_tpu.native import NativeDDict

        recs, dic, frames = self._mixed_mode_batch()
        dd = NativeDDict(dic)
        if not dd.valid:
            pytest.skip("native engine unavailable")
        from zstdsharp_tpu.dictionary import parse_dictionary

        did = parse_dictionary(dic).dict_id
        out = dd.decompress_many(frames, expect_dict_id=did)
        assert out is not None, "native batch refused a decodable batch"
        assert out == recs
        # the whole batch must ride the native path (bench-honesty hook)
        assert dd.last_fallback_count == 0
        # and the oracle agrees the frames are real
        zd = zstandard.ZstdDecompressor(
            dict_data=zstandard.ZstdCompressionDict(dic))
        for f, rec in zip(frames[:20], recs[:20]):
            assert zd.decompress(f, max_output_size=len(rec)) == rec

    def test_failure_is_not_sticky_and_falls_back_per_frame(self):
        from zstdsharp_tpu.native import NativeDDict

        recs, dic, frames = self._mixed_mode_batch()
        dd = NativeDDict(dic)
        if not dd.valid:
            pytest.skip("native engine unavailable")
        # Frame without a content size (streaming-style) cannot take the
        # native batch path -> per-frame fallback mid-batch, then resume.
        comp = Compressor(level=3)
        comp.load_dictionary(dic)
        import zstandard as _z

        no_fcs = _z.ZstdCompressor(
            level=3, write_content_size=False,
            dict_data=_z.ZstdCompressionDict(dic)).compress(recs[0])
        mixed = frames[:40] + [no_fcs] + frames[40:]
        want = recs[:40] + [recs[0]] + recs[40:]
        dec = Decompressor()
        dec.load_dictionary(dic)
        calls = []
        out = dd.decompress_many(
            mixed, expect_dict_id=parse_dictionary(dic).dict_id,
            fallback=lambda f: (calls.append(1), dec.unwrap(f))[1])
        assert out == want
        assert dd.last_fallback_count == 1 and len(calls) == 1
        # handle still healthy after the mid-batch failure
        again = dd.decompress_many(
            frames, expect_dict_id=parse_dictionary(dic).dict_id)
        assert again == recs and dd.last_fallback_count == 0

    def test_decompressor_batch_speed_path(self):
        """unwrap_many over the public API serves the alternating batch
        natively and matches the element-wise result."""
        recs, dic, frames = self._mixed_mode_batch()
        dec = Decompressor()
        dec.load_dictionary(dic)
        assert dec.unwrap_many(frames) == recs
        assert [dec.unwrap(f) for f in frames[:10]] == recs[:10]
