"""Unit tests for the entropy layer: bitstream, FSE, Huffman, XXH64."""

import numpy as np
import pytest

from zstdsharp_tpu.entropy import fse, huffman
from zstdsharp_tpu.entropy.bitstream import BitReader, BitWriter, extract_bits, pack_bits
from zstdsharp_tpu.utils.xxhash import content_checksum, xxh64, xxh64_fast


class TestXxhash:
    @pytest.mark.parametrize("n", [0, 1, 3, 4, 7, 8, 31, 32, 33, 63, 100, 1000, 4096])
    def test_matches_oracle(self, n, rng):
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert xxh64(data) == xxh64_fast(data)

    def test_seeded(self, rng):
        data = rng.integers(0, 256, 100, dtype=np.uint8).tobytes()
        assert xxh64(data, seed=12345) == xxh64_fast(data, seed=12345)

    def test_checksum_is_low32(self):
        assert content_checksum(b"abc") == xxh64(b"abc") & 0xFFFFFFFF


class TestBitstream:
    def test_writer_reader_roundtrip(self, rng):
        fields = [(int(rng.integers(0, 1 << n)), int(n)) for n in rng.integers(1, 30, 200)]
        w = BitWriter()
        for v, n in fields:
            w.add(v, n)
        payload = w.close()
        r = BitReader(payload)
        for v, n in reversed(fields):
            assert r.read(n) == v
        assert r.finished

    def test_pack_bits_matches_scalar(self, rng):
        nbits = rng.integers(1, 57, 500).astype(np.uint64)
        values = (rng.integers(0, 1 << 62, 500).astype(np.uint64)) & ((np.uint64(1) << nbits) - np.uint64(1))
        w = BitWriter()
        for v, n in zip(values, nbits):
            w.add(int(v), int(n))
        assert pack_bits(values, nbits) == w.close()

    def test_pack_bits_empty(self):
        assert pack_bits(np.array([], dtype=np.uint64), np.array([], dtype=np.uint64)) == b"\x01"

    def test_extract_bits(self, rng):
        nbits = rng.integers(1, 56, 300).astype(np.uint64)
        values = rng.integers(0, 1 << 55, 300).astype(np.uint64) & ((np.uint64(1) << nbits) - np.uint64(1))
        payload = pack_bits(values, nbits)
        offsets = np.concatenate([[0], np.cumsum(nbits)[:-1]])
        got = extract_bits(np.frombuffer(payload, dtype=np.uint8), offsets, nbits)
        np.testing.assert_array_equal(got, values)

    def test_overshoot_reads_zero_low_bits(self):
        w = BitWriter()
        w.add(0b101, 3)
        r = BitReader(w.close())
        assert r.read(5) == 0b10100  # 3 valid bits then zeros below


class TestFse:
    def _random_counts(self, rng, nsym, total):
        probs = rng.dirichlet(np.ones(nsym) * 0.3)
        counts = np.maximum((probs * total).astype(np.int64), 0)
        counts[0] += total - counts.sum()
        return counts

    @pytest.mark.parametrize("nsym,total", [(4, 100), (16, 1000), (36, 5000), (52, 800), (255, 20000)])
    def test_ncount_roundtrip(self, nsym, total, rng):
        counts = self._random_counts(rng, nsym, total)
        if counts.max() == total:
            counts[0] -= 1
            counts[1] += 1
        tlog = fse.optimal_table_log(0, total, nsym - 1)
        norm = fse.normalize_count(counts, tlog, total, nsym - 1, use_low_prob=True)
        hdr = fse.write_ncount(norm, nsym - 1, tlog)
        norm2, max_sym, tlog2, consumed = fse.read_ncount(hdr)
        assert tlog2 == tlog
        assert consumed == len(hdr)
        np.testing.assert_array_equal(norm[: max_sym + 1], norm2)

    def test_default_tables_parse(self):
        # The predefined LL/ML/OF distributions must build valid tables.
        from zstdsharp_tpu import constants as C

        for norm, log, maxs in [
            (C.LL_DEFAULT_NORM, C.LL_DEFAULT_NORM_LOG, C.MAX_LL),
            (C.ML_DEFAULT_NORM, C.ML_DEFAULT_NORM_LOG, C.MAX_ML),
            (C.OF_DEFAULT_NORM, C.OF_DEFAULT_NORM_LOG, C.DEFAULT_MAX_OFF),
        ]:
            dt = fse.build_dtable(norm, maxs, log)
            assert len(dt.symbol) == 1 << log
            assert int(dt.nb_bits.max()) <= log

    @pytest.mark.parametrize("nsym", [3, 13, 40])
    def test_fse_compress_decompress(self, nsym, rng):
        n = 700
        sym = rng.integers(0, nsym, n).astype(np.uint8)
        sym[: n // 2] = rng.integers(0, 3, n // 2)  # skew
        counts = np.bincount(sym, minlength=nsym).astype(np.int64)
        max_sym = int(sym.max())
        tlog = fse.optimal_table_log(0, n, max_sym)
        norm = fse.normalize_count(counts[: max_sym + 1], tlog, n, max_sym, True)
        ct = fse.build_ctable(norm, max_sym, tlog)
        payload = fse.fse_compress(sym, ct)
        dt = fse.build_dtable(norm, max_sym, tlog)
        out = fse.fse_decompress(payload, dt, max_dst=2 * n)
        np.testing.assert_array_equal(np.frombuffer(out, dtype=np.uint8), sym)


class TestHuffman:
    def _roundtrip(self, data: np.ndarray):
        counts = np.bincount(data, minlength=256).astype(np.int64)
        max_sym = int(data.max())
        ct = huffman.build_ctable(counts, max_sym)
        tbl = huffman.write_ctable(ct)
        weights, tlog, consumed = huffman.read_weights(tbl)
        assert consumed == len(tbl)
        assert tlog == ct.table_log
        dt = huffman.build_dtable(weights, tlog)
        enc1 = huffman.encode_1x(data, ct)
        out1 = huffman.decode_1x(enc1, dt, len(data))
        np.testing.assert_array_equal(out1, data)
        if len(data) >= 6:
            enc4 = huffman.encode_4x(data, ct)
            out4 = huffman.decode_4x(enc4, dt, len(data))
            np.testing.assert_array_equal(out4, data)

    def test_skewed_text(self, rng):
        data = rng.choice(np.frombuffer(b"aaaaabbbccdefgh", dtype=np.uint8), size=5000)
        self._roundtrip(data.astype(np.uint8))

    def test_two_symbols(self):
        self._roundtrip(np.array([65, 66] * 50, dtype=np.uint8))

    def test_many_symbols(self, rng):
        zipf = np.minimum(rng.zipf(1.3, 8000) - 1, 255).astype(np.uint8)
        self._roundtrip(zipf)

    def test_height_limited(self, rng):
        # Exponential counts force raw Huffman depth > 11 -> limiter kicks in.
        data = np.repeat(np.arange(30, dtype=np.uint8), 2 ** np.arange(30) % 65536 + 1)
        rng.shuffle(data)
        self._roundtrip(data)
