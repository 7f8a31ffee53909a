"""Device (ops/ + parallel/) tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from zstdsharp_tpu.ops.common import (match_lengths, pack_bits_device,
                                      previous_occurrence, u32_at_every_byte,
                                      u64_at_every_byte, hash4)
from zstdsharp_tpu.ops.matcher import candidate_stage, parse_block
from zstdsharp_tpu.entropy.bitstream import pack_bits


def np_u32view(b):
    out = np.zeros(len(b), np.uint32)
    for k in range(4):
        out[: len(b) - k] |= b[k:].astype(np.uint32) << (8 * k)
    return out


class TestCommon:
    def test_u32_view(self, rng):
        b = rng.integers(0, 256, 100, dtype=np.uint8)
        np.testing.assert_array_equal(np.asarray(u32_at_every_byte(jnp.asarray(b))),
                                      np_u32view(b))

    def test_u64_view(self, rng):
        b = rng.integers(0, 256, 64, dtype=np.uint8)
        v = np.asarray(u64_at_every_byte(jnp.asarray(b)))
        assert v[0] == int.from_bytes(b[:8].tobytes(), "little")
        assert v[10] == int.from_bytes(b[10:18].tobytes(), "little")

    def test_previous_occurrence(self):
        h = jnp.asarray(np.array([5, 3, 5, 5, 3, 9], dtype=np.int32))
        prev = np.asarray(previous_occurrence(h))
        np.testing.assert_array_equal(prev, [-1, -1, 0, 2, 1, -1])

    def test_match_lengths_exact(self, rng):
        base = rng.integers(0, 4, 300, dtype=np.uint8)
        b = np.concatenate([base, base[:200], rng.integers(0, 4, 24, dtype=np.uint8)])
        cand = np.full(len(b), -1, np.int32)
        cand[300] = 0  # block[300:] repeats block[0:]
        ml = np.asarray(match_lengths(jnp.asarray(b), jnp.asarray(cand)))
        # exact lcp computed on host
        lcp = 0
        while 300 + lcp < len(b) and b[lcp] == b[300 + lcp]:
            lcp += 1
        assert ml[300] == lcp

    def test_pack_bits_device_matches_host(self, rng):
        nbits = rng.integers(1, 32, 200).astype(np.uint64)
        values = rng.integers(0, 1 << 31, 200).astype(np.uint64) & ((np.uint64(1) << nbits) - np.uint64(1))
        host = pack_bits(values, nbits)
        words, total = pack_bits_device(jnp.asarray(values), jnp.asarray(nbits),
                                        out_words=(len(host) + 7) // 4 + 2)
        dev = np.asarray(words).view(np.uint8)[: (int(total) + 7) // 8].tobytes()
        assert dev == host


class TestCandidateStage:
    def test_candidates_are_most_recent_match(self, rng):
        data = np.frombuffer(b"abcdXabcdYabcdZ" * 40, dtype=np.uint8).copy()
        ps, cand = jax.jit(lambda b: candidate_stage(b, 12))(jnp.asarray(data))
        ps, cand = np.asarray(ps), np.asarray(cand)
        by_pos = np.empty(len(data), np.int32)
        by_pos[ps] = cand
        # every valid candidate shares its first 4 bytes
        for p in range(len(data) - 4):
            c = by_pos[p]
            if c >= 0:
                assert c < p
                assert bytes(data[c : c + 4]) == bytes(data[p : p + 4])

    def test_parse_block_roundtrip_semantics(self, rng):
        data = (b"the quick brown fox " * 100)[:1600]
        block = np.zeros(2048, np.uint8)
        block[: len(data)] = np.frombuffer(data, np.uint8)
        r = parse_block(jnp.asarray(block), jnp.int32(len(data)), 12, 256)
        starts = np.asarray(r["starts"])
        mls = np.asarray(r["mls"])
        offs = np.asarray(r["offs"])
        for k in range(int(r["nseq"])):
            s, m, o = int(starts[k]), int(mls[k]), int(offs[k])
            assert o > 0 and s - o >= 0
            assert data[s : s + m] == data[s - o : s - o + m]


class TestShardedPipeline:
    def test_dp_roundtrip(self, text_corpus):
        import zstandard

        from zstdsharp_tpu.decode.frame import decompress
        from zstdsharp_tpu.parallel.pipeline import compress_data_parallel, make_mesh

        data = text_corpus[:200_000]
        mesh = make_mesh()
        assert mesh.devices.size == 8
        frame = compress_data_parallel(data, mesh, block_size=1 << 14)
        assert decompress(frame) == data
        assert zstandard.ZstdDecompressor().decompress(
            frame, max_output_size=len(data) + 1) == data

    def test_dp_checksum(self, text_corpus):
        from zstdsharp_tpu.decode.frame import decompress
        from zstdsharp_tpu.parallel.pipeline import compress_data_parallel, make_mesh

        data = text_corpus[:50_000]
        frame = compress_data_parallel(data, make_mesh(), checksum=True,
                                       block_size=1 << 14)
        assert decompress(frame) == data

    def test_graft_entry(self):
        import __graft_entry__ as g

        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        assert out["nseq"].shape == (4,)
        g.dryrun_multichip(8)
