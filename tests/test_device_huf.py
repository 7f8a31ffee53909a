"""Device (Pallas) Huffman decoder vs real zstd streams.

Validates the batched canonical-arithmetic decoder (ops/device_huf.py)
bit-exactly against literal streams extracted from oracle libzstd frames.
Uses the smallest kernel shape bucket to keep compile time bounded; the
full-scale run lives in bench.py.
"""

import numpy as np
import pytest
import zstandard

from zstdsharp_tpu.decode.frame import parse_frame_header
from zstdsharp_tpu.entropy import huffman
from zstdsharp_tpu.ops import device_huf as dh

jax = pytest.importorskip("jax")


def extract_literal_streams(frame: bytes):
    """(payloads[4], weights, out_sizes[4], expected[4]) per 4-stream block."""
    hdr = parse_frame_header(np.frombuffer(frame, np.uint8))
    p = hdr.header_size
    res = []
    while True:
        bh = int.from_bytes(frame[p : p + 3], "little")
        last, btype, bsize = bh & 1, (bh >> 1) & 3, bh >> 3
        if btype == 2:
            src = frame[p + 3 : p + 3 + bsize]
            b0 = src[0]
            if (b0 & 3) == 2 and ((b0 >> 2) & 3) in (1, 2, 3):
                fmt = (b0 >> 2) & 3
                if fmt == 1:
                    v = int.from_bytes(src[0:3], "little")
                    regen, comp, h = (v >> 4) & 0x3FF, (v >> 14) & 0x3FF, 3
                elif fmt == 2:
                    v = int.from_bytes(src[0:4], "little")
                    regen, comp, h = (v >> 4) & 0x3FFF, (v >> 18) & 0x3FFF, 4
                else:
                    v = int.from_bytes(src[0:5], "little")
                    regen, comp, h = (v >> 4) & 0x3FFFF, (v >> 22) & 0x3FFFF, 5
                payload = src[h : h + comp]
                weights, tlog, whdr = huffman.read_weights(payload)
                body = payload[whdr:]
                sizes = [int.from_bytes(body[i : i + 2], "little")
                         for i in (0, 2, 4)]
                sizes.append(len(body) - 6 - sum(sizes))
                seg = (regen + 3) // 4
                outs = [seg, seg, seg, regen - 3 * seg]
                pls, off = [], 6
                for s in sizes:
                    pls.append(bytes(body[off : off + s]))
                    off += s
                dt = huffman.build_dtable(weights, tlog)
                exp = [np.asarray(huffman.decode_1x(pl_, dt, osz))
                       for pl_, osz in zip(pls, outs)]
                res.append((pls, weights, outs, exp))
        p += 3 + (1 if btype == 1 else bsize)
        if last:
            break
    return res


@pytest.fixture(scope="module")
def small_batch():
    r = np.random.default_rng(7)
    words = [b"lorem", b"ipsum", b"dolor", b"sit", b"amet"]
    data = b" ".join(words[int(i)] for i in r.integers(0, 5, 20000))
    frame = zstandard.ZstdCompressor(level=9).compress(data)
    blocks = extract_literal_streams(frame)
    assert blocks, "corpus produced no 4-stream literal blocks"
    payloads, wts, nsyms, expected = [], [], [], []
    for pls, weights, outs, exp in blocks:
        for s in range(4):
            payloads.append(pls[s])
            wts.append(weights)
            nsyms.append(outs[s])
            expected.append(exp[s])
    return payloads, wts, nsyms, expected


def test_numpy_reference_matches_host_decoder(small_batch):
    payloads, wts, nsyms, expected = small_batch
    batch = dh.prepare_batch(payloads, wts, nsyms)
    ref = dh.decode_reference(batch)
    flat = ref.reshape(ref.shape[0], dh.LANES)
    for i in range(len(payloads)):
        got = flat[: nsyms[i], i].astype(np.uint8)
        assert np.array_equal(got, expected[i].astype(np.uint8)), f"stream {i}"


def test_device_kernel_bit_exact(small_batch):
    payloads, wts, nsyms, expected = small_batch
    batch = dh.prepare_batch(payloads, wts, nsyms)
    out = np.asarray(dh.huf_decode_device(batch))
    flat = out.reshape(out.shape[0], dh.LANES)
    for i in range(len(payloads)):
        got = flat[: nsyms[i], i].astype(np.uint8)
        assert np.array_equal(got, expected[i].astype(np.uint8)), f"stream {i}"


def test_mixed_tables_across_lanes(small_batch):
    """Lanes with different Huffman tables decode independently."""
    payloads, wts, nsyms, expected = small_batch
    # add a second corpus with a different symbol distribution
    r = np.random.default_rng(8)
    data2 = bytes(bytearray(r.integers(97, 110, 30000, dtype=np.uint8)))
    blocks2 = extract_literal_streams(
        zstandard.ZstdCompressor(level=9).compress(data2))
    for pls, weights, outs, exp in blocks2:
        for s in range(4):
            payloads = payloads + [pls[s]]
            wts = wts + [weights]
            nsyms = nsyms + [outs[s]]
            expected = expected + [exp[s]]
    batch = dh.prepare_batch(payloads, wts, nsyms)
    out = np.asarray(dh.huf_decode_device(batch))
    flat = out.reshape(out.shape[0], dh.LANES)
    for i in range(len(payloads)):
        got = flat[: nsyms[i], i].astype(np.uint8)
        assert np.array_equal(got, expected[i].astype(np.uint8)), f"stream {i}"
