"""Device (Pallas) FSE sequence decoder vs real zstd frames.

Validates the batched 3-state sequence decoder (ops/device_fse.py) —
including repcode resolution — bit-exactly against sequence sections
extracted from oracle libzstd frames.  Small shapes keep compile time
bounded; the full-scale run lives in bench.py.
"""

import numpy as np
import pytest
import zstandard

from zstdsharp_tpu import constants as C
from zstdsharp_tpu.decode.block import (EntropyState, decode_literals,
                                        decode_sequence_headers,
                                        decode_sequences)
from zstdsharp_tpu.decode.frame import parse_frame_header
from zstdsharp_tpu.ops import device_fse as df

jax = pytest.importorskip("jax")


class CodedDT:
    """Adapter exposing the per-state CODE (recovered from value bases)."""

    def __init__(self, dt, kind):
        self.table_log = dt.table_log
        self.new_state = np.asarray(dt.new_state)
        self.nb_bits = np.asarray(dt.nb_bits)
        base = np.asarray(dt.base_value, np.int64)
        if kind == "of":
            self.symbol = np.asarray(dt.nb_add_bits, np.int64)  # code == bits
        elif kind == "ll":
            self.symbol = np.searchsorted(np.asarray(C.LL_BASE, np.int64), base)
        else:
            self.symbol = np.searchsorted(np.asarray(C.ML_BASE, np.int64), base)


def extract_seq_sections(frame: bytes):
    hdr = parse_frame_header(np.frombuffer(frame, np.uint8))
    p = hdr.header_size
    out = []
    ent = EntropyState()
    while True:
        bh = int.from_bytes(frame[p : p + 3], "little")
        last, btype, bsize = bh & 1, (bh >> 1) & 3, bh >> 3
        if btype == 2:
            payload = bytes(frame[p + 3 : p + 3 + bsize])
            lits, n = decode_literals(payload, ent)
            rest = payload[n:]
            nbseq, ll, of, ml, consumed = decode_sequence_headers(rest, ent)
            if nbseq > 0:
                seq_payload = rest[consumed:]
                rep_in = list(ent.rep)
                lls, mls, ofs = decode_sequences(seq_payload, nbseq, ll, of,
                                                 ml, ent.rep)
                out.append((seq_payload,
                            (CodedDT(ll, "ll"), CodedDT(of, "of"),
                             CodedDT(ml, "ml")),
                            nbseq, rep_in, (lls, mls, ofs)))
        p += 3 + (1 if btype == 1 else bsize)
        if last:
            break
    return out


@pytest.fixture(scope="module")
def sections():
    r = np.random.default_rng(17)
    words = [b"red", b"green", b"blue", b"cyan", b"magenta"]
    data = b" ".join(words[int(i)] for i in r.integers(0, 5, 500))
    secs = []
    for lvl in (3, 9):
        frame = zstandard.ZstdCompressor(level=lvl,
                                         write_content_size=True).compress(data)
        secs += extract_seq_sections(frame)
    secs = [s for s in secs if len(s[0]) <= 256 * 4]
    assert secs, "no small sequence sections produced"
    return secs


def _batch(secs):
    return df.prepare_batch([s[0] for s in secs], [s[1] for s in secs],
                            [s[2] for s in secs], [s[3] for s in secs])


def test_numpy_mirror_matches_host_decoder(sections):
    batch = _batch(sections)
    lls, mls, ofs = df.decode_reference(batch)
    for i, (_, _, nb, _, (ell, eml, eof)) in enumerate(sections):
        assert np.array_equal(lls[:nb, i], ell.astype(np.int64)), f"sec {i} ll"
        assert np.array_equal(mls[:nb, i], eml.astype(np.int64)), f"sec {i} ml"
        assert np.array_equal(ofs[:nb, i], eof.astype(np.int64)), f"sec {i} of"


def test_device_kernel_bit_exact(sections):
    batch = _batch(sections)
    lls, mls, ofs = [np.asarray(x) for x in df.fse_decode_device(batch)]
    lls = lls.reshape(lls.shape[0], df.LANES)
    mls = mls.reshape(mls.shape[0], df.LANES)
    ofs = ofs.reshape(ofs.shape[0], df.LANES)
    for i, (_, _, nb, _, (ell, eml, eof)) in enumerate(sections):
        assert np.array_equal(lls[:nb, i], ell.astype(np.int64)), f"sec {i} ll"
        assert np.array_equal(mls[:nb, i], eml.astype(np.int64)), f"sec {i} ml"
        assert np.array_equal(ofs[:nb, i], eof.astype(np.int64)), f"sec {i} of"
