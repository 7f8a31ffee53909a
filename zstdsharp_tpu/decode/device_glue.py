"""Host glue for the device decode plane.

Splits real zstd frames into the two entropy workloads the TPU kernels
consume — 4-stream Huffman literal sections (ops/device_huf.py) and FSE
sequence sections (ops/device_fse.py) — and runs them batched on-device.

The LZ stitch (ZSTD_execSequence) stays on the host: it is memcpy-bound
byte shuffling with a serial window dependency, which the VPU has no
primitive for (measured: XLA gather ~0.07 G elem/s makes pointer-jumping
resolution ~100x slower than a host core).  The entropy plane is where the
compute lives, and where the chip contributes.

On this tunnel-attached chip, host->device is ~1.5 GB/s and device->host
~0.02 GB/s, so end-to-end hybrid decode cannot beat the host engine here;
the intended deployment decompresses into HBM for on-device consumers
(training input pipelines), where the output never crosses back.

The ENCODE direction of the entropy plane stays on the host by analysis:
Huffman/FSE bit-packing writes variable-length fields at lane-dependent
addresses (scatter), which the VPU has no primitive for.  The decode
direction mapped onto the chip because its reads follow a uniform
per-step schedule and are idempotent (read a wide window, shift); writes
are neither.  Splitting the work (device computes code/offset vectors,
host packs) was measured no faster than the host's fused table-lookup +
pack loop, so the encoder keeps the single host pass.
"""

from dataclasses import dataclass

import numpy as np

from .. import constants as C
from ..entropy import huffman
from .block import EntropyState, decode_literals, decode_sequence_headers
from .frame import parse_frame_header


@dataclass
class EntropyWork:
    """Batched device work extracted from one or more frames."""

    lit_payloads: list
    lit_weights: list
    lit_nsyms: list
    seq_payloads: list
    seq_tables: list
    seq_nseqs: list
    seq_reps: list


class _CodedDT:
    """FseDTable view exposing the per-state CODE (device tables carry the
    code; value bases come from the shared constant tables)."""

    def __init__(self, dt, kind):
        self.table_log = dt.table_log
        self.new_state = np.asarray(dt.new_state)
        self.nb_bits = np.asarray(dt.nb_bits)
        base = np.asarray(dt.base_value, np.int64)
        if kind == "of":
            self.symbol = np.asarray(dt.nb_add_bits, np.int64)
        elif kind == "ll":
            self.symbol = np.searchsorted(np.asarray(C.LL_BASE, np.int64), base)
        else:
            self.symbol = np.searchsorted(np.asarray(C.ML_BASE, np.int64), base)


def extract_entropy_work(frames) -> EntropyWork:
    """Walk frames (host-side header parse) and collect every 4-stream
    Huffman literal section and every sequence section as device work.

    Sections the device tier cannot take (raw/RLE literals, 1-stream,
    oversized streams) are skipped — the host engine handles them in the
    hybrid pipeline."""
    from ..ops import device_fse as df
    from ..ops import device_huf as dh

    w = EntropyWork([], [], [], [], [], [], [])
    for frame in frames:
        hdr = parse_frame_header(np.frombuffer(frame, np.uint8))
        p = hdr.header_size
        ent = EntropyState()
        last_weights = None
        while True:
            bh = int.from_bytes(frame[p : p + 3], "little")
            last, btype, bsize = bh & 1, (bh >> 1) & 3, bh >> 3
            if btype == 2:
                payload = bytes(frame[p + 3 : p + 3 + bsize])
                b0 = payload[0]
                lit_type = b0 & 3
                fmt = (b0 >> 2) & 3
                if lit_type in (2, 3) and fmt in (1, 2, 3):
                    if fmt == 1:
                        v = int.from_bytes(payload[0:3], "little")
                        regen, comp, h = (v >> 4) & 0x3FF, (v >> 14) & 0x3FF, 3
                    elif fmt == 2:
                        v = int.from_bytes(payload[0:4], "little")
                        regen, comp, h = ((v >> 4) & 0x3FFF,
                                          (v >> 18) & 0x3FFF, 4)
                    else:
                        v = int.from_bytes(payload[0:5], "little")
                        regen, comp, h = ((v >> 4) & 0x3FFFF,
                                          (v >> 22) & 0x3FFFF, 5)
                    body = payload[h : h + comp]
                    if lit_type == 2:
                        weights, tlog, whdr = huffman.read_weights(body)
                        last_weights = weights
                        body = body[whdr:]
                    else:
                        weights = last_weights
                    if weights is not None and len(body) >= 10:
                        s1 = int.from_bytes(body[0:2], "little")
                        s2 = int.from_bytes(body[2:4], "little")
                        s3 = int.from_bytes(body[4:6], "little")
                        sizes = [s1, s2, s3, len(body) - 6 - s1 - s2 - s3]
                        seg = (regen + 3) // 4
                        outs = [seg, seg, seg, regen - 3 * seg]
                        off = 6
                        if (min(sizes) > 0 and min(outs) > 0
                                and max(sizes) <= dh.MAX_W * 4):
                            for s in range(4):
                                w.lit_payloads.append(
                                    bytes(body[off : off + sizes[s]]))
                                w.lit_weights.append(weights)
                                w.lit_nsyms.append(outs[s])
                                off += sizes[s]
                # sequence section (always parse to advance entropy state)
                lits, n = decode_literals(payload, ent)
                rest = payload[n:]
                nbseq, ll, of, ml, consumed = decode_sequence_headers(rest, ent)
                if nbseq > 0:
                    seq_payload = rest[consumed:]
                    if (len(seq_payload) <= df.MAX_W * 4
                            and of.table_log <= 8):
                        w.seq_payloads.append(bytes(seq_payload))
                        w.seq_tables.append((_CodedDT(ll, "ll"),
                                             _CodedDT(of, "of"),
                                             _CodedDT(ml, "ml")))
                        w.seq_nseqs.append(nbseq)
                        w.seq_reps.append(list(ent.rep))
                    # advance repcodes for subsequent blocks
                    from .block import decode_sequences

                    decode_sequences(seq_payload, nbseq, ll, of, ml, ent.rep)
            p += 3 + (1 if btype == 1 else bsize)
            if last:
                break
    return w


def run_entropy_device(work: EntropyWork, lane_sort: bool = True):
    """Run both device kernels over the extracted work (batching in LANES
    chunks, longest-first so lanes drain together).  Returns
    (lit_symbol_count, seq_count) processed on-device; outputs stay
    device-resident."""
    from ..ops import device_fse as df
    from ..ops import device_huf as dh

    outs = []
    lit_syms = 0
    if work.lit_payloads:
        order = (np.argsort([-n for n in work.lit_nsyms]) if lane_sort
                 else np.arange(len(work.lit_nsyms)))
        for i in range(0, len(order), dh.LANES):
            sel = order[i : i + dh.LANES]
            batch = dh.prepare_batch([work.lit_payloads[j] for j in sel],
                                     [work.lit_weights[j] for j in sel],
                                     [work.lit_nsyms[j] for j in sel])
            outs.append(dh.huf_decode_device(batch))
            lit_syms += int(sum(work.lit_nsyms[j] for j in sel))
    seqs = 0
    if work.seq_payloads:
        order = (np.argsort([-n for n in work.seq_nseqs]) if lane_sort
                 else np.arange(len(work.seq_nseqs)))
        for i in range(0, len(order), df.LANES):
            sel = order[i : i + df.LANES]
            batch = df.prepare_batch([work.seq_payloads[j] for j in sel],
                                     [work.seq_tables[j] for j in sel],
                                     [work.seq_nseqs[j] for j in sel],
                                     [work.seq_reps[j] for j in sel])
            outs.append(df.fse_decode_device(batch))
            seqs += int(sum(work.seq_nseqs[j] for j in sel))
    return outs, lit_syms, seqs
