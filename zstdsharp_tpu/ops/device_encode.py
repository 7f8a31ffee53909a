"""Device batch encoder: greedy parse -> predefined-FSE frame composition.

The TPU-first reformulation of the reference's encode hot loops
(ZSTD_encodeSequences_body role, ZstdCompressSequences.cs:585; literals
run raw in v1, displacing HufCompress.cs:1056 with a ratio trade).  The
backward 3-state interleaved FSE encode is inherently sequential per
stream in the reference; here it becomes data-parallel:

1. every FSE state transition ``state -> stateTable[(state >> nb) + dfs]``
   is, for a fixed symbol, a PERMUTATION of the state set (the defining
   FSE property), so the chain of transitions is a composition of small
   permutation maps;
2. ``jax.lax.associative_scan`` suffix-composes the per-sequence maps in
   log depth (mirroring the pointer-jumping trick the decode plane uses
   in ops/execseq.py), yielding every intermediate encoder state at once;
3. emitted (value, nbits) fields — states interleaved with extra bits in
   the exact order of the host bitwriter (encode/block.py:
   encode_sequences_bitstream) — then collapse to the final bitstream via
   the prefix-scan packer ``pack_bits_device`` (ops/common.py).

Frames produced are fully standard single-segment zstd frames (9-byte
header, one compressed or raw block, predefined sequence tables, raw
literals) — decodable by libzstd and by this repo's own host and device
decoders.  Offsets are always emitted literal-form (off_base = off + 3);
repcode detection is a ratio refinement, not a validity requirement.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..entropy import fse
from .common import pack_bits_device
from .matcher import parse_blocks_ptrjump

MINMATCH = 3  # format minimum (the parse emits >= 4)


# ---------------------------------------------------------------------------
# Host-built constants: predefined encode tables + code LUTs
# ---------------------------------------------------------------------------

_CONST_CACHE: dict = {}


def _tables():
    """Predefined FSE encode tables (RFC8878 defaults) + code LUTs, as
    numpy constants closed over by the jitted encoder."""
    if "t" in _CONST_CACHE:
        return _CONST_CACHE["t"]
    ll = fse.build_ctable(C.LL_DEFAULT_NORM, C.MAX_LL, C.LL_DEFAULT_NORM_LOG)
    ml = fse.build_ctable(C.ML_DEFAULT_NORM, C.MAX_ML, C.ML_DEFAULT_NORM_LOG)
    of = fse.build_ctable(C.OF_DEFAULT_NORM, C.DEFAULT_MAX_OFF,
                          C.OF_DEFAULT_NORM_LOG)

    def pack(ct):
        return {
            "tlog": int(ct.table_log),
            "dnb": np.asarray(ct.delta_nb_bits, np.int64).astype(np.int32),
            "dfs": np.asarray(ct.delta_find_state, np.int32),
            # state numbers relative to table start (u in [0, TS))
            "st": (np.asarray(ct.state_table, np.int64)
                   - (1 << ct.table_log)).astype(np.int32),
        }

    # value -> code LUTs (ZSTD_LLcode/ZSTD_MLcode small-value tables)
    ll_lut = (np.searchsorted(C.LL_BASE, np.arange(64), side="right")
              - 1).astype(np.int32)
    mlv = np.arange(128) + MINMATCH
    ml_lut = (np.searchsorted(C.ML_BASE, mlv, side="right") - 1).astype(np.int32)
    t = {
        "ll": pack(ll), "ml": pack(ml), "of": pack(of),
        "ll_lut": ll_lut, "ml_lut": ml_lut,
        "ll_bits": C.LL_BITS.astype(np.int32),
        "ml_bits": C.ML_BITS.astype(np.int32),
    }
    _CONST_CACHE["t"] = t
    return t


def _highbit(v):
    """floor(log2(v)) for v >= 1 (int32)."""
    return 31 - jax.lax.clz(jnp.maximum(v.astype(jnp.int32), 1))


def _codes_from_values(ll, mlv, ofb, t):
    """ZSTD_seqToCodes:3069 on device: (litLen, matchLen-3, offBase) ->
    (llCode, mlCode, ofCode)."""
    ll_lut = jnp.asarray(t["ll_lut"])
    ml_lut = jnp.asarray(t["ml_lut"])
    ll_code = jnp.where(ll > 63, _highbit(ll) + 19,
                        jnp.take(ll_lut, jnp.clip(ll, 0, 63)))
    ml_code = jnp.where(mlv > 127, _highbit(mlv) + 36,
                        jnp.take(ml_lut, jnp.clip(mlv, 0, 127)))
    of_code = _highbit(ofb)
    return ll_code, ml_code, of_code


# ---------------------------------------------------------------------------
# FSE state chain via permutation-map suffix composition
# ---------------------------------------------------------------------------


def _fse_stream_states(codes, nseq, stream):
    """All encoder states of one FSE stream at once.

    codes: int32 [S] code symbols per sequence (garbage beyond nseq).
    Returns (emit_val [S], emit_nb [S], flush_val []) where slot i holds
    the state bits written when encoding symbol i (zero-width for
    i >= nseq-1: the last symbol initializes without emitting), and
    flush_val is the final tableLog-bit state field.
    """
    S = codes.shape[0]
    tlog = stream["tlog"]
    TS = 1 << tlog
    dnb = jnp.asarray(stream["dnb"])
    dfs = jnp.asarray(stream["dfs"])
    st = jnp.asarray(stream["st"])

    i = jnp.arange(S, dtype=jnp.int32)
    c = jnp.clip(codes, 0, dnb.shape[0] - 1)

    # init state from the LAST real symbol (FSE_initCState2 role)
    c_last = c[jnp.clip(nseq - 1, 0, S - 1)]
    nb0 = (dnb[c_last] + (1 << 15)) >> 16
    v0 = (nb0 << 16) - dnb[c_last]
    u_init = st[(v0 >> nb0) + dfs[c_last]]

    # per-symbol permutation map over u in [0, TS): applied when encoding
    # symbol i with incoming state u (value = TS + u)
    u = jnp.arange(TS, dtype=jnp.int32)[None, :]
    val = TS + u
    nb_u = (val + dnb[c][:, None]) >> 16
    nxt = st[jnp.clip((val >> nb_u) + dfs[c][:, None], 0, TS - 1)]
    ident = jnp.broadcast_to(u, (S, TS))
    # steps exist only for i <= nseq-2
    maps = jnp.where((i[:, None] <= nseq - 2), nxt, ident).astype(jnp.int32)

    # suffix composition: comp[i] = M_i o M_{i+1} o ... o M_{S-1}.
    # In reverse mode the scan combines fn(lower_index, higher_index)
    # with the HIGHER-index result applied first, so the earlier map
    # gathers at the later composition's output: fn(a, b) = b[a].
    def compose(a, b):
        return jnp.take_along_axis(b, a, axis=-1)

    comp = jax.lax.associative_scan(compose, maps, reverse=True, axis=0)
    # state AFTER encoding symbol i: u_i = comp[i][u_init]; the emission
    # at step i uses the INCOMING state u_{i+1} (u_all[nseq-1] = u_init
    # since maps beyond nseq-2 are identity)
    u_all = jnp.take_along_axis(
        comp, jnp.broadcast_to(u_init, (S, 1)), axis=-1)[:, 0]
    u_next = jnp.concatenate([u_all[1:], jnp.zeros(1, jnp.int32)])

    emit_val = TS + u_next
    nb = (emit_val + dnb[c]) >> 16
    emit_nb = jnp.where(i <= nseq - 2, nb, 0)

    flush_val = jnp.where(nseq > 0,
                          jnp.take(u_all, jnp.array(0, jnp.int32)), 0)
    return emit_val, emit_nb, flush_val


# ---------------------------------------------------------------------------
# One-block encode (vmapped across the batch)
# ---------------------------------------------------------------------------


def _encode_lane(block, n_valid, parse, W, t):
    """Compose one frame row from a parsed block.  Returns
    (row uint8 [N+16], out_len int32)."""
    N = block.shape[0]
    S = parse["starts"].shape[0]
    starts = parse["starts"]
    mls = parse["mls"]
    offs = parse["offs"]
    nseq = parse["nseq"]
    covered = parse["covered"]

    i = jnp.arange(S, dtype=jnp.int32)
    real = i < nseq

    # sequence values
    prev_end = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), (starts + mls)[:-1]])
    ll = jnp.where(real, starts - prev_end, 0)
    mlv = jnp.where(real, mls - MINMATCH, 0)
    ofb = jnp.where(real, offs + 3, 1)
    ll_code, ml_code, of_code = _codes_from_values(ll, mlv, ofb, t)

    # literal pool: stable compaction via one sort (uncovered first, in
    # order) — sorts beat arbitrary gathers on TPU (see candidate_stage)
    idx = jnp.arange(N, dtype=jnp.int32)
    drop = covered | (idx >= n_valid)
    key = drop.astype(jnp.uint32) * jnp.uint32(N) + idx.astype(jnp.uint32)
    _, lit_sorted = jax.lax.sort((key, block), num_keys=1, is_stable=False)
    lit_count = (n_valid - jnp.sum(jnp.where(real, mls, 0))).astype(jnp.int32)

    # FSE state chains
    of_val, of_nb, of_fin = _fse_stream_states(of_code, nseq, t["of"])
    ml_val, ml_nb, ml_fin = _fse_stream_states(ml_code, nseq, t["ml"])
    ll_val, ll_nb, ll_fin = _fse_stream_states(ll_code, nseq, t["ll"])

    # extras (value masked by the packer to nbits)
    ll_bits = jnp.take(jnp.asarray(t["ll_bits"]), jnp.clip(ll_code, 0, 35))
    ml_bits = jnp.take(jnp.asarray(t["ml_bits"]), jnp.clip(ml_code, 0, 52))
    ext_ll_nb = jnp.where(real, ll_bits, 0)
    ext_ml_nb = jnp.where(real, ml_bits, 0)
    ext_of_nb = jnp.where(real, of_code, 0)

    # field layout: per sequence i (emitted from i=S-1 down to 0):
    #   [of_state, ml_state, ll_state, ll_extra, ml_extra, of_extra]
    # then [ml_flush, of_flush, ll_flush].  Zero-width pads keep offsets
    # exact (encode/block.py:encode_sequences_bitstream order).
    vals6 = jnp.stack([of_val, ml_val, ll_val, ll, mlv, ofb],
                      axis=1)[::-1].reshape(-1)
    nbs6 = jnp.stack([of_nb, ml_nb, ll_nb, ext_ll_nb, ext_ml_nb, ext_of_nb],
                     axis=1)[::-1].reshape(-1)
    tail_vals = jnp.stack([ml_fin, of_fin, ll_fin])
    tail_nbs = jnp.array([t["ml"]["tlog"], t["of"]["tlog"],
                          t["ll"]["tlog"]], jnp.int32)
    values = jnp.concatenate([vals6, tail_vals]).astype(jnp.uint32)
    nbits = jnp.concatenate([nbs6, tail_nbs]).astype(jnp.uint32)
    nbits = jnp.where(nseq > 0, nbits, 0)

    words, total_bits = pack_bits_device(values, nbits, W)
    bits_len = ((total_bits + 7) >> 3).astype(jnp.int32)
    bits_bytes = ((words[:, None]
                   >> (8 * jnp.arange(4, dtype=jnp.uint32))[None, :])
                  & 0xFF).astype(jnp.uint8).reshape(-1)

    # section sizes
    body = 3 + lit_count + 2 + 1 + bits_len          # lit hdr + lits + nbseq + modes + stream
    comp_total = 12 + body                           # frame hdr 9 + block hdr 3
    raw_total = 12 + n_valid.astype(jnp.int32)
    use_raw = (nseq == 0) | (comp_total >= raw_total)
    out_len = jnp.where(use_raw, raw_total, comp_total)

    # frame header: magic | FHD 0xA0 (single-segment, 4-byte FCS) | FCS32
    fcs = n_valid.astype(jnp.uint32)
    hdr9 = jnp.array([0x28, 0xB5, 0x2F, 0xFD, 0xA0, 0, 0, 0, 0],
                     jnp.uint32).at[5:].set(
        (fcs >> (8 * jnp.arange(4, dtype=jnp.uint32))) & 0xFF)
    bsize = jnp.where(use_raw, n_valid.astype(jnp.int32), body)
    btype = jnp.where(use_raw, 0, 2)
    bh = 1 | (btype << 1) | (bsize << 3)
    bh3 = (bh >> (8 * jnp.arange(3))) & 0xFF
    lh = (0 | (3 << 2) | (lit_count << 4)).astype(jnp.uint32)
    lh3 = (lh >> (8 * jnp.arange(3, dtype=jnp.uint32))) & 0xFF

    # byte-position classifier (3 variable gathers, all minor-dim takes)
    OUT = N + 16
    j = jnp.arange(OUT, dtype=jnp.int32)
    jb = j - 12
    head = jnp.where(j < 9, jnp.take(hdr9, jnp.clip(j, 0, 8)),
                     jnp.take(bh3, jnp.clip(j - 9, 0, 2)))
    raw_byte = jnp.take(block, jnp.clip(jb, 0, N - 1)).astype(jnp.uint32)
    lit_byte = jnp.take(lit_sorted,
                        jnp.clip(jb - 3, 0, N - 1)).astype(jnp.uint32)
    bits_byte = jnp.take(bits_bytes,
                         jnp.clip(jb - 6 - lit_count, 0,
                                  bits_bytes.shape[0] - 1)).astype(jnp.uint32)
    nbseq_b = jnp.where(jb == 3 + lit_count, 128 + (nseq >> 8),
                        nseq & 0xFF).astype(jnp.uint32)
    compressed = jnp.where(
        jb < 3, jnp.take(lh3, jnp.clip(jb, 0, 2)),
        jnp.where(jb < 3 + lit_count, lit_byte,
                  jnp.where(jb < 5 + lit_count, nbseq_b,
                            jnp.where(jb == 5 + lit_count,
                                      jnp.uint32(0), bits_byte))))
    tail = jnp.where(use_raw, raw_byte, compressed)
    row = jnp.where(j < 12, head, tail).astype(jnp.uint8)
    row = jnp.where(j < out_len, row, 0)
    return row, out_len


@partial(jax.jit, static_argnames=("S", "W", "hash_log"))
def encode_frames_device(blocks, n_valid, S: int, W: int,
                         hash_log: int = 15):
    """Batched device encode: uint8 [B, N] padded records -> zstd frame
    rows uint8 [B, N+16] + lengths int32 [B].  Everything — parse, FSE
    coding, bit packing, frame assembly — runs in one XLA program."""
    t = _tables()
    parsed = parse_blocks_ptrjump(blocks, n_valid.astype(jnp.int32),
                                  hash_log, S, 8, 8)
    lane = lambda blk, nv, st, ml, of, ns, cov: _encode_lane(
        blk, nv, {"starts": st, "mls": ml, "offs": of, "nseq": ns,
                  "covered": cov}, W, t)
    rows, lens = jax.vmap(lane)(blocks, n_valid.astype(jnp.int32),
                                parsed["starts"], parsed["mls"],
                                parsed["offs"], parsed["nseq"],
                                parsed["covered"])
    return rows, lens


def seq_budget(n: int) -> int:
    """Max sequences the encoder plans for an n-byte block (the parse
    emits one match per >= MIN_MATCH+1 consumed bytes on average; /4 is
    the format-safe ceiling used by parse_block)."""
    return max(16, n // 8)


def word_budget(s: int) -> int:
    """Bitstream u32 capacity for S sequences: <= 17 state bits + 49
    extra bits per sequence, + 24 flush/end bits."""
    return (66 * s + 24 + 31) // 32 + 2
