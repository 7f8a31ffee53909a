"""Batched sequence decoding on device (ZSTD_decodeSequence:2360 as a
lax.scan, vmapped over blocks).

The FSE state machine is inherently serial per block; throughput on device
comes from decoding MANY blocks in lockstep: each scan step advances one
sequence in every lane.  Tables and bitstreams are padded to common shapes.

This is the canonical TPU formulation (SURVEY.md §7 step 4b).  Measured
reality on v5e: per-step table/bitstream gathers bound throughput (see
PARITY.md), so the production host path remains native; this kernel is the
correctness-matched device mirror used for batched validation and as the
basis for a future Pallas VMEM-resident variant.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _field(payload_u8: jax.Array, pos: jax.Array, nbits: jax.Array) -> jax.Array:
    """bits [pos, pos+nbits) of a little-endian bit vector (zeros below 0)."""
    p = pos + 64  # 8 zero bytes of front padding compiled into the buffer
    byte = (p >> 3).astype(jnp.int32)
    idx = byte[..., None] + jnp.arange(8, dtype=jnp.int32)
    w = jnp.take_along_axis(payload_u8, idx, axis=-1).astype(jnp.uint64)
    shift = jnp.arange(8, dtype=jnp.uint64) * 8
    window = jnp.sum(w << shift, axis=-1, dtype=jnp.uint64)
    window >>= (p & 7).astype(jnp.uint64)
    return window & ((jnp.uint64(1) << nbits.astype(jnp.uint64)) - 1)


@partial(jax.jit, static_argnames=("max_seq",))
def decode_sequences_batch(payloads: jax.Array, total_bits: jax.Array,
                           nb_seq: jax.Array,
                           ll_tab: dict, of_tab: dict, ml_tab: dict,
                           reps: jax.Array, max_seq: int):
    """Decode up to max_seq sequences per block lane.

    payloads: uint8 [B, 8+P] (8 zero bytes prepended); total_bits [B] (end
    mark stripped); tables: dicts of base u32 [B,T], add u8, ns u16, sb u8,
    log i32 [B]; reps: uint32 [B, 3].
    Returns (ll, ml, offset) uint32 [B, max_seq] (defined for i < nb_seq).
    """
    B = payloads.shape[0]

    def read(pos, n):
        return _field(payloads, pos, n)

    pos = total_bits.astype(jnp.int64)
    pos = pos - ll_tab["log"]
    s_ll = read(pos, ll_tab["log"]).astype(jnp.int32)
    pos = pos - of_tab["log"]
    s_of = read(pos, of_tab["log"]).astype(jnp.int32)
    pos = pos - ml_tab["log"]
    s_ml = read(pos, ml_tab["log"]).astype(jnp.int32)

    lane = jnp.arange(B)

    def gather(tab, field, state):
        return tab[field][lane, state]

    def step(carry, i):
        pos, s_ll, s_of, s_ml, r0, r1, r2 = carry
        ll_base = gather(ll_tab, "base", s_ll).astype(jnp.uint32)
        ll_bits = gather(ll_tab, "add", s_ll).astype(jnp.int64)
        ml_base = gather(ml_tab, "base", s_ml).astype(jnp.uint32)
        ml_bits = gather(ml_tab, "add", s_ml).astype(jnp.int64)
        of_base = gather(of_tab, "base", s_of).astype(jnp.uint64)
        of_bits = gather(of_tab, "add", s_of).astype(jnp.int64)

        pos = pos - of_bits
        of_extra = read(pos, of_bits)
        # offset + repcode resolution (vectorized select over the 3 cases)
        ll0 = ll_base == 0
        big = of_bits > 1
        one = of_bits == 1
        off_big = of_base + of_extra
        idx = (of_base + ll0 + of_extra).astype(jnp.uint32)  # 1..3 when one
        tmp = jnp.where(idx == 3, r0 - 1, jnp.where(idx == 1, r1, r2))
        tmp = jnp.maximum(tmp, 1)
        off_zero = jnp.where(ll0, r1, r0)
        offset = jnp.where(big, off_big.astype(jnp.uint32),
                           jnp.where(one, tmp, off_zero))
        n_r2 = jnp.where(big, r1, jnp.where(one, jnp.where(idx != 1, r1, r2), r2))
        n_r1 = jnp.where(big | one, r0, jnp.where(ll0, r0, r1))
        n_r0 = jnp.where(big | one, offset, jnp.where(ll0, r1, r0))
        r0, r1, r2 = n_r0, n_r1, n_r2

        pos = pos - ml_bits
        ml = ml_base + read(pos, ml_bits).astype(jnp.uint32)
        pos = pos - ll_bits
        ll = ll_base + read(pos, ll_bits).astype(jnp.uint32)

        # state updates (LL, ML, OF order); masked past nb_seq-1
        live = i < nb_seq - 1
        nb = gather(ll_tab, "sb", s_ll).astype(jnp.int64)
        pos2 = pos - nb
        s_ll2 = gather(ll_tab, "ns", s_ll).astype(jnp.int32) + read(pos2, nb).astype(jnp.int32)
        nb2 = gather(ml_tab, "sb", s_ml).astype(jnp.int64)
        pos3 = pos2 - nb2
        s_ml2 = gather(ml_tab, "ns", s_ml).astype(jnp.int32) + read(pos3, nb2).astype(jnp.int32)
        nb3 = gather(of_tab, "sb", s_of).astype(jnp.int64)
        pos4 = pos3 - nb3
        s_of2 = gather(of_tab, "ns", s_of).astype(jnp.int32) + read(pos4, nb3).astype(jnp.int32)
        pos = jnp.where(live, pos4, pos)
        s_ll = jnp.where(live, s_ll2, s_ll)
        s_ml = jnp.where(live, s_ml2, s_ml)
        s_of = jnp.where(live, s_of2, s_of)
        return (pos, s_ll, s_of, s_ml, r0, r1, r2), (ll, ml, offset)

    r = reps.astype(jnp.uint32)
    init = (pos, s_ll, s_of, s_ml, r[:, 0], r[:, 1], r[:, 2])
    _, (lls, mls, offs) = jax.lax.scan(step, init, jnp.arange(max_seq))
    return lls.T, mls.T, offs.T


def pack_dtables(tables, pad_to: int = 512):
    """Host helper: list of FseDTable -> padded dict-of-arrays batch."""
    B = len(tables)
    out = {
        "base": np.zeros((B, pad_to), np.uint32),
        "add": np.zeros((B, pad_to), np.uint8),
        "ns": np.zeros((B, pad_to), np.uint16),
        "sb": np.zeros((B, pad_to), np.uint8),
        "log": np.zeros(B, np.int64),
    }
    for b, t in enumerate(tables):
        n = 1 << t.table_log
        out["base"][b, :n] = t.base_value
        out["add"][b, :n] = t.nb_add_bits
        out["ns"][b, :n] = t.new_state
        out["sb"][b, :n] = t.nb_bits
        out["log"][b] = t.table_log
    return {k: jnp.asarray(v) for k, v in out.items()}
