"""Batched Huffman literal decode on TPU (Pallas).

The device plane of the decode pipeline (HufDecompress.cs:342 role,
re-designed for the VPU): many independent zstd Huffman streams decode in
lockstep, one stream per (sublane, lane) slot.  The serial dependency (bit
position advances by a data-dependent amount per symbol) stays inside the
lane; throughput comes from the 1024-wide lane batch.

Key reformulations (no per-lane gather primitive exists on the VPU):
 - canonical-arithmetic decode: the peeked 11-bit value maps to a code
   length via compares against per-lane class limits and to a rank via
   per-lane base/offset/shift vectors — O(tableLog) work instead of a
   2^tableLog table lookup;
 - rank -> symbol via bit-plane select: the per-lane 256-entry permutation
   is stored as 8 bit-planes x 8 u32 words, so a lookup is an 8-way word
   select + shift per plane — O(64) instead of O(256);
 - the stream is read through an 8-word-aligned 16-word window refilled
   every 16 symbols, keeping per-step select cost O(16) with an O(W)
   refill amortized over the round.

Layouts put selection axes first ([K, SUB, LN]); trailing small axes would
be lane-padded to 128 by Mosaic and cost 8x (measured).

Stream bit semantics match the host reference exactly (native
huf_decode_stream): bit i of a stream is bit (i&7) of byte (i>>3); initial
position is (len-1)*8 + highbit(last byte); peek reads bits [pos-11, pos),
zeros below bit 0.
"""

from dataclasses import dataclass

import numpy as np

SUB, LN = 8, 128
LANES = SUB * LN
MAXLOG = 11
SMALL_W = 16          # container-feed window (u32 words)
REFILL_EVERY = 16     # symbols per window refill (16*11 bits < 8 words)


def _jax():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return jax, jnp, pl, pltpu


def _target_is_tpu() -> bool:
    """True when dispatches will land on a TPU: honors jax.default_device
    overrides (a CPU mesh on a TPU-registered process must interpret)."""
    import jax

    d = jax.config.jax_default_device
    if d is not None:
        return d.platform == "tpu"
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# Host-side preparation
# ---------------------------------------------------------------------------


@dataclass
class HufBatch:
    """Device operands for one kernel launch (numpy, device_put by caller)."""

    words: np.ndarray      # [W, SUB, LN] int32 stream words
    limits: np.ndarray     # [16, SUB, LN] int32 (11-bit class thresholds)
    bases: np.ndarray      # [16, SUB, LN] rank base per class
    offs: np.ndarray       # [16, SUB, LN] 11-bit value offset per class
    shifts: np.ndarray     # [16, SUB, LN] rank shift per class
    planes: np.ndarray     # [8, 8, SUB, LN] int32 perm bit-planes
    pos: np.ndarray        # [1, SUB, LN] int32 initial bit positions
    n_sym: np.ndarray      # [SUB, LN] int32 symbols per stream
    t_max: int


def canonical_from_weights(weights):
    """(tlog, start[], classbase[], perm[]) from zstd Huffman weights.

    zstd X1 layout (HUF_readDTableX1 role): the 2^tlog peek space is filled
    in weight-ascending order (longest codes at low indexes), symbols in
    symbol order within a weight class.  A peek value v in class w decodes
    with nb = tlog+1-w bits to perm[classbase[w] + ((v - start[w]) >> (w-1))].
    """
    weights = np.asarray(weights, dtype=np.int64)
    total = int((1 << weights[weights > 0]).sum() >> 1)
    tlog = max(int(np.log2(total)) if total else 1, 1)
    start = np.zeros(MAXLOG + 2, dtype=np.int64)
    classbase = np.zeros(MAXLOG + 2, dtype=np.int64)
    perm = np.zeros(256, dtype=np.int64)
    pos = 0
    rank = 0
    for w in range(1, tlog + 1):
        start[w] = pos
        classbase[w] = rank
        syms = np.nonzero(weights == w)[0]
        perm[rank : rank + len(syms)] = syms
        rank += len(syms)
        pos += len(syms) << (w - 1)
    start[tlog + 1 :] = pos
    return tlog, start, classbase, perm


def prepare_batch(payloads, weights_per_stream, n_syms):
    """Build device operands for up to LANES streams.

    weights_per_stream[i]: the weight vector of stream i's table (the four
    streams of a block pass the same vector)."""
    n = len(payloads)
    assert 0 < n <= LANES
    wmax = max(max((len(p) + 3) // 4 for p in payloads), 2)
    words = np.zeros((wmax, LANES), dtype=np.uint32)
    pos = np.zeros(LANES, dtype=np.int32)
    for i, p in enumerate(payloads):
        if not p:
            continue
        b = np.frombuffer(p, dtype=np.uint8)
        pad = (-len(b)) % 4
        if pad:
            b = np.concatenate([b, np.zeros(pad, np.uint8)])
        words[: len(b) // 4, i] = b.view("<u4")
        last = p[-1]
        if last == 0:
            raise ValueError("corrupt stream: zero last byte")
        pos[i] = (len(p) - 1) * 8 + int(last).bit_length() - 1

    limits = np.full((16, LANES), 1 << MAXLOG, np.int32)
    bases = np.zeros((16, LANES), np.int32)
    offs = np.zeros((16, LANES), np.int32)
    shifts = np.zeros((16, LANES), np.int32)
    planes = np.zeros((8, 8, LANES), np.int32)
    cache = {}
    for i in range(n):
        wkey = np.asarray(weights_per_stream[i], np.uint8).tobytes()
        got = cache.get(wkey)
        if got is None:
            tlog, start, classbase, perm = canonical_from_weights(
                weights_per_stream[i])
            sc = MAXLOG - tlog
            lim = np.full(16, 1 << MAXLOG, np.int64)
            bas = np.zeros(16, np.int64)
            off = np.zeros(16, np.int64)
            shf = np.zeros(16, np.int64)
            for w in range(1, tlog + 1):
                lim[w - 1] = start[w + 1] << sc
                bas[w - 1] = classbase[w]
                off[w - 1] = start[w] << sc
                shf[w - 1] = (w - 1) + sc
            pb = np.zeros((8, 8), np.uint32)
            for rk in range(256):
                s = int(perm[rk])
                for j in range(8):
                    if (s >> j) & 1:
                        pb[j, rk >> 5] |= np.uint32(1 << (rk & 31))
            got = (lim, bas, off, shf, pb.astype(np.int64))
            cache[wkey] = got
        lim, bas, off, shf, pb = got
        limits[:, i] = lim
        bases[:, i] = bas
        offs[:, i] = off
        shifts[:, i] = shf
        planes[:, :, i] = pb.astype(np.uint32).astype(np.int64).astype(
            np.int32) if pb.dtype != np.int32 else pb

    nsym = np.zeros(LANES, np.int32)
    nsym[:n] = n_syms
    return HufBatch(
        words.view(np.int32).reshape(wmax, SUB, LN),
        limits.reshape(16, SUB, LN), bases.reshape(16, SUB, LN),
        offs.reshape(16, SUB, LN), shifts.reshape(16, SUB, LN),
        planes.reshape(8, 8, SUB, LN), pos.reshape(1, SUB, LN),
        nsym.reshape(SUB, LN), int(max(n_syms)) if n_syms else 0)


# ---------------------------------------------------------------------------
# Reference (numpy) implementation of the exact device algorithm
# ---------------------------------------------------------------------------


def decode_reference(batch):
    """Bit-exact numpy mirror of the kernel (for tests/debug)."""
    W = batch.words.shape[0]
    words = batch.words.reshape(W, LANES).astype(np.uint32).astype(np.int64)
    limits = batch.limits.reshape(16, LANES).astype(np.int64)
    bases = batch.bases.reshape(16, LANES).astype(np.int64)
    offs = batch.offs.reshape(16, LANES).astype(np.int64)
    shifts = batch.shifts.reshape(16, LANES).astype(np.int64)
    planes = batch.planes.reshape(8, 8, LANES).astype(np.uint32)
    pos = batch.pos.reshape(LANES).astype(np.int64).copy()
    T = batch.t_max
    out = np.zeros((T, LANES), np.int32)
    for t in range(T):
        p0 = pos - MAXLOG
        k = p0 >> 5
        sh = p0 & 31
        w0 = np.where((k >= 0) & (k < W), words[np.clip(k, 0, W - 1),
                                               np.arange(LANES)], 0)
        k1 = k + 1
        w1 = np.where((k1 >= 0) & (k1 < W), words[np.clip(k1, 0, W - 1),
                                                  np.arange(LANES)], 0)
        w0 &= 0xFFFFFFFF
        w1 &= 0xFFFFFFFF
        v = np.where(sh == 0, w0, (w0 >> sh) | ((w1 << (32 - sh))
                                                & 0xFFFFFFFF))
        v &= (1 << MAXLOG) - 1
        cls = (v[None] >= limits).sum(axis=0)
        lane = np.arange(LANES)
        base = bases[cls, lane]
        off = offs[cls, lane]
        shf = shifts[cls, lane]
        rank = np.clip(base + ((v - off) >> shf), 0, 255)
        nb = MAXLOG - shf
        hi, lo = rank >> 5, rank & 31
        sym = np.zeros(LANES, np.int64)
        for j in range(8):
            word = planes[j, hi, lane].astype(np.int64)
            sym |= ((word >> lo) & 1) << j
        out[t] = sym
        pos = pos - nb
    return out


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


_KERNEL_CACHE = {}

ROUNDS_PER_STEP = 16  # refill rounds per grid step (amortizes grid overhead)
CHUNK = REFILL_EVERY * ROUNDS_PER_STEP


def _decode_fn(T, W, interpret=False, sub=SUB):
    jax, jnp, pl, pltpu = _jax()
    SUB = sub  # shadow the module default: lane count is sub * 128
    key = (T, W, interpret, sub)
    if key in _KERNEL_CACHE:
        return _KERNEL_CACHE[key]

    nblk = W // 8
    nchunks = T // CHUNK

    def kernel(words_ref, limits_ref, bases_ref, offs_ref, shifts_ref,
               planes_ref, pos_ref, out_ref, pos_scr):
        r = pl.program_id(0)

        @pl.when(r == 0)
        def _():
            pos_scr[:] = pos_ref[:]

        limits = limits_ref[:]
        bases = bases_ref[:]
        offs = offs_ref[:]
        shifts = shifts_ref[:]
        planes = planes_ref[:]

        lvl_iota = jax.lax.broadcasted_iota(jnp.int32, (16, SUB, LN), 0)
        sw_iota = jax.lax.broadcasted_iota(jnp.int32, (SMALL_W, SUB, LN), 0)

        def one_round(rnd, pos):
            # refill: window = words[8a, 8a+16) per lane; scan only the
            # block slab live lanes can touch this round
            low = (pos - (REFILL_EVERY * MAXLOG + MAXLOG)) >> 5
            a = jnp.minimum(jnp.maximum(low >> 3, 0), max(nblk - 2, 0))
            base_w = (a * 8).astype(jnp.int32)
            done = pos <= 0
            blk_lo = jnp.min(jnp.where(done, nblk, a)).astype(jnp.int32)
            blk_hi = jnp.minimum(jnp.max(jnp.where(done, 0, a)) + 2,
                                 nblk).astype(jnp.int32)
            blk_lo = jnp.minimum(blk_lo, blk_hi)

            def rbody(blk, halves):
                lo_half, hi_half = halves
                wblk = words_ref[pl.ds(blk * 8, 8)]
                lo_half = lo_half + jnp.where((base_w == blk * 8)[None],
                                              wblk, 0)
                hi_half = hi_half + jnp.where(
                    (base_w == (blk - 1) * 8)[None], wblk, 0)
                return lo_half, hi_half

            lo_half, hi_half = jax.lax.fori_loop(
                blk_lo, blk_hi, rbody,
                (jnp.zeros((8, SUB, LN), jnp.int32),
                 jnp.zeros((8, SUB, LN), jnp.int32)))

            def step(t, pos):
                p0 = pos - MAXLOG
                k = p0 >> 5
                sh = (p0 & 31).astype(jnp.int32)
                kl = k - base_w
                oh0l = (sw_iota[:8] == kl[None]).astype(jnp.int32)
                oh0h = (sw_iota[8:] == kl[None]).astype(jnp.int32)
                w0 = (jnp.sum(lo_half * oh0l, axis=0)
                      + jnp.sum(hi_half * oh0h, axis=0))
                kl1 = kl + 1
                oh1l = (sw_iota[:8] == kl1[None]).astype(jnp.int32)
                oh1h = (sw_iota[8:] == kl1[None]).astype(jnp.int32)
                w1 = (jnp.sum(lo_half * oh1l, axis=0)
                      + jnp.sum(hi_half * oh1h, axis=0))
                w0 = jnp.where(k < 0, 0, w0).astype(jnp.int32)
                w1 = jnp.where(k + 1 < 0, 0, w1).astype(jnp.int32)
                sh32 = ((32 - sh) & 31).astype(jnp.int32)
                vfull = jnp.where(
                    sh == 0, w0,
                    jnp.bitwise_or(
                        jax.lax.shift_right_logical(w0, sh),
                        jax.lax.shift_left(w1, sh32)))
                v = vfull & ((1 << MAXLOG) - 1)
                cls = jnp.sum((v[None] >= limits).astype(jnp.int32), axis=0)
                oh = (lvl_iota == cls[None]).astype(jnp.int32)
                base = jnp.sum(bases * oh, axis=0)
                off = jnp.sum(offs * oh, axis=0)
                shf = jnp.sum(shifts * oh, axis=0)
                rank = jnp.minimum(
                    jnp.maximum(base + ((v - off) >> shf), 0), 255)
                nbits = MAXLOG - shf
                hi = rank >> 5
                lo = rank & 31
                sym = jnp.zeros_like(rank)
                for j in range(8):
                    word = jnp.zeros_like(rank)
                    for wd in range(8):
                        word = word + jnp.where(hi == wd, planes[j, wd], 0)
                    sym = sym | (((word >> lo) & 1) << j)
                out_ref[pl.ds(rnd * REFILL_EVERY + t, 1)] = (
                    sym[None].astype(jnp.int32))
                return (pos - nbits).astype(jnp.int32)

            return jax.lax.fori_loop(0, REFILL_EVERY, step, pos)

        pos = pos_scr[0]
        done_all = jnp.all(pos <= 0)

        @pl.when(jnp.logical_not(done_all))
        def _():
            pos2 = jax.lax.fori_loop(0, ROUNDS_PER_STEP, one_round, pos)
            pos_scr[0] = pos2

        @pl.when(done_all)
        def _():
            out_ref[:] = jnp.zeros((CHUNK, SUB, LN), jnp.int32)

    def fn(words, limits, bases, offs, shifts, planes, pos):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(nchunks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
            out_specs=pl.BlockSpec((CHUNK, SUB, LN), lambda r: (r, 0, 0)),
            scratch_shapes=[pltpu.VMEM((1, SUB, LN), jnp.int32)],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((T, SUB, LN), jnp.int32),
            interpret=interpret,
        )(words, limits, bases, offs, shifts, planes, pos)

    jfn = jax.jit(fn)
    _KERNEL_CACHE[key] = jfn
    return jfn


# VMEM budget: streams [W,8,128] i32 stay fully resident; cap W so the
# working set fits the 16MB scoped limit (8MB streams + windows/tables).
MAX_W = 2048          # 8KB per stream
_W_BUCKETS = (64, 256, 512, 768, 1024, 1536, 2048)
_T_BUCKETS = (256, 1024, 4096, 8192, 16384, 32768)


def huf_decode_device(batch, interpret=False):
    """Decode the batch on the TPU; returns [T, SUB, LN] int32 symbols
    (device array).  T is t_max rounded up to a bucket size.

    Runs with x64 disabled: the kernel is pure int32, and the package-level
    x64 mode (used by the jnp reference ops) trips a Mosaic lowering
    recursion on mixed-width converts.

    Streams longer than MAX_W words exceed the VMEM residency budget and
    must go to the host tier (raises ValueError so callers can fall back).
    """
    jax, jnp, pl, pltpu = _jax()
    W = batch.words.shape[0]
    if W > MAX_W:
        raise ValueError(f"stream too long for device tier: {W} > {MAX_W}")
    W_pad = next(b for b in _W_BUCKETS if b >= W)
    words = np.zeros((W_pad, SUB, LN), np.int32)
    words[:W] = batch.words
    T = next(b for b in _T_BUCKETS if b >= max(batch.t_max, 1))
    if not _target_is_tpu():
        interpret = True  # Pallas TPU kernels only interpret on CPU
    fn = _decode_fn(T, W_pad, interpret)
    with jax.enable_x64(False):
        return fn(jnp.asarray(words), jnp.asarray(batch.limits),
                  jnp.asarray(batch.bases), jnp.asarray(batch.offs),
                  jnp.asarray(batch.shifts), jnp.asarray(batch.planes),
                  jnp.asarray(batch.pos))


def round_lanes(n: int) -> int:
    """Smallest 128*2^k >= n (kernel lane widths), capped at LANES."""
    nl = 128
    while nl < n and nl < LANES:
        nl *= 2
    return nl


def bucket_w(w: int) -> int:
    return next(b for b in _W_BUCKETS if b >= max(w, 2))


def bucket_t(t: int) -> int:
    return next(b for b in _T_BUCKETS if b >= max(t, 1))


_LM_CACHE = {}


def _lm_fn(NL, Wb, T, interpret):
    """Jitted wrapper: lane-major operands -> kernel layout (the transpose
    runs on-device at HBM rate; the host packs lane rows contiguously) ->
    pallas decode -> [NL, T] per-lane symbol rows."""
    jax, jnp, pl, pltpu = _jax()
    key = (NL, Wb, T, interpret)
    got = _LM_CACHE.get(key)
    if got is not None:
        return got
    sub = NL // LN
    fn_p = _decode_fn(T, Wb, interpret, sub=sub)

    def wrap(words, limits, bases, offs, shifts, planes, pos):
        w = words.T.reshape(Wb, sub, LN)
        lim = limits.T.reshape(16, sub, LN)
        bas = bases.T.reshape(16, sub, LN)
        off = offs.T.reshape(16, sub, LN)
        shf = shifts.T.reshape(16, sub, LN)
        pln = planes.T.reshape(8, 8, sub, LN)
        ps = pos.reshape(1, sub, LN)
        out = fn_p(w, lim, bas, off, shf, pln, ps)
        return out.reshape(T, NL).T

    jfn = jax.jit(wrap)
    _LM_CACHE[key] = jfn
    return jfn


def decode_lanemajor(ops: dict, interpret=False):
    """Decode from lane-major operands (the native planner's layout; see
    _NativeOps.huf_ops).  ops: words [NL, Wb] i32, limits/bases/offs/shifts
    [NL, 16], planes [NL, 64], pos [NL], t_max.  Returns [NL, T] int32
    device rows (row l = stream l's symbols)."""
    jax, jnp, pl, pltpu = _jax()
    words = ops["words"]
    NL, Wb = words.shape
    T = bucket_t(ops["t_max"])
    if not _target_is_tpu():
        interpret = True
    fn = _lm_fn(NL, Wb, T, interpret)
    c = np.ascontiguousarray
    with jax.enable_x64(False):
        return fn(jnp.asarray(c(words)), jnp.asarray(c(ops["limits"])),
                  jnp.asarray(c(ops["bases"])), jnp.asarray(c(ops["offs"])),
                  jnp.asarray(c(ops["shifts"])),
                  jnp.asarray(c(ops["planes"])), jnp.asarray(c(ops["pos"])))


def make_runner(batch):
    """Upload the batch once and return a zero-upload callable (for
    steady-state use and kernel-rate benchmarking: the tunnel-attached
    dev box pays ~35ms sync + slow h2d per transfer, which is not kernel
    time)."""
    jax, jnp, pl, pltpu = _jax()
    W = batch.words.shape[0]
    if W > MAX_W:
        raise ValueError(f"stream too long for device tier: {W} > {MAX_W}")
    W_pad = next(b for b in _W_BUCKETS if b >= W)
    words = np.zeros((W_pad, SUB, LN), np.int32)
    words[:W] = batch.words
    T = next(b for b in _T_BUCKETS if b >= max(batch.t_max, 1))
    interpret = not _target_is_tpu()
    fn = _decode_fn(T, W_pad, interpret)
    with jax.enable_x64(False):
        ops = [jax.device_put(jnp.asarray(x)) for x in
               (words, batch.limits, batch.bases, batch.offs, batch.shifts,
                batch.planes, batch.pos)]

    def run():
        with jax.enable_x64(False):
            return fn(*ops)

    return run
