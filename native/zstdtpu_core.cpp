// zstdtpu_core — native host engine for the serial byte-stream stages.
//
// The TPU owns the data-parallel compute (match candidates, histograms,
// bit-packing scans); these routines cover the per-block serial state
// machines that a host CPU finishes faster than a Python loop:
//   * Huffman X1 stream decode   (HufDecompress.cs:264 role)
//   * FSE 3-state sequence decode incl. repcodes (ZstdDecompressBlock.cs:2360)
//   * sequence execution (LZ copy, ZstdDecompressBlock.cs:2187)
//   * greedy fast match finder   (ZstdFast.cs:96 role)
//   * interleaved sequence bitstream encode (ZstdCompressSequences.cs:585)
//   * backward bitstream pack for Huffman streams
//
// Exposed as a plain C ABI for ctypes.  No libzstd code is used; the logic
// mirrors the Python reference modules in zstdsharp_tpu/ (the bit-exactness
// oracle), which are themselves validated against RFC 8878 frames.

#include <cstdint>
#include <cstring>
#include <cstddef>

extern "C" {

// ---------------------------------------------------------------------------
// Bit reading (backward streams)
// ---------------------------------------------------------------------------

struct BitReader {
    const uint8_t* buf;   // padded: 16 zero bytes precede payload
    int64_t pos;          // bit position (0 = stream start)
};

static inline uint64_t read_window(const uint8_t* p) {
    uint64_t w;
    std::memcpy(&w, p, 8);
    return w;  // little-endian hosts only (x86/ARM LE)
}

static inline uint64_t br_field(const uint8_t* padded, int64_t pos, int nbits) {
    // bits [pos, pos+nbits) of the stream; PAD=16 zero bytes in front
    int64_t p = pos + 16 * 8;
    if (p < 0) return 0;
    const uint64_t w = read_window(padded + (p >> 3));
    return (w >> (p & 7)) & ((nbits >= 64) ? ~0ULL : ((1ULL << nbits) - 1));
}

// Initialize: returns total payload bits (end mark stripped), or -1 on error.
static int64_t br_init(const uint8_t* payload, int64_t size) {
    if (size <= 0) return -1;
    uint8_t last = payload[size - 1];
    if (last == 0) return -1;
    int hb = 31 - __builtin_clz((uint32_t)last);
    return (size - 1) * 8 + hb;
}

// ---------------------------------------------------------------------------
// Huffman X1 decode: one stream, table-driven
// ---------------------------------------------------------------------------

// padded = 16 zero bytes + payload.  Returns 0 on success, -1 on corruption.
int64_t huf_decode_stream(const uint8_t* padded, int64_t payload_size,
                          const uint8_t* tbl_sym, const uint8_t* tbl_nb,
                          int table_log, uint8_t* out, int64_t n_out) {
    int64_t pos = br_init(padded + 16, payload_size);
    if (pos < 0) return -1;
    const uint64_t mask = (1ULL << table_log) - 1;
    for (int64_t i = 0; i < n_out; i++) {
        int64_t p = pos - table_log + 16 * 8;
        uint64_t idx;
        if (p >= 0) {
            idx = (read_window(padded + (p >> 3)) >> (p & 7)) & mask;
        } else {
            idx = 0;
        }
        out[i] = tbl_sym[idx];
        pos -= tbl_nb[idx];
    }
    return pos == 0 ? 0 : -1;
}

// Decode 4 streams with shared table; sizes/outputs per stream.
int64_t huf_decode_4streams(const uint8_t* const* padded, const int64_t* sizes,
                            const uint8_t* tbl_sym, const uint8_t* tbl_nb,
                            int table_log, uint8_t* out, const int64_t* out_sizes) {
    int64_t off = 0;
    for (int s = 0; s < 4; s++) {
        int64_t rc = huf_decode_stream(padded[s], sizes[s], tbl_sym, tbl_nb,
                                       table_log, out + off, out_sizes[s]);
        if (rc != 0) return -1 - s;
        off += out_sizes[s];
    }
    return 0;
}

// ---------------------------------------------------------------------------
// FSE sequence decode (3 interleaved states + repcodes)
// ---------------------------------------------------------------------------

// Tables are struct-of-arrays: base (u32), add_bits (u8), next_state (u16),
// state_bits (u8); logs are the table logs.
int64_t fse_decode_sequences(
    const uint8_t* padded, int64_t payload_size, int64_t nb_seq,
    const uint32_t* ll_base, const uint8_t* ll_add, const uint16_t* ll_ns, const uint8_t* ll_sb, int ll_log,
    const uint32_t* of_base, const uint8_t* of_add, const uint16_t* of_ns, const uint8_t* of_sb, int of_log,
    const uint32_t* ml_base, const uint8_t* ml_add, const uint16_t* ml_ns, const uint8_t* ml_sb, int ml_log,
    uint32_t* rep,  /* in/out [3] */
    uint32_t* out_ll, uint32_t* out_ml, uint32_t* out_of) {

    int64_t pos = br_init(padded + 16, payload_size);
    if (pos < 0) return -1;

    pos -= ll_log; uint32_t s_ll = (uint32_t)br_field(padded, pos, ll_log);
    pos -= of_log; uint32_t s_of = (uint32_t)br_field(padded, pos, of_log);
    pos -= ml_log; uint32_t s_ml = (uint32_t)br_field(padded, pos, ml_log);

    uint64_t r0 = rep[0], r1 = rep[1], r2 = rep[2];

    for (int64_t i = 0; i < nb_seq; i++) {
        const uint32_t llB = ll_base[s_ll]; const int llb = ll_add[s_ll];
        const uint32_t mlB = ml_base[s_ml]; const int mlb = ml_add[s_ml];
        const uint32_t ofB = of_base[s_of]; const int ofb = of_add[s_of];

        uint64_t offset;
        if (ofb > 1) {
            pos -= ofb;
            offset = ofB + br_field(padded, pos, ofb);
            r2 = r1; r1 = r0; r0 = offset;
        } else {
            const int ll0 = (llB == 0);
            if (ofb == 0) {
                offset = ll0 ? r1 : r0;
                if (ll0) { uint64_t t = r0; r0 = r1; r1 = t; }
            } else {
                pos -= 1;
                uint64_t idx = ofB + ll0 + br_field(padded, pos, 1);
                uint64_t t = (idx == 3) ? r0 - 1 : (idx == 1 ? r1 : r2);
                if (t == 0) t = 1;
                if (idx != 1) r2 = r1;
                r1 = r0; r0 = offset = t;
            }
        }

        uint64_t ml = mlB;
        if (mlb) { pos -= mlb; ml += br_field(padded, pos, mlb); }
        uint64_t ll = llB;
        if (llb) { pos -= llb; ll += br_field(padded, pos, llb); }

        out_ll[i] = (uint32_t)ll;
        out_ml[i] = (uint32_t)ml;
        out_of[i] = (uint32_t)offset;

        if (i != nb_seq - 1) {
            int nb;
            nb = ll_sb[s_ll]; pos -= nb; s_ll = ll_ns[s_ll] + (uint32_t)br_field(padded, pos, nb);
            nb = ml_sb[s_ml]; pos -= nb; s_ml = ml_ns[s_ml] + (uint32_t)br_field(padded, pos, nb);
            nb = of_sb[s_of]; pos -= nb; s_of = of_ns[s_of] + (uint32_t)br_field(padded, pos, nb);
            if (pos < 0) return -2;
        }
    }
    if (pos != 0) return -3;
    rep[0] = (uint32_t)r0; rep[1] = (uint32_t)r1; rep[2] = (uint32_t)r2;
    return 0;
}

// ---------------------------------------------------------------------------
// Sequence execution (LZ copy into frame-wide output)
// ---------------------------------------------------------------------------

int64_t execute_sequences(uint8_t* out, int64_t out_pos, int64_t out_cap,
                          int64_t prefix_start,
                          const uint8_t* literals, int64_t n_literals,
                          const uint32_t* ll, const uint32_t* ml,
                          const uint32_t* of, int64_t nb_seq) {
    int64_t lit_pos = 0;
    for (int64_t i = 0; i < nb_seq; i++) {
        const int64_t l = ll[i], m = ml[i], o = of[i];
        if (lit_pos + l > n_literals) return -1;
        if (out_pos + l + m > out_cap) return -2;
        std::memcpy(out + out_pos, literals + lit_pos, (size_t)l);
        out_pos += l; lit_pos += l;
        if (o <= 0 || o > out_pos - prefix_start) return -3;
        const uint8_t* src = out + out_pos - o;
        if (o >= m) {
            std::memcpy(out + out_pos, src, (size_t)m);
            out_pos += m;
        } else {
            // overlapped: byte-wise (pattern replication)
            uint8_t* dst = out + out_pos;
            for (int64_t k = 0; k < m; k++) dst[k] = src[k];
            out_pos += m;
        }
    }
    const int64_t rest = n_literals - lit_pos;
    if (rest < 0 || out_pos + rest > out_cap) return -4;
    std::memcpy(out + out_pos, literals + lit_pos, (size_t)rest);
    return out_pos + rest;
}

// ---------------------------------------------------------------------------
// Greedy fast match finder (single hash table)
// ---------------------------------------------------------------------------

static inline uint32_t read32(const uint8_t* p) {
    uint32_t v; std::memcpy(&v, p, 4); return v;
}

static inline uint32_t hash32(uint32_t v, int hlog) {
    return (v * 2654435761u) >> (32 - hlog);
}

static inline int64_t count_match(const uint8_t* src, int64_t a, int64_t b,
                                  int64_t end) {
    int64_t len = 0;
    const int64_t n = end - a;
    while (len + 8 <= n) {
        uint64_t x = read_window(src + a + len) ^ read_window(src + b + len);
        if (x) return len + (__builtin_ctzll(x) >> 3);
        len += 8;
    }
    while (len < n && src[a + len] == src[b + len]) len++;
    return len;
}

// Emits sequences for [start, end) of src; table: int64[1<<hlog] holding
// absolute positions (-1 = empty), persists across blocks.
// rep: in/out [2].  Returns nb_seq (capacity guarded) or -1.
int64_t fast_find_matches(const uint8_t* src, int64_t src_len,
                          int64_t start, int64_t end, int64_t window_start,
                          int64_t window_size,
                          int64_t* table, int hlog,
                          uint32_t* rep_io,
                          uint32_t* out_ll, uint32_t* out_ml, uint32_t* out_ob,
                          int64_t max_seq, int64_t* out_last_lit,
                          int acceleration) {
    if (end - start < 16) { *out_last_lit = end - start; return 0; }
    const int64_t limit = end - 8;
    int64_t rep0 = rep_io[0], rep1 = rep_io[1];
    int64_t pos = start + (window_start == 0 && start == 0 ? 1 : 0);
    int64_t anchor = start;
    int64_t n_seq = 0;

    while (pos < limit && n_seq + 4 < max_seq) {
        const uint32_t cur = read32(src + pos);
        const uint32_t hv = hash32(cur, hlog);
        int64_t cand = table[hv];
        table[hv] = pos;

        // rep0 probe at pos+1
        if (pos + 1 < limit && pos + 1 - rep0 >= window_start &&
            read32(src + pos + 1) == read32(src + pos + 1 - rep0)) {
            int64_t p = pos + 1;
            int64_t ml = 4 + count_match(src, p + 4, p + 4 - rep0, end);
            out_ll[n_seq] = (uint32_t)(p - anchor);
            out_ml[n_seq] = (uint32_t)ml;
            out_ob[n_seq] = 1;
            n_seq++;
            pos = p + ml; anchor = pos;
            if (pos + 4 < limit) {
                table[hash32(read32(src + pos - 2), hlog)] = pos - 2;
            }
            // rep1 continuation
            while (pos < limit && n_seq < max_seq &&
                   pos - rep1 >= window_start &&
                   read32(src + pos) == read32(src + pos - rep1)) {
                int64_t ml2 = 4 + count_match(src, pos + 4, pos + 4 - rep1, end);
                int64_t t = rep0; rep0 = rep1; rep1 = t;
                table[hash32(read32(src + pos), hlog)] = pos;
                out_ll[n_seq] = 0; out_ml[n_seq] = (uint32_t)ml2; out_ob[n_seq] = 1;
                n_seq++;
                pos += ml2; anchor = pos;
            }
            continue;
        }

        if (cand >= window_start && cand >= pos - (window_size - 1) &&
            read32(src + cand) == cur) {
            int64_t ml = 4 + count_match(src, pos + 4, cand + 4, end);
            while (pos > anchor && cand > window_start &&
                   src[pos - 1] == src[cand - 1]) {
                pos--; cand--; ml++;
            }
            const int64_t offset = pos - cand;
            out_ll[n_seq] = (uint32_t)(pos - anchor);
            out_ml[n_seq] = (uint32_t)ml;
            out_ob[n_seq] = (uint32_t)(offset + 3);
            n_seq++;
            rep1 = rep0; rep0 = offset;
            pos += ml; anchor = pos;
            if (pos + 4 < limit) {
                table[hash32(read32(src + pos - 2), hlog)] = pos - 2;
            }
            while (pos < limit && n_seq < max_seq &&
                   pos - rep1 >= window_start &&
                   read32(src + pos) == read32(src + pos - rep1)) {
                int64_t ml2 = 4 + count_match(src, pos + 4, pos + 4 - rep1, end);
                int64_t t = rep0; rep0 = rep1; rep1 = t;
                table[hash32(read32(src + pos), hlog)] = pos;
                out_ll[n_seq] = 0; out_ml[n_seq] = (uint32_t)ml2; out_ob[n_seq] = 1;
                n_seq++;
                pos += ml2; anchor = pos;
            }
            continue;
        }
        pos += acceleration + ((pos - anchor) >> 6);
    }
    rep_io[0] = (uint32_t)rep0; rep_io[1] = (uint32_t)rep1;
    *out_last_lit = end - anchor;
    return n_seq;
}

// ---------------------------------------------------------------------------
// Hybrid selection: greedy parse over device-provided candidates
// ---------------------------------------------------------------------------

// cand[i] = best previous position with the same hash for block position i
// (computed on the TPU via the sort-based candidate stage), -1 if none.
// This loop validates, extends, probes repcodes, and emits sequences —
// the serial half of the TPU-first split.
int64_t hybrid_select(const uint8_t* src, int64_t n_valid,
                      const int32_t* cand, uint32_t* rep_io,
                      uint32_t* out_ll, uint32_t* out_ml, uint32_t* out_ob,
                      int64_t max_seq, int64_t* out_last_lit) {
    if (n_valid < 16) { *out_last_lit = n_valid; return 0; }
    const int64_t limit = n_valid - 8;
    int64_t rep0 = rep_io[0], rep1 = rep_io[1];
    int64_t pos = 1, anchor = 0, n_seq = 0;

    while (pos < limit && n_seq + 4 < max_seq) {
        // rep0 probe at pos+1 (guarantees litLength >= 1)
        if (pos + 1 < limit && pos + 1 - rep0 >= 0 &&
            read32(src + pos + 1) == read32(src + pos + 1 - rep0)) {
            int64_t p = pos + 1;
            int64_t ml = 4 + count_match(src, p + 4, p + 4 - rep0, n_valid);
            out_ll[n_seq] = (uint32_t)(p - anchor);
            out_ml[n_seq] = (uint32_t)ml;
            out_ob[n_seq] = 1;
            n_seq++;
            pos = p + ml; anchor = pos;
            goto rep_continuation;
        }
        {
            int64_t c = cand[pos];
            if (c >= 0 && c < pos && read32(src + c) == read32(src + pos)) {
                int64_t ml = 4 + count_match(src, pos + 4, c + 4, n_valid);
                while (pos > anchor && c > 0 && src[pos - 1] == src[c - 1]) {
                    pos--; c--; ml++;
                }
                const int64_t offset = pos - c;
                out_ll[n_seq] = (uint32_t)(pos - anchor);
                out_ml[n_seq] = (uint32_t)ml;
                out_ob[n_seq] = (uint32_t)(offset + 3);
                n_seq++;
                rep1 = rep0; rep0 = offset;
                pos += ml; anchor = pos;
                goto rep_continuation;
            }
        }
        pos += 1 + ((pos - anchor) >> 6);
        continue;

    rep_continuation:
        while (pos < limit && n_seq < max_seq && pos - rep1 >= 0 &&
               read32(src + pos) == read32(src + pos - rep1)) {
            int64_t ml2 = 4 + count_match(src, pos + 4, pos + 4 - rep1, n_valid);
            int64_t t = rep0; rep0 = rep1; rep1 = t;
            out_ll[n_seq] = 0; out_ml[n_seq] = (uint32_t)ml2; out_ob[n_seq] = 1;
            n_seq++;
            pos += ml2; anchor = pos;
        }
    }
    rep_io[0] = (uint32_t)rep0; rep_io[1] = (uint32_t)rep1;
    *out_last_lit = n_valid - anchor;
    return n_seq;
}

// ---------------------------------------------------------------------------
// Hash-chain lazy match finder (greedy/lazy/lazy2; ZstdLazy.cs:1743 role)
// ---------------------------------------------------------------------------

struct LazyCtx {
    const uint8_t* src;
    int64_t* table;       // hash heads (abs positions, -1 empty)
    int64_t* chain;       // chain links indexed by pos & chain_mask
    int64_t chain_mask;
    int hlog;
    int64_t window_start;
    int64_t window_size;
    int64_t attempts;
    int64_t insert_from;
    int64_t limit;
};

static inline void lazy_insert_upto(LazyCtx* c, int64_t p) {
    int64_t stop = p < c->limit ? p : c->limit;
    for (int64_t i = c->insert_from; i < stop; i++) {
        const uint32_t hv = hash32(read32(c->src + i), c->hlog);
        c->chain[i & c->chain_mask] = c->table[hv];
        c->table[hv] = i;
    }
    if (stop > c->insert_from) c->insert_from = stop;
}

static inline int64_t lazy_search(LazyCtx* c, int64_t p, int64_t end,
                                  int64_t* best_off) {
    lazy_insert_upto(c, p);
    const uint32_t cur = read32(c->src + p);
    int64_t cand = c->table[hash32(cur, c->hlog)];
    const int64_t low = (p - (c->window_size - 1)) > c->window_start
                        ? p - (c->window_size - 1) : c->window_start;
    int64_t best_len = 0; *best_off = 0;
    for (int64_t a = 0; a < c->attempts; a++) {
        if (cand < low) break;
        if (read32(c->src + cand) == cur) {
            int64_t len = 4 + count_match(c->src, p + 4, cand + 4, end);
            if (len > best_len) { best_len = len; *best_off = p - cand; }
        }
        int64_t nxt = c->chain[cand & c->chain_mask];
        if (nxt >= cand) break;
        cand = nxt;
    }
    return best_len;
}

static inline int64_t rep_length(const uint8_t* src, int64_t p, int64_t r,
                                 int64_t ws, int64_t end) {
    if (r <= 0 || p - r < ws || p + 4 > end) return 0;
    if (read32(src + p) != read32(src + p - r)) return 0;
    return 4 + count_match(src, p + 4, p + 4 - r, end);
}

// depth: 0 = greedy, 1 = lazy, 2 = lazy2.  insert_from_io persists across
// blocks.  Returns nb_seq or -1.
int64_t lazy_find_matches(const uint8_t* src, int64_t src_len,
                          int64_t start, int64_t end, int64_t window_start,
                          int64_t window_size,
                          int64_t* table, int hlog,
                          int64_t* chain, int64_t chain_size, int64_t attempts,
                          int depth, int64_t* insert_from_io,
                          uint32_t* rep_io,
                          uint32_t* out_ll, uint32_t* out_ml, uint32_t* out_ob,
                          int64_t max_seq, int64_t* out_last_lit) {
    if (end - start < 16) { *out_last_lit = end - start; return 0; }
    LazyCtx c{src, table, chain, chain_size - 1, hlog, window_start,
              window_size, attempts, *insert_from_io, end - 8};
    int64_t rep0 = rep_io[0], rep1 = rep_io[1];
    int64_t pos = start + (window_start == 0 && start == 0 ? 1 : 0);
    int64_t anchor = start;
    int64_t n_seq = 0;
    const int64_t limit = c.limit;

    while (pos < limit && n_seq + 2 < max_seq) {
        // rep0 probe requires litLength >= 1 (offset_value 1 with ll==0
        // means rep1 to the decoder).
        int64_t rl = (pos > anchor) ? rep_length(src, pos, rep0, window_start, end) : 0;
        int64_t off;
        int64_t ml = lazy_search(&c, pos, end, &off);
        if (rl >= 4 && rl + 3 >= ml) { ml = rl; off = 0; }
        if (ml < 4) {
            pos += 1 + ((pos - anchor) >> 8);
            continue;
        }
        for (int d = depth; d > 0 && pos + 1 < limit; d--) {
            int64_t rl2 = rep_length(src, pos + 1, rep0, window_start, end);
            int64_t off2;
            int64_t ml2 = lazy_search(&c, pos + 1, end, &off2);
            bool better = false;
            if (rl2 >= 4 && rl2 + 3 > ml + (off == 0 ? 3 : 0) - 3) {
                pos++; ml = rl2; off = 0; better = true;
            } else if (ml2 >= 4 && ml2 > ml + (off2 != off ? 1 : 0)) {
                pos++; ml = ml2; off = off2; better = true;
            }
            if (!better) break;
        }
        if (off > 0) {
            int64_t cand = pos - off;
            while (pos > anchor && cand > window_start &&
                   src[pos - 1] == src[cand - 1]) {
                pos--; cand--; ml++;
            }
            rep1 = rep0; rep0 = off;
            out_ob[n_seq] = (uint32_t)(off + 3);
        } else {
            out_ob[n_seq] = 1;
        }
        out_ll[n_seq] = (uint32_t)(pos - anchor);
        out_ml[n_seq] = (uint32_t)ml;
        n_seq++;
        pos += ml; anchor = pos;
        lazy_insert_upto(&c, pos);
        while (pos < limit && n_seq < max_seq) {
            int64_t rl2 = rep_length(src, pos, rep1, window_start, end);
            if (rl2 < 4) break;
            int64_t t = rep0; rep0 = rep1; rep1 = t;
            out_ll[n_seq] = 0; out_ml[n_seq] = (uint32_t)rl2; out_ob[n_seq] = 1;
            n_seq++;
            pos += rl2; anchor = pos;
            lazy_insert_upto(&c, pos);
        }
    }
    *insert_from_io = c.insert_from;
    rep_io[0] = (uint32_t)rep0; rep_io[1] = (uint32_t)rep1;
    *out_last_lit = end - anchor;
    return n_seq;
}

// ---------------------------------------------------------------------------
// Bitstream writer + FSE sequence encode
// ---------------------------------------------------------------------------

struct BitWriterC {
    uint8_t* out;
    int64_t  cap;
    int64_t  nbytes;
    uint64_t acc;
    int      nbits;
};

static inline int bw_add(BitWriterC* w, uint64_t v, int n) {
    w->acc |= (v & ((n >= 64) ? ~0ULL : ((1ULL << n) - 1))) << w->nbits;
    w->nbits += n;
    while (w->nbits >= 8) {
        if (w->nbytes >= w->cap) return -1;
        w->out[w->nbytes++] = (uint8_t)(w->acc & 0xFF);
        w->acc >>= 8;
        w->nbits -= 8;
    }
    return 0;
}

static inline int64_t bw_close(BitWriterC* w) {
    if (bw_add(w, 1, 1)) return -1;
    if (w->nbits) {
        if (w->nbytes >= w->cap) return -1;
        w->out[w->nbytes++] = (uint8_t)(w->acc & ((1u << w->nbits) - 1));
        w->acc = 0; w->nbits = 0;
    }
    return w->nbytes;
}

struct FseEnc {
    const uint16_t* state_table;
    const uint32_t* delta_nb;
    const int32_t*  delta_fs;
    uint32_t value;
    int table_log;
};

static inline void fse_init(FseEnc* e, uint32_t sym) {
    uint32_t nb = (e->delta_nb[sym] + (1u << 15)) >> 16;
    uint32_t v = (nb << 16) - e->delta_nb[sym];
    e->value = e->state_table[(v >> nb) + e->delta_fs[sym]];
}

static inline int fse_enc(FseEnc* e, BitWriterC* w, uint32_t sym) {
    uint32_t nb = (e->value + e->delta_nb[sym]) >> 16;
    if (bw_add(w, e->value, (int)nb)) return -1;
    e->value = e->state_table[(e->value >> nb) + e->delta_fs[sym]];
    return 0;
}

// Encode the interleaved sequence bitstream.  ll/mlv are raw values
// (litLength, matchLength-3), ob = offBase.  Code arrays + extra-bit width
// tables supplied by caller.  Returns payload size or -1.
int64_t encode_sequences(
    const uint32_t* ll, const uint32_t* mlv, const uint32_t* ob,
    const uint8_t* llc, const uint8_t* mlc, const uint8_t* ofc,
    const uint8_t* ll_bits_tab, const uint8_t* ml_bits_tab,
    int64_t nb_seq,
    const uint16_t* ll_st, const uint32_t* ll_dnb, const int32_t* ll_dfs, int ll_log,
    const uint16_t* of_st, const uint32_t* of_dnb, const int32_t* of_dfs, int of_log,
    const uint16_t* ml_st, const uint32_t* ml_dnb, const int32_t* ml_dfs, int ml_log,
    uint8_t* out, int64_t out_cap) {

    BitWriterC w{out, out_cap, 0, 0, 0};
    FseEnc e_ll{ll_st, ll_dnb, ll_dfs, 0, ll_log};
    FseEnc e_of{of_st, of_dnb, of_dfs, 0, of_log};
    FseEnc e_ml{ml_st, ml_dnb, ml_dfs, 0, ml_log};

    const int64_t n = nb_seq;
    fse_init(&e_ml, mlc[n - 1]);
    fse_init(&e_of, ofc[n - 1]);
    fse_init(&e_ll, llc[n - 1]);
    if (bw_add(&w, ll[n - 1], ll_bits_tab[llc[n - 1]])) return -1;
    if (bw_add(&w, mlv[n - 1], ml_bits_tab[mlc[n - 1]])) return -1;
    if (bw_add(&w, ob[n - 1], ofc[n - 1])) return -1;

    for (int64_t i = n - 2; i >= 0; i--) {
        if (fse_enc(&e_of, &w, ofc[i])) return -1;
        if (fse_enc(&e_ml, &w, mlc[i])) return -1;
        if (fse_enc(&e_ll, &w, llc[i])) return -1;
        if (bw_add(&w, ll[i], ll_bits_tab[llc[i]])) return -1;
        if (bw_add(&w, mlv[i], ml_bits_tab[mlc[i]])) return -1;
        if (bw_add(&w, ob[i], ofc[i])) return -1;
    }
    if (bw_add(&w, e_ml.value, ml_log)) return -1;
    if (bw_add(&w, e_of.value, of_log)) return -1;
    if (bw_add(&w, e_ll.value, ll_log)) return -1;
    return bw_close(&w);
}

// Huffman 1X encode: symbols back-to-front through the bit writer.
int64_t huf_encode_stream(const uint8_t* symbols, int64_t n,
                          const uint16_t* code, const uint8_t* nbits,
                          uint8_t* out, int64_t out_cap) {
    BitWriterC w{out, out_cap, 0, 0, 0};
    for (int64_t i = n - 1; i >= 0; i--) {
        const uint8_t s = symbols[i];
        if (bw_add(&w, code[s], nbits[s])) return -1;
    }
    return bw_close(&w);
}

// XXH64 (frame checksums; used when the Python xxhash module is absent).
uint64_t xxh64(const uint8_t* p, int64_t len, uint64_t seed) {
    const uint64_t P1 = 0x9E3779B185EBCA87ULL, P2 = 0xC2B2AE3D27D4EB4FULL,
                   P3 = 0x165667B19E3779F9ULL, P4 = 0x85EBCA77C2B2AE63ULL,
                   P5 = 0x27D4EB2F165667C5ULL;
    const uint8_t* end = p + len;
    uint64_t h;
    auto rotl = [](uint64_t x, int r) { return (x << r) | (x >> (64 - r)); };
    auto round = [&](uint64_t acc, uint64_t inp) {
        acc += inp * P2; acc = rotl(acc, 31); return acc * P1;
    };
    if (len >= 32) {
        uint64_t v1 = seed + P1 + P2, v2 = seed + P2, v3 = seed, v4 = seed - P1;
        do {
            v1 = round(v1, read_window(p)); p += 8;
            v2 = round(v2, read_window(p)); p += 8;
            v3 = round(v3, read_window(p)); p += 8;
            v4 = round(v4, read_window(p)); p += 8;
        } while (p + 32 <= end);
        h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18);
        h = (h ^ round(0, v1)) * P1 + P4;
        h = (h ^ round(0, v2)) * P1 + P4;
        h = (h ^ round(0, v3)) * P1 + P4;
        h = (h ^ round(0, v4)) * P1 + P4;
    } else {
        h = seed + P5;
    }
    h += (uint64_t)len;
    while (p + 8 <= end) {
        h ^= round(0, read_window(p));
        h = rotl(h, 27) * P1 + P4;
        p += 8;
    }
    if (p + 4 <= end) {
        uint32_t v; std::memcpy(&v, p, 4);
        h ^= (uint64_t)v * P1;
        h = rotl(h, 23) * P2 + P3;
        p += 4;
    }
    while (p < end) {
        h ^= (*p) * P5;
        h = rotl(h, 11) * P1;
        p++;
    }
    h ^= h >> 33; h *= P2; h ^= h >> 29; h *= P3; h ^= h >> 32;
    return h;
}

}  // extern "C"
