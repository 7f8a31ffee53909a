"""Black-box fit of libzstd 1.5.7's block pre-splitter (zstd_preSplit.c role).

We cannot read libzstd's source in this image (binary wheel only), so we
reconstruct its block-split decision function by observation: compress
crafted corpora with the oracle, parse the frames to recover the input-side
block boundaries, and fit a parameterized model of the two splitter variants
until the predicted boundaries match exactly.

Model structure (validated against observation):
  - fromBorders: for the fast strategy. Compares 512-byte byte-histograms of
    the head and tail of each 128K window; if they differ, picks a split at
    32K/64K/96K using a middle segment.
  - byChunks: for higher strategies. Scans 8K chunks, accumulating a
    2-byte-hash event histogram; splits where the new chunk's fingerprint
    deviates from the accumulated past beyond a threshold that tightens
    (penalty decays) with each accepted chunk.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import zstandard as zstd

KB = 1024
BLOCK = 128 * KB
CHUNK = 8 * KB
KNUTH = 0x9E3779B9


def oracle_block_sizes(data: bytes, level: int) -> list[int]:
    """Input-side block sizes chosen by libzstd at `level`."""
    frame = zstd.ZstdCompressor(level=level).compress(data)
    fhd = frame[4]
    pos = 5
    dcs_code = fhd >> 6
    single = (fhd >> 5) & 1
    if not single:
        pos += 1
    pos += [0, 2, 4, 8][dcs_code] if (dcs_code or single) else 0
    dobj = zstd.ZstdDecompressor().decompressobj()
    dobj.decompress(frame[:pos])
    sizes = []
    while pos < len(frame):
        hdr = int.from_bytes(frame[pos:pos + 3], "little")
        last, btype, bsize = hdr & 1, (hdr >> 1) & 3, hdr >> 3
        csize = 1 if btype == 1 else bsize
        sizes.append(len(dobj.decompress(frame[pos:pos + 3 + csize])))
        pos += 3 + csize
        if last:
            break
    return sizes


# ---------------------------------------------------------------- model ----

def hash2_events(seg: np.ndarray, rate: int, hash_log: int) -> tuple[np.ndarray, int]:
    """Event histogram of a chunk: 2-byte hash (or raw byte at hashLog 8),
    sampled every `rate` positions.  Returns (histogram, nbEvents)."""
    limit = len(seg) - 2 + 1
    idx = np.arange(0, limit, rate)
    if hash_log == 8:
        ev = seg[idx].astype(np.uint32)
    else:
        v16 = seg[idx].astype(np.uint32) | (seg[idx + 1].astype(np.uint32) << 8)
        ev = (v16 * np.uint32(KNUTH)) >> np.uint32(32 - hash_log)
    hist = np.bincount(ev, minlength=1 << hash_log).astype(np.int64)
    return hist, limit // rate


def fp_distance(h1, n1, h2, n2) -> int:
    return int(np.abs(h1.astype(object) * n2 - h2.astype(object) * n1).sum())


def compare_fp(h_ref, n_ref, h_new, n_new, penalty, base, rate_denom) -> bool:
    p50 = n_ref * n_new
    deviation = fp_distance(h_ref, n_ref, h_new, n_new)
    threshold = p50 * (base + penalty) // rate_denom
    return deviation >= threshold


def split_by_chunks(block: np.ndarray, rate: int, hash_log: int,
                    base: int, rate_denom: int, penalty0: int) -> int:
    """First split point within a 128K window, or len(block)."""
    h_past, n_past = hash2_events(block[:CHUNK], rate, hash_log)
    penalty = penalty0
    pos = CHUNK
    while pos <= len(block) - CHUNK:
        h_new, n_new = hash2_events(block[pos:pos + CHUNK], rate, hash_log)
        if compare_fp(h_past, n_past, h_new, n_new, penalty, base, rate_denom):
            return pos
        h_past = h_past + h_new
        n_past += n_new
        if penalty > 0:
            penalty -= 1
        pos += CHUNK
    return len(block)


def split_from_borders(block: np.ndarray, seg_size: int, base: int,
                       rate_denom: int, middle_div: int) -> int:
    """fromBorders variant: byte histograms of head/tail/middle 512B segments."""
    h_head = np.bincount(block[:seg_size], minlength=256).astype(np.int64)
    h_tail = np.bincount(block[-seg_size:], minlength=256).astype(np.int64)
    if not compare_fp(h_head, seg_size, h_tail, seg_size, 0, base, rate_denom):
        return len(block)
    mid0 = len(block) // 2 - seg_size // 2
    h_mid = np.bincount(block[mid0:mid0 + seg_size], minlength=256).astype(np.int64)
    d_begin = fp_distance(h_head, seg_size, h_mid, seg_size)
    d_end = fp_distance(h_tail, seg_size, h_mid, seg_size)
    min_distance = seg_size * seg_size // middle_div
    if abs(d_begin - d_end) < min_distance:
        return 64 * KB
    return 32 * KB if d_begin > d_end else 96 * KB


def model_block_sizes(data: bytes, variant: str, params: dict) -> list[int]:
    """Predicted input-side block sizes over the whole input."""
    arr = np.frombuffer(data, np.uint8)
    sizes = []
    pos = 0
    while pos < len(arr):
        remaining = len(arr) - pos
        if remaining < BLOCK:
            sizes.append(remaining)
            break
        window = arr[pos:pos + BLOCK]
        if variant == "borders":
            s = split_from_borders(window, params.get("seg", 512),
                                   params["base"], params["denom"],
                                   params.get("middle_div", 3))
        else:
            s = split_by_chunks(window, params["rate"], params["hash_log"],
                                params["base"], params["denom"],
                                params["penalty0"])
        sizes.append(s)
        pos += s
    return sizes


# --------------------------------------------------------------- corpora ----

def make_segments(seed: int, n_bytes: int) -> bytes:
    r = np.random.default_rng(seed)
    parts = []
    words = [b"the", b"of", b"and", b"entropy", b"market", b"quantum", b"m",
             b"probability", b"wonderful", b"alpha", b"beta;", b"{}", b"[1]"]
    while sum(map(len, parts)) < n_bytes:
        kind = int(r.integers(0, 6))
        seg_len = int(r.integers(20_000, 400_000))
        if kind == 0:
            idx = r.choice(len(words), seg_len // 4)
            parts.append(b" ".join(words[i] for i in idx)[:seg_len])
        elif kind == 1:
            recs = [b'{"k":%d,"v":%d}' % (i, i * 13 % 71) for i in range(seg_len // 16)]
            parts.append(b",".join(recs)[:seg_len])
        elif kind == 2:
            parts.append((np.arange(seg_len) % int(r.integers(3, 253))).astype(np.uint8).tobytes())
        elif kind == 3:
            parts.append(bytes([int(r.integers(0, 256))]) * seg_len)
        elif kind == 4:
            parts.append(r.integers(0, 256, seg_len, dtype=np.uint8).tobytes())
        else:
            base = r.integers(0, 200)
            parts.append((r.integers(0, 40, seg_len) + base).astype(np.uint8).tobytes())
    return b"".join(parts)[:n_bytes]


def fit(variant: str, oracle_level: int, param_grid: list[dict], seeds=range(6),
        n_bytes=2 << 20) -> None:
    corpora = [make_segments(s, n_bytes) for s in seeds]
    oracle = [oracle_block_sizes(c, oracle_level) for c in corpora]
    best = None
    for params in param_grid:
        good = 0
        total = 0
        for c, ob in zip(corpora, oracle):
            mb = model_block_sizes(c, variant, params)
            total += 1
            if mb == ob:
                good += 1
        if best is None or good > best[0]:
            best = (good, total, params)
        tag = "EXACT" if good == total else f"{good}/{total}"
        print(f"  {params} -> {tag}")
    print(f"best: {best}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "borders"
    if which == "borders":
        grid = [dict(base=b, denom=d, middle_div=m)
                for b in (8, 10, 12, 14, 16, 20, 24)
                for d in (16, 10, 8)
                for m in (3, 4, 2)]
        fit("borders", 1, grid)
    else:
        lvl = int(sys.argv[2])
        rate = int(sys.argv[3])
        hl = int(sys.argv[4])
        grid = [dict(rate=rate, hash_log=hl, base=b, denom=d, penalty0=p)
                for b in (8, 10, 12, 14, 16, 20)
                for d in (16, 10, 8)
                for p in (3, 2, 4)]
        fit("chunks", lvl, grid)
