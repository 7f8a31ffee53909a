"""Per-window diagnostic for the preSplit fit: walk the oracle's own block
boundaries and compare the model's prediction window by window, including the
oracle's cumulative savings (consumed - produced) before each block."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))

import numpy as np
import zstandard as zstd
from fit_presplit import (BLOCK, make_segments, model_block_sizes,
                          split_from_borders, split_by_chunks)


def oracle_blocks_with_csize(data: bytes, level: int):
    """[(input_size, compressed_size_incl_header)] per block."""
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
    out = []
    while pos < len(frame):
        hdr = int.from_bytes(frame[pos:pos + 3], "little")
        last, btype, bsize = hdr & 1, (hdr >> 1) & 3, hdr >> 3
        csize = 1 if btype == 1 else bsize
        isize = len(dobj.decompress(frame[pos:pos + 3 + csize]))
        out.append((isize, 3 + csize))
        pos += 3 + csize
        if last:
            break
    return out


def diag(variant, level, params, seeds=range(6), n_bytes=2 << 20):
    n_match = n_total = 0
    for s in seeds:
        data = make_segments(s, n_bytes)
        arr = np.frombuffer(data, np.uint8)
        blocks = oracle_blocks_with_csize(data, level)
        pos = 0
        savings = 0
        for i, (isize, csize) in enumerate(blocks):
            if len(arr) - pos >= BLOCK:
                window = arr[pos:pos + BLOCK]
                if variant == "borders":
                    pred = split_from_borders(window, params.get("seg", 512),
                                              params["base"], params["denom"],
                                              params.get("middle_div", 3))
                else:
                    pred = split_by_chunks(window, params["rate"],
                                           params["hash_log"], params["base"],
                                           params["denom"], params["penalty0"])
                n_total += 1
                if pred == isize:
                    n_match += 1
                else:
                    print(f"seed {s} block {i} pos {pos} savings {savings}: "
                          f"oracle {isize} model {pred}")
            pos += isize
            savings += isize - csize
    print(f"match {n_match}/{n_total}")


if __name__ == "__main__":
    variant = sys.argv[1]
    level = int(sys.argv[2])
    if variant == "borders":
        params = dict(base=int(sys.argv[3]), denom=int(sys.argv[4]),
                      middle_div=int(sys.argv[5]))
    else:
        params = dict(rate=int(sys.argv[3]), hash_log=int(sys.argv[4]),
                      base=int(sys.argv[5]), denom=int(sys.argv[6]),
                      penalty0=int(sys.argv[7]))
    diag(variant, level, params)
