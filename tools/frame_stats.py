"""Sequence-level statistics of a zstd frame: per-block literals/sequence
section sizes, nbSeq, match-length / literal-length / offset distributions,
repcode usage.  Diffs our encoder's parse against libzstd's on the same
input to localize ratio gaps (used for the lazy-tier ELF investigation)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

from zstdsharp_tpu.decode import block as dblock
from zstdsharp_tpu.decode.frame import parse_frame_header
from zstdsharp_tpu.decode.block import EntropyState


def frame_stats(frame: bytes):
    hdr = parse_frame_header(frame)
    pos = hdr.header_size
    ent = EntropyState()
    rep = [1, 4, 8]
    agg = {
        "blocks": 0, "raw_blocks": 0, "rle_blocks": 0,
        "nb_seq": 0, "lit_bytes": 0, "lit_csize": 0, "seq_csize": 0,
        "ll": [], "ml": [], "of": [], "rep_hits": 0, "block_bytes": [],
    }
    while pos < len(frame):
        bh = int.from_bytes(frame[pos:pos + 3], "little")
        last, btype, bsize = bh & 1, (bh >> 1) & 3, bh >> 3
        pos += 3
        agg["blocks"] += 1
        if btype == 0:
            agg["raw_blocks"] += 1
            pos += bsize
        elif btype == 1:
            agg["rle_blocks"] += 1
            pos += 1
        else:
            body = frame[pos:pos + bsize]
            pos += bsize
            lits, consumed = dblock.decode_literals(body, ent)
            agg["lit_bytes"] += len(lits)
            agg["lit_csize"] += consumed
            rest = body[consumed:]
            nb_seq, ll_t, of_t, ml_t, n = dblock.decode_sequence_headers(rest, ent)
            agg["nb_seq"] += nb_seq
            agg["seq_csize"] += len(rest)
            if nb_seq:
                llv, mlv, ofv = dblock.decode_sequences(
                    rest[n:], nb_seq, ll_t, of_t, ml_t, rep)
                agg["ll"].append(llv.astype(np.int64))
                agg["ml"].append(mlv.astype(np.int64))
                agg["of"].append(ofv.astype(np.int64))
        if last:
            break
    for k in ("ll", "ml", "of"):
        agg[k] = (np.concatenate(agg[k]) if agg[k]
                  else np.zeros(0, dtype=np.int64))
    return agg


def summarize(tag, frame):
    a = frame_stats(frame)
    ml, ll, of = a["ml"], a["ll"], a["of"]
    tot_match = int(ml.sum())
    print(f"{tag}: size={len(frame)} blocks={a['blocks']} "
          f"(raw={a['raw_blocks']} rle={a['rle_blocks']}) nbSeq={a['nb_seq']}")
    print(f"  literals: {a['lit_bytes']} raw -> {a['lit_csize']} coded; "
          f"seq section {a['seq_csize']}; match bytes {tot_match}")
    if len(ml):
        print(f"  ml: mean {ml.mean():.2f} p50 {np.median(ml):.0f} "
              f"p90 {np.percentile(ml, 90):.0f} max {ml.max()}")
        print(f"  ll: mean {ll.mean():.2f} p50 {np.median(ll):.0f} "
              f"zero-ll {(ll == 0).mean() * 100:.1f}%")
        print(f"  of: p50 {np.median(of):.0f} p90 {np.percentile(of, 90):.0f} "
              f"small(<=64) {(of <= 64).mean() * 100:.1f}%")
    return a


if __name__ == "__main__":
    import pathlib

    import zstandard as zstd

    from zstdsharp_tpu import compress

    lvl = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    if len(sys.argv) > 2:
        data = pathlib.Path(sys.argv[2]).read_bytes()
    else:
        import numpy as _np
        so = sorted(pathlib.Path(_np.__file__).parent.rglob("*.so"),
                    key=lambda p: -p.stat().st_size)[0]
        data = so.read_bytes()[: 3 << 20]
    ours = compress(data, lvl)
    theirs = zstd.ZstdCompressor(level=lvl).compress(data)
    a = summarize("ours   ", ours)
    b = summarize("libzstd", theirs)
