"""Zstandard (RFC 8878) format constants.

These tables are mandated by the zstd frame format and MUST match the
reference bit-for-bit (reference: /root/reference/src/ZstdSharp/Unsafe/
ZstdInternal.cs, ZstdDecompressInternal.cs, Clevels.cs — see SURVEY.md §2.3:
"constants module (copied exactly)").  Values are cross-checked against
RFC 8878 §3.1.1.3.2 (sequence codes) and §4 (default FSE distributions).
"""

from __future__ import annotations

import enum

import numpy as np

# ---------------------------------------------------------------------------
# Frame-level constants (RFC 8878 §3.1.1)
# ---------------------------------------------------------------------------

ZSTD_MAGICNUMBER = 0xFD2FB528
ZSTD_MAGIC_DICTIONARY = 0xEC30A437
ZSTD_MAGIC_SKIPPABLE_START = 0x184D2A50
ZSTD_MAGIC_SKIPPABLE_MASK = 0xFFFFFFF0

ZSTD_FRAMEHEADERSIZE_PREFIX = 5  # minimum bytes needed to probe header size
ZSTD_FRAMEHEADERSIZE_MIN = 6
ZSTD_FRAMEHEADERSIZE_MAX = 18
ZSTD_SKIPPABLEHEADERSIZE = 8

ZSTD_BLOCKSIZELOG_MAX = 17
ZSTD_BLOCKSIZE_MAX = 1 << ZSTD_BLOCKSIZELOG_MAX  # 128 KiB
ZSTD_BLOCKHEADERSIZE = 3

ZSTD_WINDOWLOG_MAX_32 = 30
ZSTD_WINDOWLOG_MAX_64 = 31
ZSTD_WINDOWLOG_MAX = ZSTD_WINDOWLOG_MAX_64
ZSTD_WINDOWLOG_MIN = 10
ZSTD_WINDOWLOG_LIMIT_DEFAULT = 27
ZSTD_WINDOWLOG_ABSOLUTEMIN = 10
ZSTD_HASHLOG_MAX = 30
ZSTD_HASHLOG_MIN = 6
ZSTD_CHAINLOG_MAX = 30
ZSTD_CHAINLOG_MIN = 6
ZSTD_SEARCHLOG_MAX = ZSTD_WINDOWLOG_MAX - 1
ZSTD_SEARCHLOG_MIN = 1
ZSTD_MINMATCH_MAX = 7
ZSTD_MINMATCH_MIN = 3
ZSTD_TARGETLENGTH_MAX = ZSTD_BLOCKSIZE_MAX
ZSTD_TARGETLENGTH_MIN = 0

ZSTD_CONTENTSIZE_UNKNOWN = -1
ZSTD_CONTENTSIZE_ERROR = -2

# Frame-content-size / dict-id field sizes, indexed by the 2-bit descriptor
# fields of the frame-header byte (ZstdInternal.cs:20-34).
ZSTD_FCS_FIELD_SIZE = (0, 2, 4, 8)
ZSTD_DID_FIELD_SIZE = (0, 1, 2, 4)

WILDCOPY_OVERLENGTH = 32
MINMATCH = 3
ZSTD_OPT_NUM = 1 << 12

# Repcode start values (ZstdInternal.cs:13-18; RFC 8878 §3.1.1.5)
REP_START_VALUE = (1, 4, 8)
ZSTD_REP_NUM = 3

# ---------------------------------------------------------------------------
# Block types (RFC 8878 §3.1.1.2)
# ---------------------------------------------------------------------------


class BlockType(enum.IntEnum):
    RAW = 0
    RLE = 1
    COMPRESSED = 2
    RESERVED = 3


class LiteralsBlockType(enum.IntEnum):
    RAW = 0
    RLE = 1
    COMPRESSED = 2
    REPEAT = 3  # reuse previous Huffman table


class SymbolEncodingType(enum.IntEnum):
    """Sequence-section symbol compression modes (RFC 8878 §3.1.1.3.2.1)."""

    PREDEFINED = 0  # set_basic
    RLE = 1
    FSE = 2  # set_compressed
    REPEAT = 3


# ---------------------------------------------------------------------------
# Sequence code tables (RFC 8878 §3.1.1.3.2.1.1)
# Extracted from ZstdInternal.cs:37-… / ZstdDecompressInternal.cs:9-…
# ---------------------------------------------------------------------------

MAX_LL = 35  # max literal-length code
MAX_ML = 52  # max match-length code
MAX_OFF = 31  # max offset code
DEFAULT_MAX_OFF = 28  # offset-code bound for the predefined distribution

LL_BITS = np.array(
    [0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16],
    dtype=np.uint32,
)
LL_BASE = np.array(
    list(range(16))
    + [16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 0x80, 0x100, 0x200, 0x400, 0x800,
       0x1000, 0x2000, 0x4000, 0x8000, 0x10000],
    dtype=np.uint32,
)
LL_DEFAULT_NORM = np.array(
    [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2, 2, 2,
     2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1],
    dtype=np.int16,
)
LL_DEFAULT_NORM_LOG = 6

ML_BITS = np.array(
    [0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16],
    dtype=np.uint32,
)
ML_BASE = np.array(
    list(range(3, 35))
    + [35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027, 2051,
       4099, 8195, 16387, 32771, 65539],
    dtype=np.uint32,
)
ML_DEFAULT_NORM = np.array(
    [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1,
     -1, -1, -1, -1, -1],
    dtype=np.int16,
)
ML_DEFAULT_NORM_LOG = 6

OF_BITS = np.arange(32, dtype=np.uint32)
OF_BASE = np.array([0, 1] + [(1 << n) - 3 for n in range(2, 32)], dtype=np.uint32)
OF_DEFAULT_NORM = np.array(
    [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     -1, -1, -1, -1, -1],
    dtype=np.int16,
)
OF_DEFAULT_NORM_LOG = 5

LL_FSE_LOG = 9  # LLFSELog: max accuracy log for literal-length table
ML_FSE_LOG = 9
OF_FSE_LOG = 8

MAX_FSE_LOG = 12  # FSE_MAX_TABLELOG as used by zstd sequences
MIN_FSE_LOG = 5
FSE_DEFAULT_TABLELOG = 11
FSE_MAX_SYMBOL_VALUE = 255
FSE_MIN_TABLELOG = 5
FSE_MAX_TABLELOG = 15  # library-level tANS limit
FSE_TABLELOG_ABSOLUTE_MAX = 15
FSE_NCOUNTBOUND = 512

HUF_TABLELOG_MAX = 12
HUF_TABLELOG_DEFAULT = 11
HUF_TABLELOG_ABSOLUTEMAX = 12
HUF_SYMBOLVALUE_MAX = 255
HUF_BLOCKSIZE_MAX = 128 * 1024

# Sanity checks against the reference-extracted values.
assert LL_BASE[-1] == 65536 and len(LL_BASE) == 36
assert ML_BASE[-1] == 65539 and len(ML_BASE) == 53
assert list(OF_BASE[:8]) == [0, 1, 1, 5, 13, 29, 61, 125]
assert int(LL_DEFAULT_NORM.sum()) == (1 << LL_DEFAULT_NORM_LOG) - 2 * 4
assert int(ML_DEFAULT_NORM.sum()) == (1 << ML_DEFAULT_NORM_LOG) - 2 * 7
assert int(OF_DEFAULT_NORM.sum()) == (1 << OF_DEFAULT_NORM_LOG) - 2 * 5


# ---------------------------------------------------------------------------
# Compression strategies & per-level parameters (Clevels.cs:8)
# ---------------------------------------------------------------------------


class Strategy(enum.IntEnum):
    """Match-finder strategies, ordered from fastest to strongest."""

    FAST = 1
    DFAST = 2
    GREEDY = 3
    LAZY = 4
    LAZY2 = 5
    BTLAZY2 = 6
    BTOPT = 7
    BTULTRA = 8
    BTULTRA2 = 9


ZSTD_MAX_CLEVEL = 22
ZSTD_MIN_CLEVEL = -(1 << 17)
ZSTD_DEFAULT_CLEVEL = 3
ZSTD_LAZY_DDSS_BUCKET_LOG = 2

# (windowLog, chainLog, hashLog, searchLog, minMatch, targetLength, strategy)
# 4 source-size classes x levels 0..22 — ZSTD_defaultCParameters (Clevels.cs:8).
_S = Strategy
_CPARAMS_GE_256KB = [
    (19, 12, 13, 1, 6, 1, _S.FAST), (19, 13, 14, 1, 7, 0, _S.FAST),
    (20, 15, 16, 1, 6, 0, _S.FAST), (21, 16, 17, 1, 5, 0, _S.DFAST),
    (21, 18, 18, 1, 5, 0, _S.DFAST), (21, 18, 19, 3, 5, 2, _S.GREEDY),
    (21, 18, 19, 3, 5, 4, _S.LAZY), (21, 19, 20, 4, 5, 8, _S.LAZY),
    (21, 19, 20, 4, 5, 16, _S.LAZY2), (22, 20, 21, 4, 5, 16, _S.LAZY2),
    (22, 21, 22, 5, 5, 16, _S.LAZY2), (22, 21, 22, 6, 5, 16, _S.LAZY2),
    (22, 22, 23, 6, 5, 32, _S.LAZY2), (22, 22, 22, 4, 5, 32, _S.BTLAZY2),
    (22, 22, 23, 5, 5, 32, _S.BTLAZY2), (22, 23, 23, 6, 5, 32, _S.BTLAZY2),
    (22, 22, 22, 5, 5, 48, _S.BTOPT), (23, 23, 22, 5, 4, 64, _S.BTOPT),
    (23, 23, 22, 6, 3, 64, _S.BTULTRA), (23, 24, 22, 7, 3, 256, _S.BTULTRA2),
    (25, 25, 23, 7, 3, 256, _S.BTULTRA2), (26, 26, 24, 7, 3, 512, _S.BTULTRA2),
    (27, 27, 25, 9, 3, 999, _S.BTULTRA2),
]
_CPARAMS_LE_256KB = [
    (18, 12, 13, 1, 5, 1, _S.FAST), (18, 13, 14, 1, 6, 0, _S.FAST),
    (18, 14, 14, 1, 5, 0, _S.DFAST), (18, 16, 16, 1, 4, 0, _S.DFAST),
    (18, 16, 17, 3, 5, 2, _S.GREEDY), (18, 17, 18, 5, 5, 2, _S.GREEDY),
    (18, 18, 19, 3, 5, 4, _S.LAZY), (18, 18, 19, 4, 4, 4, _S.LAZY),
    (18, 18, 19, 4, 4, 8, _S.LAZY2), (18, 18, 19, 5, 4, 8, _S.LAZY2),
    (18, 18, 19, 6, 4, 8, _S.LAZY2), (18, 18, 19, 5, 4, 12, _S.BTLAZY2),
    (18, 19, 19, 7, 4, 12, _S.BTLAZY2), (18, 18, 19, 4, 4, 16, _S.BTOPT),
    (18, 18, 19, 4, 3, 32, _S.BTOPT), (18, 18, 19, 6, 3, 128, _S.BTOPT),
    (18, 19, 19, 6, 3, 128, _S.BTULTRA), (18, 19, 19, 8, 3, 256, _S.BTULTRA),
    (18, 19, 19, 6, 3, 128, _S.BTULTRA2), (18, 19, 19, 8, 3, 256, _S.BTULTRA2),
    (18, 19, 19, 10, 3, 512, _S.BTULTRA2), (18, 19, 19, 12, 3, 512, _S.BTULTRA2),
    (18, 19, 19, 13, 3, 999, _S.BTULTRA2),
]
_CPARAMS_LE_128KB = [
    (17, 12, 12, 1, 5, 1, _S.FAST), (17, 12, 13, 1, 6, 0, _S.FAST),
    (17, 13, 15, 1, 5, 0, _S.FAST), (17, 15, 16, 2, 5, 0, _S.DFAST),
    (17, 17, 17, 2, 4, 0, _S.DFAST), (17, 16, 17, 3, 4, 2, _S.GREEDY),
    (17, 16, 17, 3, 4, 4, _S.LAZY), (17, 16, 17, 3, 4, 8, _S.LAZY2),
    (17, 16, 17, 4, 4, 8, _S.LAZY2), (17, 16, 17, 5, 4, 8, _S.LAZY2),
    (17, 16, 17, 6, 4, 8, _S.LAZY2), (17, 17, 17, 5, 4, 8, _S.BTLAZY2),
    (17, 18, 17, 7, 4, 12, _S.BTLAZY2), (17, 18, 17, 3, 4, 12, _S.BTOPT),
    (17, 18, 17, 4, 3, 32, _S.BTOPT), (17, 18, 17, 6, 3, 256, _S.BTOPT),
    (17, 18, 17, 6, 3, 128, _S.BTULTRA), (17, 18, 17, 8, 3, 256, _S.BTULTRA),
    (17, 18, 17, 10, 3, 512, _S.BTULTRA), (17, 18, 17, 5, 3, 256, _S.BTULTRA2),
    (17, 18, 17, 7, 3, 512, _S.BTULTRA2), (17, 18, 17, 9, 3, 512, _S.BTULTRA2),
    (17, 18, 17, 11, 3, 999, _S.BTULTRA2),
]
_CPARAMS_LE_16KB = [
    (14, 12, 13, 1, 5, 1, _S.FAST), (14, 14, 15, 1, 5, 0, _S.FAST),
    (14, 14, 15, 1, 4, 0, _S.FAST), (14, 14, 15, 2, 4, 0, _S.DFAST),
    (14, 14, 14, 4, 4, 2, _S.GREEDY), (14, 14, 14, 3, 4, 4, _S.LAZY),
    (14, 14, 14, 4, 4, 8, _S.LAZY2), (14, 14, 14, 6, 4, 8, _S.LAZY2),
    (14, 14, 14, 8, 4, 8, _S.LAZY2), (14, 15, 14, 5, 4, 8, _S.BTLAZY2),
    (14, 15, 14, 9, 4, 8, _S.BTLAZY2), (14, 15, 14, 3, 4, 12, _S.BTOPT),
    (14, 15, 14, 4, 3, 24, _S.BTOPT), (14, 15, 14, 5, 3, 32, _S.BTULTRA),
    (14, 15, 15, 6, 3, 64, _S.BTULTRA), (14, 15, 15, 7, 3, 256, _S.BTULTRA),
    (14, 15, 15, 5, 3, 48, _S.BTULTRA2), (14, 15, 15, 6, 3, 128, _S.BTULTRA2),
    (14, 15, 15, 7, 3, 256, _S.BTULTRA2), (14, 15, 15, 8, 3, 256, _S.BTULTRA2),
    (14, 15, 15, 8, 3, 512, _S.BTULTRA2), (14, 15, 15, 9, 3, 512, _S.BTULTRA2),
    (14, 15, 15, 10, 3, 999, _S.BTULTRA2),
]
ZSTD_DEFAULT_CPARAMETERS = (
    tuple(_CPARAMS_GE_256KB),
    tuple(_CPARAMS_LE_256KB),
    tuple(_CPARAMS_LE_128KB),
    tuple(_CPARAMS_LE_16KB),
)
for _tbl in ZSTD_DEFAULT_CPARAMETERS:
    assert len(_tbl) == 23

# Source-size class boundaries used to pick the row above
# (ZSTD_getCParams_internal, ZstdCompress.cs:7891).
ZSTD_SRCSIZEHINT_CLASSES = (256 * 1024, 128 * 1024, 16 * 1024)
