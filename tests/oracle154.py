"""Pinned libzstd 1.5.4 oracle (system /usr/lib/.../libzstd.so.1.5.4).

The reference ports zstd v1.5.1 (README.md:5-6).  The live `zstandard`
module bundles 1.5.7, whose doubleFast matcher (rewritten in 1.5.5) and
content-adaptive pre-split (new in 1.5.7) moved outputs at several levels.
libzstd 1.5.4 predates both changes, so it can witness 1.5.1 semantics the
1.5.7 oracle cannot: dfast-strategy byte identity in particular
(ZstdDoubleFast.cs:51).  1.5.1 itself is not obtainable in this image
(zero egress); 1.5.4 is the closest pinnable witness and its fast/dfast
output matches 1.5.1's on everything we can cross-check.
"""

import ctypes
from ctypes import c_char_p, c_int, c_size_t, c_uint, c_void_p

_PATHS = [
    "/usr/lib/x86_64-linux-gnu/libzstd.so.1.5.4",
    "libzstd.so.1",
]

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    for p in _PATHS:
        try:
            L = ctypes.CDLL(p)
        except OSError:
            continue
        L.ZSTD_versionNumber.restype = c_uint
        if L.ZSTD_versionNumber() != 10504:
            continue
        L.ZSTD_compressBound.restype = c_size_t
        L.ZSTD_compressBound.argtypes = [c_size_t]
        L.ZSTD_createCCtx.restype = c_void_p
        L.ZSTD_freeCCtx.argtypes = [c_void_p]
        L.ZSTD_freeCCtx.restype = c_size_t
        L.ZSTD_CCtx_setParameter.argtypes = [c_void_p, c_int, c_int]
        L.ZSTD_CCtx_setParameter.restype = c_size_t
        L.ZSTD_compress2.restype = c_size_t
        L.ZSTD_compress2.argtypes = [c_void_p, c_char_p, c_size_t,
                                     c_char_p, c_size_t]
        L.ZSTD_isError.restype = c_uint
        L.ZSTD_isError.argtypes = [c_size_t]
        _lib = L
        return L
    return None


def available() -> bool:
    return _load() is not None


# ZSTD_cParameter values (zstd.h)
_C_LEVEL = 100
_C_CHECKSUM = 201


def compress154(data: bytes, level: int, checksum: bool = False) -> bytes:
    """One-shot ZSTD_compress2 with libzstd 1.5.4 (content size written)."""
    L = _load()
    assert L is not None
    c = L.ZSTD_createCCtx()
    try:
        L.ZSTD_CCtx_setParameter(c, _C_LEVEL, level)
        if checksum:
            L.ZSTD_CCtx_setParameter(c, _C_CHECKSUM, 1)
        bound = L.ZSTD_compressBound(len(data))
        out = ctypes.create_string_buffer(bound)
        r = L.ZSTD_compress2(c, out, bound, data, len(data))
        assert not L.ZSTD_isError(r), "libzstd 1.5.4 compress failed"
        return out.raw[:r]
    finally:
        L.ZSTD_freeCCtx(c)
