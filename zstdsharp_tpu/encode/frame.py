"""Frame-level encoding: public compress API.

Reference: ZSTD_writeFrameHeader (ZstdCompress.cs:4817), block loop
ZSTD_compress_frameChunk (:4690), epilogue ZSTD_writeEpilogue (:5598),
bound ZSTD_compressBound.
"""

from __future__ import annotations

import numpy as np

from .. import constants as C
from ..errors import ZstdErrorCode, check
from ..utils.xxhash import content_checksum
from .block import EncoderEntropy, encode_block_body
from .params import CCtxParams, ResolvedParams
from .seqstore import MatchState, compress_block


def compress_bound(src_size: int) -> int:
    """ZSTD_compressBound — worst-case compressed size."""
    margin = ((128 << 10) - src_size) >> 11 if src_size < (128 << 10) else 0
    return src_size + (src_size >> 8) + margin


def _write_frame_header(src_size: int, window_log: int, checksum: bool,
                        content_size_flag: bool, dict_id: int = 0) -> bytes:
    window_size = 1 << window_log
    single_segment = content_size_flag and src_size >= 0 and src_size <= window_size
    if content_size_flag and src_size >= 0:
        fcs_code = (src_size >= 256) + (src_size >= 65536 + 256) + (src_size > 0xFFFFFFFF)
    else:
        fcs_code = 0
    did_code = 0 if dict_id == 0 else (1 if dict_id < 256 else 2 if dict_id < 65536 else 3)
    fhd = (fcs_code << 6) | (int(single_segment) << 5) | (int(checksum) << 2) | did_code
    out = bytearray(C.ZSTD_MAGICNUMBER.to_bytes(4, "little"))
    out.append(fhd)
    if not single_segment:
        out.append((window_log - C.ZSTD_WINDOWLOG_ABSOLUTEMIN) << 3)
    if did_code:
        out += dict_id.to_bytes(C.ZSTD_DID_FIELD_SIZE[did_code], "little")
    if fcs_code == 0:
        if single_segment:
            out.append(src_size)
    elif fcs_code == 1:
        out += (src_size - 256).to_bytes(2, "little")
    elif fcs_code == 2:
        out += src_size.to_bytes(4, "little")
    else:
        out += src_size.to_bytes(8, "little")
    return bytes(out)


def _block_header(last: bool, btype: C.BlockType, size: int) -> bytes:
    return (int(last) | (int(btype) << 1) | (size << 3)).to_bytes(3, "little")


def compress_frame(data: bytes | np.ndarray, params: ResolvedParams,
                   dict_id: int = 0, match_state: MatchState | None = None) -> bytes:
    src = np.frombuffer(bytes(data) if not isinstance(data, np.ndarray) else data,
                        dtype=np.uint8) if not isinstance(data, np.ndarray) else data
    n = len(src)
    cp = params.cparams
    window_log = cp.window_log
    block_size = min(C.ZSTD_BLOCKSIZE_MAX, 1 << window_log)

    out = bytearray(_write_frame_header(
        n, window_log, params.fparams.checksum_flag,
        params.fparams.content_size_flag, dict_id))

    if n == 0:
        out += _block_header(True, C.BlockType.RAW, 0)
        if params.fparams.checksum_flag:
            out += content_checksum(b"").to_bytes(4, "little")
        return bytes(out)

    state = match_state if match_state is not None else MatchState(cp)
    entropy = EncoderEntropy()

    pos = 0
    while pos < n:
        end = min(pos + block_size, n)
        last = end == n
        block = src[pos:end]
        bsize = end - pos

        # RLE block shortcut (ZSTD_isRLE check in compressBlock_internal).
        if bsize > 1 and (block == block[0]).all():
            out += _block_header(last, C.BlockType.RLE, bsize)
            out.append(int(block[0]))
            # Matcher must still see these bytes as history.
            _advance_state_over(state, src, pos, end)
            pos = end
            continue

        seqs = compress_block(src, pos, end, state)
        body = encode_block_body(block, seqs, entropy)
        if body is None:
            out += _block_header(last, C.BlockType.RAW, bsize)
            out += block.tobytes()
        else:
            out += _block_header(last, C.BlockType.COMPRESSED, len(body))
            out += body
        pos = end

    if params.fparams.checksum_flag:
        out += content_checksum(src).to_bytes(4, "little")
    return bytes(out)


def _advance_state_over(state: MatchState, src: np.ndarray, start: int, end: int) -> None:
    """Account for bytes emitted outside the matcher (RLE blocks) so later
    blocks can still match into them (window continuity)."""
    if hasattr(state, "_next_to_insert"):
        state._next_to_insert = end


def compress(data: bytes, level: int = 3, checksum: bool = False,
             params: CCtxParams | None = None) -> bytes:
    """One-shot compression producing a single zstd frame
    (Compressor.Wrap / ZSTD_compress2 equivalent)."""
    if params is None:
        params = CCtxParams(compression_level=level, checksum_flag=checksum)
    resolved = params.resolve(src_size_hint=len(data))
    return compress_frame(data, resolved)


def write_skippable_frame(content: bytes, magic_variant: int = 0) -> bytes:
    """ZSTD_writeSkippableFrame:4937."""
    check(0 <= magic_variant <= 15, ZstdErrorCode.parameter_outOfBound)
    return ((C.ZSTD_MAGIC_SKIPPABLE_START + magic_variant).to_bytes(4, "little")
            + len(content).to_bytes(4, "little") + content)


class Compressor:
    """Mirror of the reference's safe Compressor (Compressor.cs:6)."""

    def __init__(self, level: int = C.ZSTD_DEFAULT_CLEVEL):
        self.params = CCtxParams(compression_level=level)
        self._dict = None

    @property
    def level(self) -> int:
        return self.params.compression_level

    @level.setter
    def level(self, value: int) -> None:
        self.params.compression_level = value

    def set_parameter(self, name: str, value) -> None:
        check(hasattr(self.params, name), ZstdErrorCode.parameter_unsupported, name)
        setattr(self.params, name, value)

    def get_parameter(self, name: str):
        check(hasattr(self.params, name), ZstdErrorCode.parameter_unsupported, name)
        return getattr(self.params, name)

    def load_dictionary(self, dict_data: bytes | None) -> None:
        from ..dictionary import ZstdCompressionDict

        self._dict = ZstdCompressionDict(dict_data) if dict_data is not None else None

    def get_compress_bound(self, size: int) -> int:
        return compress_bound(size)

    def wrap(self, data: bytes) -> bytes:
        if self._dict is not None:
            return self._dict.compress_with(data, self.params)
        resolved = self.params.resolve(src_size_hint=len(data))
        return compress_frame(data, resolved)

    compress = wrap
