"""Chainable compression codecs (reference ``compression/CompressionCodecs.h``:
None, LZ4, ZSTD, Delta, DoubleDelta, Gorilla, T64, chainable "Multiple").

Host-side/on-disk only — device-resident columns are raw or bit-packed
arrays. Each codec frames its output with a method byte, like the
reference's ``ICompressionCodec``. LZ4 is a native block-format
implementation (``native/_native.cpp``; liblz4 is absent from this image,
so the format is implemented from its public spec). ZSTD is not available
without its library, so zlib fills the stronger-entropy role; Delta /
DoubleDelta / Gorilla(xor) / T64 (bit-packed transpose-free variant) are
faithful re-implementations of the transform stages.
"""

from __future__ import annotations

import struct
import zlib
from typing import Dict, List

import numpy as np

from diagon_tpu.codecs.bitpack import bits_needed, pack_u32, unpack_u32_numpy

METHOD_NONE = 0x00
METHOD_ZLIB = 0x01
METHOD_DELTA = 0x02
METHOD_DOUBLE_DELTA = 0x03
METHOD_GORILLA = 0x04
METHOD_T64 = 0x05
METHOD_LZ4 = 0x06


class Codec:
    method: int

    def compress(self, data: bytes) -> bytes:
        raise NotImplementedError

    def decompress(self, data: bytes) -> bytes:
        raise NotImplementedError


class NoneCodec(Codec):
    method = METHOD_NONE

    def compress(self, data: bytes) -> bytes:
        return data

    def decompress(self, data: bytes) -> bytes:
        return data


class ZlibCodec(Codec):
    method = METHOD_ZLIB

    def __init__(self, level: int = 1):
        self.level = level

    def compress(self, data: bytes) -> bytes:
        return zlib.compress(data, self.level)

    def decompress(self, data: bytes) -> bytes:
        return zlib.decompress(data)


class DeltaCodec(Codec):
    """int64 delta transform (reference Delta codec)."""

    method = METHOD_DELTA

    def compress(self, data: bytes) -> bytes:
        v = np.frombuffer(data, dtype=np.int64)
        if len(v) == 0:
            return data
        d = np.diff(v, prepend=v[:1])
        d[0] = v[0]
        return d.tobytes()

    def decompress(self, data: bytes) -> bytes:
        d = np.frombuffer(data, dtype=np.int64)
        if len(d) == 0:
            return data
        return np.cumsum(d).tobytes()


class DoubleDeltaCodec(Codec):
    method = METHOD_DOUBLE_DELTA

    def compress(self, data: bytes) -> bytes:
        v = np.frombuffer(data, dtype=np.int64)
        if len(v) < 2:
            return data
        d1 = np.diff(v, prepend=v[:1])
        d1[0] = v[0]
        d2 = np.diff(d1, prepend=d1[:1])
        d2[0] = d1[0]
        return d2.tobytes()

    def decompress(self, data: bytes) -> bytes:
        d2 = np.frombuffer(data, dtype=np.int64)
        if len(d2) < 2:
            return data
        return np.cumsum(np.cumsum(d2)).tobytes()


class GorillaCodec(Codec):
    """XOR-with-previous transform for floats (Gorilla's core idea; the
    entropy stage is left to a chained zlib)."""

    method = METHOD_GORILLA

    def compress(self, data: bytes) -> bytes:
        v = np.frombuffer(data, dtype=np.uint64)
        if len(v) == 0:
            return data
        x = v.copy()
        x[1:] = v[1:] ^ v[:-1]
        return x.tobytes()

    def decompress(self, data: bytes) -> bytes:
        x = np.frombuffer(data, dtype=np.uint64)
        if len(x) == 0:
            return data
        out = np.empty_like(x)
        acc = np.uint64(0)
        # xor-scan; vectorized via cumulative reduce on blocks is possible,
        # but columns decompress granule-at-a-time (8192) so a loop is fine.
        for i in range(len(x)):
            acc = acc ^ x[i]
            out[i] = acc
        return out.tobytes()


class Lz4Codec(Codec):
    """LZ4 block format (reference ``CompressionCodecs.h`` LZ4Codec, which
    wraps liblz4; here the block format is implemented in the native host
    tier, ``native/_native.cpp``). Framed with the decoded size (the block
    format itself does not carry it). Without the native extension,
    compress emits a literals-only block (valid LZ4, no ratio) and
    decompress parses the format in Python."""

    method = METHOD_LZ4

    def compress(self, data: bytes) -> bytes:
        from diagon_tpu.native import _native

        size = struct.pack("<I", len(data))
        if _native is not None:
            return size + _native.lz4_compress(data)
        # literals-only block: one final sequence, no matches
        n = len(data)
        if n == 0:
            return size
        head = bytearray()
        lit = min(n, 15)
        head.append(lit << 4)
        if lit == 15:
            rest = n - 15
            while rest >= 255:
                head.append(255)
                rest -= 255
            head.append(rest)
        return size + bytes(head) + data

    def decompress(self, data: bytes) -> bytes:
        (out_size,) = struct.unpack_from("<I", data)
        block = data[4:]
        if out_size == 0:
            return b""
        from diagon_tpu.native import _native

        if _native is not None:
            return _native.lz4_decompress(block, out_size)
        out = bytearray()
        ip, n = 0, len(block)
        while ip < n:
            token = block[ip]
            ip += 1
            lit = token >> 4
            if lit == 15:
                while True:
                    b = block[ip]
                    ip += 1
                    lit += b
                    if b != 255:
                        break
            out += block[ip : ip + lit]
            ip += lit
            if ip >= n:
                break
            offset = block[ip] | (block[ip + 1] << 8)
            ip += 2
            mlen = (token & 0x0F) + 4
            if token & 0x0F == 15:
                while True:
                    b = block[ip]
                    ip += 1
                    mlen += b
                    if b != 255:
                        break
            start = len(out) - offset
            for i in range(mlen):  # overlap-safe
                out.append(out[start + i])
        if len(out) != out_size:
            raise ValueError(
                f"lz4: corrupt block ({len(out)} of {out_size} bytes)"
            )
        return bytes(out)


class T64Codec(Codec):
    """Bit-width reduction for int64 (the role of ClickHouse T64): subtract
    min, pack at the needed width."""

    method = METHOD_T64

    def compress(self, data: bytes) -> bytes:
        v = np.frombuffer(data, dtype=np.int64)
        if len(v) == 0:
            return struct.pack("<qqB", 0, 0, 1)
        lo = int(v.min())
        rel = (v - lo).astype(np.uint64)
        hi = int(rel.max())
        if hi >= (1 << 32):
            # fall back to raw (method framing still applies)
            return struct.pack("<qqB", lo, -1, 64) + v.tobytes()
        bits = bits_needed(hi)
        words = pack_u32(rel, bits)
        return struct.pack("<qqB", lo, len(v), bits) + words.tobytes()

    def decompress(self, data: bytes) -> bytes:
        lo, n, bits = struct.unpack_from("<qqB", data)
        payload = data[17:]
        if n == 0:
            return b""
        if n == -1:
            return payload
        words = np.frombuffer(payload, dtype=np.uint32)
        rel = unpack_u32_numpy(words, bits, n).astype(np.int64)
        return (rel + lo).tobytes()


CODECS: Dict[str, Codec] = {
    "none": NoneCodec(),
    "zlib": ZlibCodec(),
    "lz4": Lz4Codec(),
    "delta": DeltaCodec(),
    "doubledelta": DoubleDeltaCodec(),
    "gorilla": GorillaCodec(),
    "t64": T64Codec(),
}

_BY_METHOD = {c.method: c for c in CODECS.values()}


def compress(data: bytes, chain: List[str]) -> bytes:
    """Apply a codec chain (reference "Multiple"); framed with method bytes."""
    out = data
    methods = []
    for name in chain:
        codec = CODECS[name]
        out = codec.compress(out)
        methods.append(codec.method)
    return bytes([len(methods)]) + bytes(methods) + out


def decompress(data: bytes) -> bytes:
    n = data[0]
    methods = data[1 : 1 + n]
    out = data[1 + n :]
    for m in reversed(methods):
        out = _BY_METHOD[m].decompress(out)
    return out
