"""ctypes bindings for the C++ rANS coder + a pure-python mirror.

The serial range coder runs host-side (it is inherently sequential); the NN
side that produces CDF parameters runs in JAX on the TPU. This mirrors the
reference split where compressai's C++ rANS sat under
`EntropyBottleneck.compress` / `GaussianConditional.compress`
(Network.py:346-347,400-401,424-428).

The shared library is compiled on first use with g++ -O3 and cached next to
the source. A slow numpy mirror (`PyRansEncoder/PyRansDecoder`) implements the
identical stream layout and is used to cross-check the native coder in tests.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "cpp", "rans_coder.cpp")
_LIB = os.path.join(_HERE, "cpp", "librans_coder.so")
_LOCK = threading.Lock()
_lib = None

PRECISION = 16
BYPASS_PRECISION = 4
MAX_BYPASS_VAL = (1 << BYPASS_PRECISION) - 1
RANS_L = 1 << 31


def _build_lib() -> str:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def get_lib():
    global _lib
    with _LOCK:
        if _lib is None:
            lib = ctypes.CDLL(_build_lib())
            c_i32p = ctypes.POINTER(ctypes.c_int32)
            c_u8p = ctypes.POINTER(ctypes.c_uint8)
            c_lp = ctypes.POINTER(ctypes.c_long)
            lib.rans_encode_with_indexes.restype = ctypes.c_long
            lib.rans_encode_with_indexes.argtypes = [
                c_i32p, c_i32p, ctypes.c_long, c_i32p, ctypes.c_long, c_i32p, c_i32p,
                c_u8p, ctypes.c_long,
            ]
            lib.rans_decode_with_indexes.restype = ctypes.c_long
            lib.rans_decode_with_indexes.argtypes = [
                c_u8p, ctypes.c_long, c_i32p, ctypes.c_long, c_i32p, ctypes.c_long,
                c_i32p, c_i32p, c_i32p,
            ]
            lib.rans_encode_batch.restype = ctypes.c_long
            lib.rans_encode_batch.argtypes = [
                c_i32p, c_i32p, c_lp, ctypes.c_long, c_i32p, ctypes.c_long, c_i32p,
                c_i32p, c_u8p, ctypes.c_long, c_lp,
            ]
            lib.rans_decode_batch.restype = ctypes.c_long
            lib.rans_decode_batch.argtypes = [
                c_u8p, c_lp, ctypes.c_long, c_i32p, c_lp, c_i32p, ctypes.c_long,
                c_i32p, c_i32p, c_i32p,
            ]
            _lib = lib
    return _lib


def _as_i32(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a).reshape(-1), dtype=np.int32)


class RansEncoder:
    """Native rANS encoder (API ≅ compressai BufferedRansEncoder)."""

    def encode_with_indexes(
        self,
        symbols: Sequence[int],
        indexes: Sequence[int],
        cdfs: np.ndarray,
        cdf_lengths: Sequence[int],
        offsets: Sequence[int],
    ) -> bytes:
        lib = get_lib()
        sym = _as_i32(symbols)
        ind = _as_i32(indexes)
        cdfs = np.ascontiguousarray(cdfs, dtype=np.int32)
        cl = _as_i32(cdf_lengths)
        off = _as_i32(offsets)
        cap = max(64, sym.size * 8 + 64)
        out = np.empty(cap, dtype=np.uint8)
        n = lib.rans_encode_with_indexes(
            sym.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ind.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            sym.size,
            cdfs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cdfs.shape[1],
            cl.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            off.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            cap,
        )
        if n < 0:
            raise RuntimeError("rans encode: output buffer too small")
        return bytes(out[:n].tobytes())

    def encode_batch(
        self,
        symbols: np.ndarray,  # (total,) concatenated
        indexes: np.ndarray,
        counts: Sequence[int],
        cdfs: np.ndarray,
        cdf_lengths: Sequence[int],
        offsets: Sequence[int],
    ) -> List[bytes]:
        lib = get_lib()
        sym = _as_i32(symbols)
        ind = _as_i32(indexes)
        cnt = np.ascontiguousarray(counts, dtype=np.int64)
        cdfs = np.ascontiguousarray(cdfs, dtype=np.int32)
        cl = _as_i32(cdf_lengths)
        off = _as_i32(offsets)
        cap = max(64, sym.size * 8 + 64 * len(cnt) + 64)
        out = np.empty(cap, dtype=np.uint8)
        sizes = np.zeros(len(cnt), dtype=np.int64)
        n = lib.rans_encode_batch(
            sym.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ind.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cnt.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
            len(cnt),
            cdfs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cdfs.shape[1],
            cl.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            off.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            cap,
            sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        )
        if n < 0:
            raise RuntimeError("rans encode batch failed")
        res, o = [], 0
        for s in sizes:
            res.append(bytes(out[o : o + s].tobytes()))
            o += int(s)
        return res


class RansDecoder:
    """Native rANS decoder (API ≅ compressai RansDecoder)."""

    def decode_with_indexes(
        self,
        data: bytes,
        indexes: Sequence[int],
        cdfs: np.ndarray,
        cdf_lengths: Sequence[int],
        offsets: Sequence[int],
    ) -> np.ndarray:
        lib = get_lib()
        ind = _as_i32(indexes)
        cdfs = np.ascontiguousarray(cdfs, dtype=np.int32)
        cl = _as_i32(cdf_lengths)
        off = _as_i32(offsets)
        buf = np.frombuffer(data, dtype=np.uint8)
        buf = np.ascontiguousarray(buf)
        out = np.empty(ind.size, dtype=np.int32)
        rc = lib.rans_decode_with_indexes(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            buf.size,
            ind.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ind.size,
            cdfs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cdfs.shape[1],
            cl.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            off.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc != 0:
            raise RuntimeError("rans decode failed")
        return out

    def decode_batch(
        self,
        datas: Sequence[bytes],
        indexes: np.ndarray,
        counts: Sequence[int],
        cdfs: np.ndarray,
        cdf_lengths: Sequence[int],
        offsets: Sequence[int],
    ) -> np.ndarray:
        lib = get_lib()
        ind = _as_i32(indexes)
        cnt = np.ascontiguousarray(counts, dtype=np.int64)
        sizes = np.ascontiguousarray([len(d) for d in datas], dtype=np.int64)
        blob = np.frombuffer(b"".join(datas), dtype=np.uint8)
        blob = np.ascontiguousarray(blob)
        cdfs = np.ascontiguousarray(cdfs, dtype=np.int32)
        cl = _as_i32(cdf_lengths)
        off = _as_i32(offsets)
        out = np.empty(int(cnt.sum()), dtype=np.int32)
        rc = lib.rans_decode_batch(
            blob.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
            len(datas),
            ind.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cnt.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
            cdfs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cdfs.shape[1],
            cl.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            off.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc != 0:
            raise RuntimeError("rans batch decode failed")
        return out


# ---------------------------------------------------------------------------
# Pure-python mirror of the exact same stream layout (test oracle only).
# ---------------------------------------------------------------------------


class PyRansEncoder:
    def encode_with_indexes(self, symbols, indexes, cdfs, cdf_lengths, offsets) -> bytes:
        syms = []  # (start_or_val, range, bypass)
        cdfs = np.asarray(cdfs)
        for value, idx in zip(np.asarray(symbols).reshape(-1), np.asarray(indexes).reshape(-1)):
            cdf = cdfs[idx]
            max_value = int(cdf_lengths[idx]) - 2
            v = int(value) - int(offsets[idx])
            raw_val = 0
            if v < 0:
                raw_val = -2 * v - 1
                v = max_value
            elif v >= max_value:
                raw_val = 2 * (v - max_value)
                v = max_value
            syms.append((int(cdf[v]), int(cdf[v + 1] - cdf[v]), False))
            if v == max_value:
                n_bypass = 0
                while (raw_val >> (n_bypass * BYPASS_PRECISION)) != 0:
                    n_bypass += 1
                val = n_bypass
                while val >= MAX_BYPASS_VAL:
                    syms.append((MAX_BYPASS_VAL, 0, True))
                    val -= MAX_BYPASS_VAL
                syms.append((val, 0, True))
                for j in range(n_bypass):
                    syms.append(((raw_val >> (j * BYPASS_PRECISION)) & MAX_BYPASS_VAL, 0, True))

        state = RANS_L
        words = []
        for start, rng, bypass in reversed(syms):
            if bypass:
                freq = 1 << (16 - BYPASS_PRECISION)
                x_max = ((RANS_L >> 16) << 32) * freq
                if state >= x_max:
                    words.append(state & 0xFFFFFFFF)
                    state >>= 32
                state = (state << BYPASS_PRECISION) | start
            else:
                x_max = ((RANS_L >> PRECISION) << 32) * rng
                if state >= x_max:
                    words.append(state & 0xFFFFFFFF)
                    state >>= 32
                state = ((state // rng) << PRECISION) + (state % rng) + start

        out = np.empty(len(words) + 2, dtype=np.uint32)
        out[0] = (state >> 32) & 0xFFFFFFFF
        out[1] = state & 0xFFFFFFFF
        for j, wv in enumerate(reversed(words)):
            out[2 + j] = wv
        return out.tobytes()


class PyRansDecoder:
    def decode_with_indexes(self, data, indexes, cdfs, cdf_lengths, offsets) -> np.ndarray:
        words = np.frombuffer(data, dtype=np.uint32)
        pos = 2
        state = (int(words[0]) << 32) | int(words[1])
        cdfs = np.asarray(cdfs)
        mask = (1 << PRECISION) - 1

        def renorm(state, pos):
            if state < RANS_L and pos < len(words):
                state = (state << 32) | int(words[pos])
                pos += 1
            return state, pos

        def get_bits(state, pos, nbits):
            val = state & ((1 << nbits) - 1)
            state >>= nbits
            state, pos = renorm(state, pos)
            return int(val), state, pos

        out = np.empty(len(indexes), dtype=np.int32)
        for i, idx in enumerate(np.asarray(indexes).reshape(-1)):
            cdf = cdfs[idx]
            max_value = int(cdf_lengths[idx]) - 2
            cum = state & mask
            s = int(np.searchsorted(cdf[: int(cdf_lengths[idx])], cum, side="right")) - 1
            start, freq = int(cdf[s]), int(cdf[s + 1] - cdf[s])
            state = freq * (state >> PRECISION) + (state & mask) - start
            state, pos = renorm(state, pos)
            value = s
            if value == max_value:
                val, state, pos = get_bits(state, pos, BYPASS_PRECISION)
                n_bypass = val
                while val == MAX_BYPASS_VAL:
                    val, state, pos = get_bits(state, pos, BYPASS_PRECISION)
                    n_bypass += val
                raw_val = 0
                for j in range(n_bypass):
                    val, state, pos = get_bits(state, pos, BYPASS_PRECISION)
                    raw_val |= val << (j * BYPASS_PRECISION)
                value = raw_val >> 1
                value = -value - 1 if (raw_val & 1) else value + max_value
            out[i] = value + int(offsets[idx])
        return out
