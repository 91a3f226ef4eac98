"""ctypes bindings for the native host library (native/nq_native.cpp).

Auto-builds ``libnq_native.so`` on first use (``make`` in native/); every
entry point has a pure-numpy fallback so the package works without a
toolchain. These are the **host-side** fast paths (checkpoint interchange,
CPU packing); on-device packing stays the jitted XLA path in packing.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from ..common import logger

_LIB = None
_TRIED = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    d = _native_dir()
    so = os.path.join(d, "libnq_native.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", d], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:  # toolchain absent — fall back silently
            logger.debug("native build unavailable: %s", e)
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError as e:
        logger.debug("native load failed: %s", e)
        return None
    i64, i32 = ctypes.c_int64, ctypes.c_int32
    p8 = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
    pu32 = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    pi32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.pack_tpu_strided.argtypes = [p8, pu32, i64, i64, i32, i32, i32]
    lib.unpack_tpu_strided.argtypes = [pu32, p8, i64, i64, i32, i32, i32]
    lib.pack_gptq_qweight.argtypes = [p8, pi32, i64, i64, i32]
    lib.unpack_gptq_qweight.argtypes = [pi32, p8, i64, i64, i32]
    lib.gptq_to_tpu_strided.argtypes = [pi32, pu32, i64, i64, i32, i32]
    _LIB = lib
    logger.info("native host library loaded (%s)", so)
    return _LIB


def available() -> bool:
    return _load() is not None


def pack_tpu_strided(codes: np.ndarray, bits: int, G: int,
                     offset_binary: bool = True) -> np.ndarray:
    """int8 codes [K, N] -> uint32 [K/P, N] (tpu_strided)."""
    K, N = codes.shape
    P = 32 // bits
    assert K % G == 0 and G % P == 0
    lib = _load()
    codes = np.ascontiguousarray(codes, dtype=np.int8)
    if lib is not None:
        out = np.empty((K // P, N), dtype=np.uint32)
        lib.pack_tpu_strided(codes, out, K, N, bits, G,
                             int(offset_binary))
        return out
    # numpy fallback (same math as ops/packing.pack_codes)
    mask = (1 << bits) - 1
    c = codes.astype(np.int32)
    if offset_binary:  # fields = signed + half (see commit 6dbea95)
        c = c + (1 << (bits - 1))
    c = (c.astype(np.uint32) & mask).reshape(K // G, P, G // P, N)
    out = np.zeros((K // G, G // P, N), dtype=np.uint32)
    for s in range(P):
        out |= c[:, s] << (bits * s)
    return out.reshape(K // P, N)


def unpack_tpu_strided(packed: np.ndarray, bits: int, G: int, K: int,
                       signed: bool) -> np.ndarray:
    P = 32 // bits
    N = packed.shape[-1]
    lib = _load()
    packed = np.ascontiguousarray(packed, dtype=np.uint32)
    if lib is not None:
        out = np.empty((K, N), dtype=np.int8)
        lib.unpack_tpu_strided(packed, out, K, N, bits, G, int(signed))
        return out
    mask = (1 << bits) - 1
    p = packed.reshape(K // G, G // P, N)
    planes = [(p >> (bits * s)) & mask for s in range(P)]
    codes = np.concatenate(planes, axis=1).reshape(K, N).astype(np.int32)
    if signed:  # offset-binary fields: code = field - half (commit 6dbea95)
        codes = codes - (1 << (bits - 1))
    return codes.astype(np.int8)


def pack_gptq_qweight(codes_unsigned: np.ndarray, bits: int) -> np.ndarray:
    K, N = codes_unsigned.shape
    lib = _load()
    codes = np.ascontiguousarray(codes_unsigned, dtype=np.int8)
    if lib is not None:
        out = np.empty((K // (32 // bits), N), dtype=np.int32)
        lib.pack_gptq_qweight(codes, out, K, N, bits)
        return out
    P = 32 // bits
    mask = (1 << bits) - 1
    out = np.zeros((K // P, N), dtype=np.int64)
    for s in range(P):
        out |= (codes[s::P].astype(np.int64) & mask) << (bits * s)
    return out.astype(np.int32)


def unpack_gptq_qweight(qweight: np.ndarray, bits: int) -> np.ndarray:
    Kp, N = qweight.shape
    P = 32 // bits
    K = Kp * P
    lib = _load()
    qweight = np.ascontiguousarray(qweight, dtype=np.int32)
    if lib is not None:
        out = np.empty((K, N), dtype=np.int8)
        lib.unpack_gptq_qweight(qweight, out, K, N, bits)
        return out
    mask = (1 << bits) - 1
    planes = [((qweight >> (bits * s)) & mask) for s in range(P)]
    return np.stack(planes, axis=1).reshape(K, N).astype(np.int8)


def gptq_to_tpu_strided(qweight: np.ndarray, bits: int, G: int) -> np.ndarray:
    """Fused checkpoint-import conversion (centered shift included)."""
    Kp, N = qweight.shape
    P = 32 // bits
    K = Kp * P
    lib = _load()
    if lib is not None:
        qweight = np.ascontiguousarray(qweight, dtype=np.int32)
        out = np.empty((K // P, N), dtype=np.uint32)
        lib.gptq_to_tpu_strided(qweight, out, K, N, bits, G)
        return out
    codes = unpack_gptq_qweight(qweight, bits).astype(np.int32)
    half = 1 << (bits - 1)
    return pack_tpu_strided((codes - half).astype(np.int8), bits, G)
