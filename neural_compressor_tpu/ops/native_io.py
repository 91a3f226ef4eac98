"""Native streaming checkpoint reader (mmap + prefetch + parallel widen).

Host-side IO for the layer-wise (>RAM) quantization path. The reference
streams tensors through torch.load + a hardened pickle
(neural_compressor/torch/algorithms/layer_wise/utils.py:266-434); the TPU
redesign keeps safetensors as the only on-disk format and moves the byte
work to C++ (native/nq_io.cpp):

  * shards are mmap'ed once per process;
  * ``prefetch_prefix`` pages-in the NEXT layer's tensors on a background
    thread while the TPU quantizes the current layer (IO/compute overlap);
  * bf16/f16 -> f32 widening runs multi-threaded out of the page cache
    (numpy's ``view().astype()`` is single-threaded).

Falls back transparently to ``safetensors.safe_open`` when the native
library is unavailable, so every caller keeps working without a toolchain.
"""

from __future__ import annotations

import ctypes
import json
import os
import struct

import numpy as np

from .native import _load

# safetensors dtype tag -> (numpy dtype, itemsize)
_DTYPES = {
    "F64": np.float64, "F32": np.float32, "F16": np.float16,
    "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
    "U64": np.uint64, "U32": np.uint32, "U16": np.uint16, "U8": np.uint8,
    "BOOL": np.bool_,
}


def _bf16():
    import ml_dtypes

    return np.dtype(ml_dtypes.bfloat16)


def _bind(lib):
    if getattr(lib, "_io_bound", False):
        return lib
    i64 = ctypes.c_int64
    lib.io_open.argtypes = [ctypes.c_char_p]
    lib.io_open.restype = i64
    lib.io_close.argtypes = [i64]
    lib.io_prefetch.argtypes = [i64, i64, i64]
    lib.io_prefetch_inflight.restype = i64
    pf32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.io_read_bytes.argtypes = [i64, i64, i64, ctypes.c_void_p]
    lib.io_read_bf16_as_f32.argtypes = [i64, i64, i64, pf32]
    lib.io_read_f16_as_f32.argtypes = [i64, i64, i64, pf32]
    lib._io_bound = True
    return lib


class NativeShard:
    """One mmap'ed safetensors file with native reads."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise OSError("native library unavailable")
        self._lib = _bind(lib)
        with open(path, "rb") as f:
            (hlen,) = struct.unpack("<Q", f.read(8))
            header = json.loads(f.read(hlen))
        header.pop("__metadata__", None)
        self._data0 = 8 + hlen
        self._meta = header  # name -> {dtype, shape, data_offsets}
        self._h = self._lib.io_open(path.encode())
        if self._h <= 0:
            raise OSError(f"io_open({path}) failed: {self._h}")

    def keys(self):
        return self._meta.keys()

    def _span(self, name):
        m = self._meta[name]
        o0, o1 = m["data_offsets"]
        return self._data0 + o0, o1 - o0, m["dtype"], tuple(m["shape"])

    def get_tensor(self, name: str) -> np.ndarray:
        """Raw read, dtype-faithful (BF16 -> ml_dtypes.bfloat16)."""
        off, nbytes, tag, shape = self._span(name)
        if tag == "BF16":
            out = np.empty(shape, dtype=np.uint16)
            self._read_bytes(off, nbytes, out)
            return out.view(_bf16())
        dt = _DTYPES[tag]
        out = np.empty(shape, dtype=dt)
        self._read_bytes(off, nbytes, out)
        return out

    def get_f32(self, name: str) -> np.ndarray:
        """Read widened to float32 (native parallel widen for bf16/f16)."""
        off, nbytes, tag, shape = self._span(name)
        n = int(np.prod(shape)) if shape else 1
        if tag == "BF16":
            out = np.empty(shape, dtype=np.float32)
            rc = self._lib.io_read_bf16_as_f32(self._h, off, n,
                                               out.reshape(-1))
        elif tag == "F16":
            out = np.empty(shape, dtype=np.float32)
            rc = self._lib.io_read_f16_as_f32(self._h, off, n,
                                              out.reshape(-1))
        elif tag == "F32":
            out = np.empty(shape, dtype=np.float32)
            self._read_bytes(off, nbytes, out)  # raises on failure
            rc = 0
        else:
            return self.get_tensor(name).astype(np.float32)
        if rc != 0:
            raise IOError(f"native read of {name!r} failed ({rc})")
        return out

    def prefetch(self, name: str) -> None:
        off, nbytes, _, _ = self._span(name)
        self._lib.io_prefetch(self._h, off, nbytes)

    def _read_bytes(self, off, nbytes, out: np.ndarray) -> None:
        rc = self._lib.io_read_bytes(
            self._h, off, nbytes, out.ctypes.data_as(ctypes.c_void_p))
        if rc != 0:
            # a silent np.empty return would become garbage model weights
            raise IOError(
                f"native read failed (rc={rc}): offset {off} + {nbytes} "
                f"bytes is outside the mapped shard — corrupt/truncated "
                "checkpoint?")

    def close(self):
        if self._h > 0:
            self._lib.io_close(self._h)
            self._h = 0

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class _FallbackShard:
    """safetensors-backed shard with the same surface as NativeShard."""

    def __init__(self, path: str):
        from safetensors import safe_open

        self._f = safe_open(path, framework="np")

    def keys(self):
        return self._f.keys()

    def get_tensor(self, name):
        return self._f.get_tensor(name)

    def get_f32(self, name):
        t = self._f.get_tensor(name)
        return np.asarray(t).astype(np.float32)

    def prefetch(self, name):
        pass

    def close(self):
        pass


def open_shard(path: str):
    try:
        return NativeShard(path)
    except (OSError, AttributeError):
        # AttributeError: a stale libnq_native.so predating the IO entry
        # points (ctypes raises on the missing symbol in _bind) — fall
        # back rather than crash; `make -C native` refreshes it
        return _FallbackShard(path)


class CheckpointReader:
    """Random-access reader over single/sharded HF safetensors with
    native mmap + prefetch when the toolchain is available."""

    def __init__(self, model_dir: str):
        self._shards: dict = {}
        self._where: dict = {}
        index = os.path.join(model_dir, "model.safetensors.index.json")
        if os.path.exists(index):
            with open(index) as f:
                weight_map = json.load(f)["weight_map"]
            self._where.update(weight_map)
            for shard in set(weight_map.values()):
                self._shards[shard] = open_shard(
                    os.path.join(model_dir, shard))
        else:
            h = open_shard(os.path.join(model_dir, "model.safetensors"))
            self._shards["_"] = h
            for name in h.keys():
                self._where[name] = "_"

    @property
    def native(self) -> bool:
        return any(isinstance(s, NativeShard) for s in self._shards.values())

    def get(self, name: str) -> np.ndarray:
        return self._shards[self._where[name]].get_tensor(name)

    def get_f32(self, name: str) -> np.ndarray:
        return self._shards[self._where[name]].get_f32(name)

    def prefetch(self, name: str) -> None:
        self._shards[self._where[name]].prefetch(name)

    def prefetch_prefix(self, prefix: str) -> int:
        n = 0
        for name in self._where:
            if name.startswith(prefix):
                self.prefetch(name)
                n += 1
        return n

    def names_under(self, prefix: str):
        return sorted(n for n in self._where if n.startswith(prefix))

    def __contains__(self, name):
        return name in self._where

    def close(self):
        for s in self._shards.values():
            s.close()
        self._shards.clear()
