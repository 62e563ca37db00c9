"""Native (C++) host-runtime components, bound via ctypes.

Currently: the BPE merge kernel (bpe_core.cc). The shared library is compiled
on first use with the system g++ into a cache dir; every consumer must degrade
gracefully to the pure-python path when no compiler is available.
"""

import ctypes
import hashlib
import logging
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

log = logging.getLogger(__name__)

_SRC = os.path.join(os.path.dirname(__file__), "bpe_core.cc")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_lib() -> Optional[str]:
    with open(_SRC, "rb") as fd:
        digest = hashlib.sha256(fd.read()).hexdigest()[:16]
    cache_dir = os.environ.get(
        "FFVC_NATIVE_CACHE", os.path.join(tempfile.gettempdir(), "ffvc_native")
    )
    os.makedirs(cache_dir, exist_ok=True)
    lib_path = os.path.join(cache_dir, f"libbpe_core_{digest}.so")
    if os.path.exists(lib_path):
        return lib_path
    tmp = lib_path + f".build{os.getpid()}"
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception as e:  # no compiler / failed build -> python fallback
        log.info("native BPE build unavailable (%s); using python path", e)
        return None
    os.replace(tmp, lib_path)
    return lib_path


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("FFVC_DISABLE_NATIVE"):
        return None
    path = _build_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.bpe_table_new.argtypes = [i32p, i32p, i32p, i32p, ctypes.c_int32]
    lib.bpe_table_new.restype = ctypes.c_void_p
    lib.bpe_table_free.argtypes = [ctypes.c_void_p]
    lib.bpe_apply.argtypes = [
        ctypes.c_void_p, i32p, ctypes.c_int32, i32p, ctypes.c_int32,
    ]
    lib.bpe_apply.restype = ctypes.c_int32
    lib.bpe_apply_batch.argtypes = [
        ctypes.c_void_p, i32p, i32p, ctypes.c_int32, i32p, i32p, ctypes.c_int32,
    ]
    lib.bpe_apply_batch.restype = ctypes.c_int32
    _LIB = lib
    return _LIB


class NativeBPE:
    """Merge-table handle over the C++ kernel. Symbols are encoder vocab ids."""

    def __init__(self, merges_by_id):
        """merges_by_id: list of (left_id, right_id, rank, result_id)."""
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native BPE library unavailable")
        self._lib = lib
        arr = np.asarray(merges_by_id, np.int32).reshape(-1, 4)
        lefts = np.ascontiguousarray(arr[:, 0])
        rights = np.ascontiguousarray(arr[:, 1])
        ranks = np.ascontiguousarray(arr[:, 2])
        results = np.ascontiguousarray(arr[:, 3])
        self._table = lib.bpe_table_new(lefts, rights, ranks, results, len(arr))
        self._out = np.empty(512, np.int32)

    def apply(self, sym_ids) -> list:
        syms = np.asarray(sym_ids, np.int32)
        n = self._lib.bpe_apply(self._table, syms, len(syms), self._out, len(self._out))
        if n < 0:  # pragma: no cover - 512 symbols is far beyond any word
            raise RuntimeError("BPE output overflow")
        return self._out[:n].tolist()

    def apply_batch(self, words) -> list:
        """words: list of symbol-id lists -> list of merged-id lists (one call)."""
        if not words:
            return []
        offsets = np.zeros(len(words) + 1, np.int32)
        for i, w in enumerate(words):
            offsets[i + 1] = offsets[i] + len(w)
        syms = np.fromiter(
            (s for w in words for s in w), np.int32, count=int(offsets[-1])
        )
        out = np.empty(int(offsets[-1]), np.int32)  # merges never grow the word
        out_offsets = np.empty(len(words) + 1, np.int32)
        n = self._lib.bpe_apply_batch(
            self._table, syms, offsets, len(words), out, out_offsets, len(out)
        )
        if n < 0:  # pragma: no cover
            raise RuntimeError("BPE output overflow")
        return [
            out[out_offsets[i] : out_offsets[i + 1]].tolist()
            for i in range(len(words))
        ]

    def __del__(self):
        try:
            if getattr(self, "_table", None):
                self._lib.bpe_table_free(self._table)
        except Exception:  # pragma: no cover
            pass
