"""Native (C) host runtime: Poseidon2 permutation + sponge batch kernels.

The reference's host hot paths (witness fills, transcripts, Merkle walks,
pool-admission verification) run in compiled Rust inside qp-plonky2; this
package is the equivalent compiled layer here. The shared object is built
once with the system C compiler and cached next to the source; everything
degrades gracefully to the pure-Python/numpy paths when no compiler is
available (`available()` returns False and callers fall back).

Constants are injected from `hash/poseidon2.py`'s Grain-LFSR tables at load,
so the Python derivation (and its KAT pins) remains the single source of
truth for the instance.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "poseidon2.c"
_SO = _HERE / "_poseidon2.so"

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> Path | None:
    cc = os.environ.get("CC", "cc")
    cmd = [cc, "-O3", "-funroll-loops", "-shared", "-fPIC", "-o", str(_SO), str(_SRC)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        return None


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        so = _SO if _SO.exists() and _SO.stat().st_mtime >= _SRC.stat().st_mtime else _build()
        if so is None or not Path(so).exists():
            return None
        lib = ctypes.CDLL(str(so))
        u64p = ctypes.POINTER(ctypes.c_uint64)
        lib.p2_set_constants.argtypes = [u64p, u64p, ctypes.c_int, u64p, u64p]
        lib.p2_permute_batch.argtypes = [u64p, ctypes.c_size_t]
        lib.p2_permute_trace_batch.argtypes = [u64p, ctypes.c_size_t] + [u64p] * 4
        lib.p2_hash_no_pad.argtypes = [u64p, ctypes.c_size_t, u64p]
        lib.p2_hash_no_pad_many.argtypes = [u64p, ctypes.c_size_t, ctypes.c_size_t, u64p]
        lib.p2_two_to_one_many.argtypes = [u64p, u64p, ctypes.c_size_t, u64p]
        lib.p2_merkle_walk.argtypes = [
            u64p, ctypes.c_uint64, u64p, ctypes.c_size_t, u64p,
        ]

        from ..hash import poseidon2 as ps

        ext_rcs, int_rcs, diag = ps._constants()
        m4 = np.asarray(ps._M4, dtype=np.uint64).ravel()
        lib.p2_set_constants(
            _ptr(np.ascontiguousarray(ext_rcs, dtype=np.uint64)),
            _ptr(np.ascontiguousarray(int_rcs, dtype=np.uint64)),
            int(len(int_rcs)),
            _ptr(np.ascontiguousarray(diag, dtype=np.uint64)),
            _ptr(np.ascontiguousarray(m4)),
        )
        _lib = lib
        return _lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def available() -> bool:
    return _load() is not None


def permute_batch(states: np.ndarray) -> np.ndarray:
    """states (..., 12) canonical uint64 -> permuted, same shape."""
    lib = _load()
    assert lib is not None
    out = np.ascontiguousarray(states, dtype=np.uint64).copy()
    lib.p2_permute_batch(_ptr(out), out.size // 12)
    return out


def permute_trace_batch(states: np.ndarray):
    """states (n, 12) -> (ext_a (n,4,12), internal (n,R_P), ext_b (n,3,12),
    out (n,12)): the intermediate S-box outputs the Poseidon2 gate witnesses."""
    lib = _load()
    assert lib is not None
    arr = np.ascontiguousarray(states, dtype=np.uint64).reshape(-1, 12)
    n = arr.shape[0]
    from ..hash.poseidon2 import ROUNDS_P

    ext_a = np.empty((n, 4, 12), dtype=np.uint64)
    inter = np.empty((n, ROUNDS_P), dtype=np.uint64)
    ext_b = np.empty((n, 3, 12), dtype=np.uint64)
    out = np.empty((n, 12), dtype=np.uint64)
    lib.p2_permute_trace_batch(_ptr(arr), n, _ptr(ext_a), _ptr(inter), _ptr(ext_b), _ptr(out))
    return ext_a, inter, ext_b, out


def hash_no_pad(inputs: np.ndarray) -> np.ndarray:
    lib = _load()
    assert lib is not None
    arr = np.ascontiguousarray(inputs, dtype=np.uint64)
    digest = np.empty(4, dtype=np.uint64)
    lib.p2_hash_no_pad(_ptr(arr), arr.size, _ptr(digest))
    return digest


def hash_no_pad_many(rows: np.ndarray) -> np.ndarray:
    """rows (n, len) -> digests (n, 4)."""
    lib = _load()
    assert lib is not None
    arr = np.ascontiguousarray(rows, dtype=np.uint64)
    n, length = arr.shape
    digests = np.empty((n, 4), dtype=np.uint64)
    lib.p2_hash_no_pad_many(_ptr(arr), n, length, _ptr(digests))
    return digests


def merkle_walk(leaf_digest: np.ndarray, index: int, siblings: np.ndarray) -> np.ndarray:
    """One-call Merkle path fold: leaf (4,), siblings (L, 4) -> cap entry (4,)."""
    lib = _load()
    assert lib is not None
    leaf = np.ascontiguousarray(leaf_digest, dtype=np.uint64)
    sibs = np.ascontiguousarray(siblings, dtype=np.uint64).reshape(-1, 4)
    out = np.empty(4, dtype=np.uint64)
    lib.p2_merkle_walk(_ptr(leaf), int(index), _ptr(sibs), sibs.shape[0], _ptr(out))
    return out


def two_to_one_many(left: np.ndarray, right: np.ndarray) -> np.ndarray:
    """left/right (n, 4) -> parent digests (n, 4)."""
    lib = _load()
    assert lib is not None
    l = np.ascontiguousarray(left, dtype=np.uint64).reshape(-1, 4)
    r = np.ascontiguousarray(right, dtype=np.uint64).reshape(-1, 4)
    out = np.empty_like(l)
    lib.p2_two_to_one_many(_ptr(l), _ptr(r), l.shape[0], _ptr(out))
    return out
