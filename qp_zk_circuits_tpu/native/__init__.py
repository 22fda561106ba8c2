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
_SRCS = (_HERE / "poseidon2.c", _HERE / "fri_verify.c", _HERE / "witness_tape.c")


def _so_path() -> Path:
    """Host-tagged cache name: -march=native codegen must never be loaded on
    a different CPU (shared/NFS checkout, copied venv) — SIGILL instead of a
    fallback (ADVICE r2). platform.machine() + the CPU model name hash tag
    the binary to the host class that built it."""
    import hashlib
    import platform

    model = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("model name"):
                    model = line.split(":", 1)[1].strip()
                    break
    except OSError:
        pass
    tag = hashlib.sha256(
        (platform.machine() + "|" + model).encode()
    ).hexdigest()[:12]
    return _HERE / f"_poseidon2_{tag}.so"


_SO = _so_path()

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> Path | None:
    # Compile to a unique temp file in the same directory and os.replace()
    # into place: two processes importing concurrently can never CDLL a
    # partially-written .so (ADVICE r2).
    import tempfile

    cc = os.environ.get("CC", "cc")
    srcs = [str(s) for s in _SRCS]
    fd, tmp = tempfile.mkstemp(suffix=".so", prefix="_p2_build_", dir=str(_HERE))
    os.close(fd)
    base = ["-O3", "-funroll-loops", "-shared", "-fPIC", "-o", tmp]
    # The .so is built per-host (never committed), so host-tuned codegen is
    # safe; -fopenmp fans the query rounds / batched hashes across cores.
    # Drop extras one at a time for toolchains that lack them.
    try:
        for extras in (["-march=native", "-fopenmp"], ["-fopenmp"], []):
            try:
                subprocess.run(
                    [cc, *base, *extras, *srcs],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
                os.replace(tmp, _SO)  # atomic publish
                return _SO
            except (subprocess.SubprocessError, OSError):
                continue
        return None
    finally:
        try:
            os.unlink(tmp)
        except OSError:
            pass


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        fresh = _SO.exists() and all(
            _SO.stat().st_mtime >= s.stat().st_mtime for s in _SRCS
        )
        so = _SO if fresh else _build()
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
        lib.fri_verify_queries.restype = ctypes.c_int64
        lib.fri_verify_queries.argtypes = (
            [ctypes.c_uint64] * 2                       # lde_bits, n_rounds
            + [u64p, ctypes.c_uint64, ctypes.c_uint64]  # schedule, n_layers, n_oracles
            + [u64p, u64p, ctypes.c_uint64]             # widths, caps, cap_height
            + [ctypes.c_uint64] + [u64p] * 7            # n_batches .. betas
            + [u64p, ctypes.c_uint64, u64p]             # final_poly, final_len, commit_caps
            + [ctypes.c_uint64] * 2                     # g, w0
            + [u64p] * 5                                # indices, rows, sibs, leaves, step sibs
        )
        lib.p2_absorb_many.restype = ctypes.c_int64
        lib.p2_absorb_many.argtypes = [u64p, u64p, ctypes.c_int64, u64p, ctypes.c_uint64]
        u8p = ctypes.POINTER(ctypes.c_uint8)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.eval_tape.argtypes = [u8p, u32p, u32p, ctypes.c_uint64, u64p,
                                  ctypes.c_uint64, u64p]
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.wt_run.restype = ctypes.c_int64
        lib.wt_run.argtypes = [i32p, ctypes.c_int64, u64p, u64p, u8p,
                               ctypes.c_int64]

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


def fri_verify_queries(
    lde_bits: int,
    schedule: np.ndarray,
    oracle_widths: np.ndarray,
    oracle_caps: np.ndarray,
    cap_height: int,
    batch_sizes: np.ndarray,
    batch_points: np.ndarray,
    poly_oi: np.ndarray,
    poly_pj: np.ndarray,
    openings: np.ndarray,
    alpha: np.ndarray,
    betas: np.ndarray,
    final_poly: np.ndarray,
    commit_caps: np.ndarray,
    g: int,
    w0: int,
    indices: np.ndarray,
    initial_rows: np.ndarray,
    initial_sibs: np.ndarray,
    step_leaves: np.ndarray,
    step_sibs: np.ndarray,
) -> int:
    """All FRI query rounds in one compiled call. Returns 0 on success, else
    (code << 32) | (round << 16) | sub — see fri_verify.c. All arrays must be
    contiguous uint64; shapes must already be validated (check_proof_shape)."""
    lib = _load()
    assert lib is not None
    a = lambda x: np.ascontiguousarray(x, dtype=np.uint64)  # noqa: E731
    arrs = dict(
        schedule=a(schedule), widths=a(oracle_widths), caps=a(oracle_caps),
        bsizes=a(batch_sizes), bpoints=a(batch_points), poly_oi=a(poly_oi),
        poly_pj=a(poly_pj), openings=a(openings), alpha=a(alpha), betas=a(betas),
        final=a(final_poly), ccaps=a(commit_caps), idx=a(indices),
        rows=a(initial_rows), isibs=a(initial_sibs), leaves=a(step_leaves),
        ssibs=a(step_sibs),
    )
    return int(
        lib.fri_verify_queries(
            int(lde_bits), len(arrs["idx"]),
            _ptr(arrs["schedule"]), len(arrs["schedule"]), len(arrs["widths"]),
            _ptr(arrs["widths"]), _ptr(arrs["caps"]), int(cap_height),
            len(arrs["bsizes"]), _ptr(arrs["bsizes"]), _ptr(arrs["bpoints"]),
            _ptr(arrs["poly_oi"]), _ptr(arrs["poly_pj"]), _ptr(arrs["openings"]),
            _ptr(arrs["alpha"]), _ptr(arrs["betas"]),
            _ptr(arrs["final"]), arrs["final"].size // 2, _ptr(arrs["ccaps"]),
            int(g), int(w0),
            _ptr(arrs["idx"]), _ptr(arrs["rows"]), _ptr(arrs["isibs"]),
            _ptr(arrs["leaves"]), _ptr(arrs["ssibs"]),
        )
    )


def eval_tape(tape, inputs: np.ndarray) -> np.ndarray:
    """Evaluate a ConstraintTape on an input vector (n_inputs, 2) -> the
    tape's output nodes as (n_out, 2) uint64."""
    lib = _load()
    assert lib is not None
    inputs = np.ascontiguousarray(inputs, dtype=np.uint64).reshape(-1, 2)
    assert inputs.shape[0] == tape.n_inputs
    n_ops = tape.ops.size
    values = np.empty((tape.n_inputs + n_ops, 2), dtype=np.uint64)
    values[: tape.n_inputs] = inputs
    lib.eval_tape(
        tape.ops.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        tape.ia.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        tape.ib.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        n_ops,
        _ptr(tape.pool),
        tape.n_inputs,
        _ptr(values),
    )
    return values[tape.out_ids]


def witness_tape_run(
    code: np.ndarray,
    consts: np.ndarray,
    vals: np.ndarray,
    written: np.ndarray,
    rounds_p: int,
) -> int:
    """Execute a witness-replay tape (plonk/witness_tape.py) in C. `vals` and
    `written` are modified in place; returns 0 ok, else (err << 32) | record."""
    lib = _load()
    assert lib is not None
    assert code.dtype == np.int32 and code.flags.c_contiguous
    assert vals.dtype == np.uint64 and vals.flags.c_contiguous
    assert written.dtype == np.uint8 and written.flags.c_contiguous
    return int(
        lib.wt_run(
            code.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            code.size,
            _ptr(np.ascontiguousarray(consts, dtype=np.uint64)),
            _ptr(vals),
            written.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            int(rounds_p),
        )
    )


def absorb_many(state: np.ndarray, buf: list, felts: np.ndarray) -> tuple[np.ndarray, list]:
    """Duplex-sponge absorption of a felt vector (overwrite mode): returns the
    updated 12-lane state and leftover input buffer."""
    lib = _load()
    assert lib is not None
    st = np.ascontiguousarray(state, dtype=np.uint64).copy()
    b = np.zeros(8, dtype=np.uint64)
    k = len(buf)
    if k:
        b[:k] = buf
    arr = np.ascontiguousarray(felts, dtype=np.uint64).ravel()
    k2 = int(lib.p2_absorb_many(_ptr(st), _ptr(b), k, _ptr(arr), arr.size))
    return st, [np.uint64(v) for v in b[:k2]]


def two_to_one_many(left: np.ndarray, right: np.ndarray) -> np.ndarray:
    """left/right (n, 4) -> parent digests (n, 4)."""
    lib = _load()
    assert lib is not None
    l = np.ascontiguousarray(left, dtype=np.uint64).reshape(-1, 4)
    r = np.ascontiguousarray(right, dtype=np.uint64).reshape(-1, 4)
    out = np.empty_like(l)
    lib.p2_two_to_one_many(_ptr(l), _ptr(r), l.shape[0], _ptr(out))
    return out
