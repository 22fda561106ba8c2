"""Persistent AOT-compiled executable cache for the fused prover.

Round-3 measured ~900-1100 s of `warmup_fused` per canonical aggregation
shape EVEN with a warm XLA persistent cache: the XLA cache only skips the
backend compile, while the dominant cost here is Python tracing + StableHLO
lowering of the very large fused graph (the trace-time-unrolled transcript
schedule). This module serializes the COMPILED executable
(`jax.experimental.serialize_executable`) plus the output-layout table, so a
service restart skips tracing, lowering and compiling entirely — the TPU
analogue of the reference's `generated-bins/` artifact set (the reference
rebuilds circuits in seconds because its prover is precompiled Rust;
`wormhole/circuit/src/circuit.rs:12`).

Opt-in: set QZKT_AOT_CACHE to a directory (bench tools and the aggregator
service default it to a MACHINE-LOCAL cache dir, `default_cache_dir()`).
Entries are keyed by a sha256 over the circuit digest/shape/config, the rng
mode, the jax version + device kind, and a fingerprint of the compute-path
sources — any change to the graph-producing code invalidates the entry.

Security model: entries are pickles, so loading one executes code. They are
produced and consumed locally by the same operator (NOT consensus
artifacts), and two defenses keep a published artifact bundle from ever
reaching `pickle.loads`:

  1. the default cache location is machine-local (never inside a published
     `bins_dir` — an artifact set shipping an `aot/` subdirectory is inert);
  2. every entry is authenticated with HMAC-SHA256 under a machine-local
     secret (created 0600 outside any artifact dir); `load()` verifies the
     tag BEFORE unpickling, so files written by anyone without this
     machine's secret are rejected as cache misses.
"""

from __future__ import annotations

import hashlib
import hmac
import os
import pickle
from pathlib import Path

_SCHEMA = 3  # bump to invalidate all entries


def default_cache_dir() -> Path:
    """Machine-local cache root (never inside a published artifact dir)."""
    xdg = os.environ.get("XDG_CACHE_HOME")
    base = Path(xdg) if xdg else Path.home() / ".cache"
    return base / "qp_zk_circuits_tpu" / "aot"


def cache_dir() -> Path | None:
    d = os.environ.get("QZKT_AOT_CACHE")
    return Path(d) if d else None


def _machine_secret() -> bytes:
    """Machine-local HMAC key, created on first use with 0600 perms. Lives
    under the user cache dir regardless of where QZKT_AOT_CACHE points, so a
    hostile artifact directory can never supply both entry and key."""
    p = os.environ.get("QZKT_AOT_SECRET")
    path = Path(p) if p else default_cache_dir().parent / "aot_hmac_key"
    if not path.exists():
        path.parent.mkdir(parents=True, exist_ok=True)
        fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_EXCL, 0o600)
        try:
            os.write(fd, os.urandom(32))
        finally:
            os.close(fd)
    return path.read_bytes()


def _source_fingerprint() -> str:
    """sha256 over ALL compute-path package sources (field/poly/hash/fri/
    plonk — gates, quotient, challenger, configs included), so any change to
    graph-shaping code invalidates cached executables."""
    import qp_zk_circuits_tpu

    pkg = Path(qp_zk_circuits_tpu.__file__).parent
    h = hashlib.sha256()
    for sub in ("field", "poly", "hash", "fri", "plonk", "parallel"):
        for f in sorted((pkg / sub).glob("*.py")):
            h.update(f.name.encode())
            h.update(f.read_bytes())
    return h.hexdigest()


def entry_key(data, device_rng: bool, variant: str = "single") -> str:
    """Cache key for one (circuit, graph-variant) pair."""
    import jax

    dev = jax.devices()[0]
    h = hashlib.sha256()
    h.update(str(_SCHEMA).encode())
    h.update(jax.__version__.encode())
    h.update(getattr(dev, "device_kind", str(dev)).encode())
    h.update(str(dev.platform).encode())
    h.update(repr(tuple(int(x) for x in data.circuit_digest)).encode())
    h.update(str(data.degree_bits).encode())
    h.update(repr(data.config).encode())
    h.update(str(bool(device_rng)).encode())
    h.update(variant.encode())
    h.update(_source_fingerprint().encode())
    return h.hexdigest()


def load(key: str):
    """-> (compiled_callable, layout) or None."""
    d = cache_dir()
    if d is None:
        return None
    path = d / f"{key}.aotexec"
    if not path.exists():
        return None
    import jax
    from jax.experimental import serialize_executable as se

    try:
        raw = path.read_bytes()
        tag, payload = raw[:32], raw[32:]
        want = hmac.new(_machine_secret(), payload, hashlib.sha256).digest()
        if not hmac.compare_digest(tag, want):
            return None  # not written under this machine's secret: reject
        blob, in_tree, out_tree, layout = pickle.loads(payload)
        # the fused graph compiles for ONE device; the default restores onto
        # ALL backend devices (breaks under the 8-virtual-CPU test mesh)
        compiled = se.deserialize_and_load(
            blob, in_tree, out_tree, execution_devices=[jax.devices()[0]]
        )
        return compiled, layout
    except Exception:  # stale/incompatible entry: treat as a miss
        return None


def save(key: str, compiled, layout) -> bool:
    d = cache_dir()
    if d is None:
        return False
    from jax.experimental import serialize_executable as se

    try:
        blob, in_tree, out_tree = se.serialize(compiled)
    except Exception:
        return False  # backend without executable serialization
    d.mkdir(parents=True, exist_ok=True)
    payload = pickle.dumps((blob, in_tree, out_tree, list(layout)))
    tag = hmac.new(_machine_secret(), payload, hashlib.sha256).digest()
    tmp = d / f".{key}.tmp"
    tmp.write_bytes(tag + payload)
    os.replace(tmp, d / f"{key}.aotexec")
    return True
