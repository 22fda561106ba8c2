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
service default it to `<bins_dir>/aot`). Entries are keyed by a sha256 over
the circuit digest/shape/config, the rng mode, the jax version + device
kind, and a fingerprint of the compute-path sources — any change to the
graph-producing code invalidates the entry. Entries are pickles produced
and consumed locally by the same operator (NOT consensus artifacts — the
raw-byte pinning rules of wormhole/artifacts.py do not apply to this
machine-local compile cache).
"""

from __future__ import annotations

import hashlib
import os
import pickle
from pathlib import Path

_SCHEMA = 2  # bump to invalidate all entries


def cache_dir() -> Path | None:
    d = os.environ.get("QZKT_AOT_CACHE")
    return Path(d) if d else None


def _source_fingerprint() -> str:
    """sha256 over the compute-path sources that shape the fused graph."""
    import qp_zk_circuits_tpu.field.extension as m_ext
    import qp_zk_circuits_tpu.field.goldilocks as m_gl
    import qp_zk_circuits_tpu.fri.prover as m_fri
    import qp_zk_circuits_tpu.hash.merkle as m_mk
    import qp_zk_circuits_tpu.hash.poseidon2 as m_ps
    import qp_zk_circuits_tpu.plonk.prover_fused as m_pf
    import qp_zk_circuits_tpu.plonk.vanishing as m_v
    import qp_zk_circuits_tpu.poly.ntt as m_ntt

    h = hashlib.sha256()
    for mod in (m_pf, m_gl, m_ext, m_ntt, m_ps, m_mk, m_fri, m_v):
        h.update(Path(mod.__file__).read_bytes())
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
        blob, in_tree, out_tree, layout = pickle.loads(path.read_bytes())
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
    tmp = d / f".{key}.tmp"
    tmp.write_bytes(pickle.dumps((blob, in_tree, out_tree, list(layout))))
    os.replace(tmp, d / f"{key}.aotexec")
    return True
