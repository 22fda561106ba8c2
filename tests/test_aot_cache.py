"""AOT executable cache (plonk/aot_cache.py): key stability, HMAC gating.

The cache stores pickles of compiled executables, so its security properties
are load-bearing (ADVICE r4 high): entries must be authenticated under a
machine-local secret BEFORE unpickling, and the default location must be
machine-local — never the published artifact directory.
"""

import os
import pathlib
import pickle

import numpy as np
import pytest


@pytest.fixture()
def cache_env(tmp_path, monkeypatch):
    monkeypatch.setenv("QZKT_AOT_CACHE", str(tmp_path / "aot"))
    monkeypatch.setenv("QZKT_AOT_SECRET", str(tmp_path / "secret"))
    return tmp_path


def _compiled():
    import jax

    return jax.jit(lambda v: v * 2).lower(
        jax.ShapeDtypeStruct((8,), "uint32")
    ).compile()


def test_save_load_roundtrip_and_layout(cache_env):
    from qp_zk_circuits_tpu.plonk import aot_cache

    key = "k" * 64
    assert aot_cache.save(key, _compiled(), [3, 1, 4]) is True
    hit = aot_cache.load(key)
    assert hit is not None
    compiled, layout = hit
    assert layout == [3, 1, 4]
    import jax

    out = compiled(jax.numpy.arange(8, dtype="uint32"))
    assert np.array_equal(np.asarray(out), np.arange(8, dtype=np.uint32) * 2)


def test_tampered_entry_is_a_miss(cache_env):
    from qp_zk_circuits_tpu.plonk import aot_cache

    key = "k" * 64
    aot_cache.save(key, _compiled(), [])
    p = pathlib.Path(os.environ["QZKT_AOT_CACHE"]) / f"{key}.aotexec"
    raw = bytearray(p.read_bytes())
    raw[40] ^= 1  # flip one payload bit
    p.write_bytes(bytes(raw))
    assert aot_cache.load(key) is None


def test_unauthenticated_pickle_never_unpickled(cache_env):
    """An attacker-shipped entry (no knowledge of the machine secret) must be
    rejected by the HMAC check BEFORE pickle.loads runs."""
    from qp_zk_circuits_tpu.plonk import aot_cache

    class Boom:
        def __reduce__(self):
            return (pytest.fail, ("pickle.loads reached on unauthenticated entry",))

    key = "m" * 64
    d = pathlib.Path(os.environ["QZKT_AOT_CACHE"])
    d.mkdir(parents=True, exist_ok=True)
    (d / f"{key}.aotexec").write_bytes(b"\x00" * 32 + pickle.dumps(Boom()))
    assert aot_cache.load(key) is None


def test_secret_file_permissions(cache_env):
    from qp_zk_circuits_tpu.plonk import aot_cache

    aot_cache._machine_secret()
    mode = os.stat(os.environ["QZKT_AOT_SECRET"]).st_mode & 0o777
    assert mode == 0o600


def test_default_cache_dir_is_machine_local(monkeypatch, tmp_path):
    from qp_zk_circuits_tpu.plonk import aot_cache

    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "xdg"))
    d = aot_cache.default_cache_dir()
    assert str(d).startswith(str(tmp_path / "xdg"))
    # and never inside a bins_dir-style artifact directory by construction
    assert "bins" not in str(d)


def test_source_fingerprint_changes_with_sources(cache_env, monkeypatch):
    """The fingerprint must cover gate/quotient code (ADVICE r4 medium):
    hashing the whole plonk package means any gate change flips the key."""
    from qp_zk_circuits_tpu.plonk import aot_cache

    fp1 = aot_cache._source_fingerprint()
    import qp_zk_circuits_tpu.plonk.gates as gates_mod

    real = pathlib.Path(gates_mod.__file__).read_bytes()
    orig = pathlib.Path.read_bytes

    def fake(self):
        if str(self).endswith("gates.py"):
            return real + b"\n# mutated"
        return orig(self)

    monkeypatch.setattr(pathlib.Path, "read_bytes", fake)
    assert aot_cache._source_fingerprint() != fp1


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
