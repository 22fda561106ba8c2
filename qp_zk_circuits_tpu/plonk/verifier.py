"""PLONK verifier (host): transcript re-derivation, vanishing check, FRI.

The standalone counterpart of `prover.py` — what the reference ships as the
no-std `qp-plonky2-verifier` crate for on-chain use (SURVEY §3.4: ~1.6 ms
leaf verify). Pure numpy/int host code with no device dependency.
"""

from __future__ import annotations

import numpy as np

from ..field import extension as ext
from ..field import gf_np as F
from ..fri.verifier import FriVerificationError, fri_verify
from ..hash import poseidon2 as ps
from . import transcript as ts
from .builder import CircuitData
from .proof import Proof, fri_instance, zs_pp_layout
from .prover import verify_vanishing_at_zeta


class VerificationError(Exception):
    pass


def verify(data: CircuitData, proof: Proof) -> None:
    """Raises VerificationError if the proof is invalid."""
    cfg = data.config
    pi_hash = ps.hash_no_pad(np.asarray(proof.public_inputs, dtype=np.uint64))

    ch = ts.Challenger()
    ch.observe_many(data.circuit_digest)
    ch.observe_many(pi_hash)
    ch.observe_cap(proof.wires_cap)
    betas = ch.challenge_many(cfg.num_challenges)
    gammas = ch.challenge_many(cfg.num_challenges)
    ch.observe_cap(proof.zs_pp_cap)
    alphas = ch.challenge_many(cfg.num_challenges)
    ch.observe_cap(proof.quotient_cap)
    zeta = ch.challenge_ext()
    g_n = F.primitive_root_of_unity(data.degree_bits)
    zeta_next = ext.scalar_mul(zeta.reshape(1, 2), g_n)[0]

    # structural checks on opening shapes
    o = proof.openings
    nz, npp_total = zs_pp_layout(cfg)
    expected = {
        "constants": data.const_cols.shape[0],
        "selectors": data.num_selectors,
        "sigmas": cfg.num_routed_wires,
        "wires": cfg.num_wires,
        "zs": nz,
        "zs_next": nz,
        "pps": npp_total,
        "quotient": cfg.num_challenges * cfg.max_quotient_degree_factor,
    }
    for name, want in expected.items():
        got = getattr(o, name)
        if np.asarray(got).shape != (want, 2):
            raise VerificationError(f"malformed opening set: {name}")

    # the vanishing identity at zeta
    if not verify_vanishing_at_zeta(data, o, pi_hash, alphas, betas, gammas, zeta):
        raise VerificationError("vanishing polynomial check failed at zeta")

    # FRI: openings observed, then the low-degree opening proof
    o.observe_into(ch)
    instance = fri_instance(data, zeta, zeta_next)
    fri_openings = [o.batch_zeta(), o.batch_zeta_next()]
    caps = [
        data.constants_oracle.cap,
        proof.wires_cap,
        proof.zs_pp_cap,
        proof.quotient_cap,
    ]
    num_polys = [
        data.num_preprocessed,
        cfg.num_wires,
        nz + npp_total,
        cfg.num_challenges * cfg.max_quotient_degree_factor,
    ]
    try:
        fri_verify(
            caps,
            num_polys,
            instance,
            fri_openings,
            proof.fri_proof,
            ch,
            cfg.fri_config,
            data.degree_bits,
        )
    except FriVerificationError as e:
        raise VerificationError(f"FRI verification failed: {e}") from e
