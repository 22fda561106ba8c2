"""Proof container + the canonical opening schedule shared by prover/verifier."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..fri.prover import FriBatchInfo, FriInstance, FriProof
from .vanishing import num_partial_products


@dataclass
class OpeningSet:
    """All polynomial openings, grouped by role. Shapes: (k, 2) extension."""

    constants: np.ndarray  # (num_const_cols, 2)
    selectors: np.ndarray  # (num_selectors, 2)
    sigmas: np.ndarray  # (num_routed, 2)
    wires: np.ndarray  # (num_wires, 2)
    zs: np.ndarray  # (num_challenges, 2)
    zs_next: np.ndarray  # (num_challenges, 2) — at g*zeta
    pps: np.ndarray  # (num_challenges * npp, 2)
    quotient: np.ndarray  # (num_challenges * qdf, 2)

    def batch_zeta(self) -> np.ndarray:
        return np.concatenate(
            [self.constants, self.selectors, self.sigmas, self.wires, self.zs, self.pps, self.quotient],
            axis=0,
        )

    def batch_zeta_next(self) -> np.ndarray:
        return self.zs_next

    def observe_into(self, challenger) -> None:
        challenger.observe_many(self.batch_zeta())
        challenger.observe_many(self.batch_zeta_next())


@dataclass
class Proof:
    wires_cap: np.ndarray
    zs_pp_cap: np.ndarray
    quotient_cap: np.ndarray
    openings: OpeningSet
    fri_proof: FriProof
    public_inputs: np.ndarray


def zs_pp_layout(config) -> tuple[int, int]:
    """(num Z cols, num pp cols). Z columns first, then pps per challenge."""
    npp = num_partial_products(config.num_routed_wires, config.max_quotient_degree_factor)
    return config.num_challenges, config.num_challenges * npp


def fri_instance(data, zeta, zeta_next) -> FriInstance:
    """Oracles: 0=constants, 1=wires, 2=zs_pp, 3=quotient."""
    cfg = data.config
    nz, npp_total = zs_pp_layout(cfg)
    nq = cfg.num_challenges * cfg.max_quotient_degree_factor
    batch1 = (
        [(0, k) for k in range(data.num_preprocessed)]
        + [(1, j) for j in range(cfg.num_wires)]
        + [(2, j) for j in range(nz + npp_total)]
        + [(3, j) for j in range(nq)]
    )
    batch2 = [(2, c) for c in range(nz)]
    return FriInstance(
        batches=(
            FriBatchInfo(point=(int(zeta[0]), int(zeta[1])), polys=tuple(batch1)),
            FriBatchInfo(point=(int(zeta_next[0]), int(zeta_next[1])), polys=tuple(batch2)),
        )
    )
