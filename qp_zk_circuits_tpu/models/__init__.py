"""Flagship pipelines ("models" in the driver's sense): the provers.

The framework's deployable units are proving pipelines rather than neural
networks; this package re-exports them under one roof:

  * `WormholeProver` / `WormholeVerifier` — the leaf proof pipeline;
  * `PrivateBatchCircuit` / `PrivateBatchProver` — the ZK aggregation layer;
  * `PublicBatchCircuit` / `PublicBatchProver` — the public aggregation layer;
  * `batch_commit_step` — the sharded multi-chip commitment core
    (`__graft_entry__.entry` wraps it).
"""

from ..parallel.mesh import batch_commit_step, make_prover_mesh, sharded_batch_commit  # noqa: F401
from ..wormhole.private_batch import PrivateBatchCircuit, PrivateBatchProver  # noqa: F401
from ..wormhole.prover import WormholeProver  # noqa: F401
from ..wormhole.public_batch import PublicBatchCircuit, PublicBatchProver  # noqa: F401
from ..wormhole.verifier import WormholeVerifier  # noqa: F401
