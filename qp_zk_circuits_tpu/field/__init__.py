"""Goldilocks field layers.

`goldilocks` — JAX ops on uint32-pair lanes (runs on TPU VPU and on CPU).
`gf_np`     — numpy uint64 host mirror (witness generation, verifier, transcript).
`extension` — the quadratic extension F_p[X]/(X^2 - 7) (D = 2).
"""

from .gf_np import P as GOLDILOCKS_P  # noqa: F401
