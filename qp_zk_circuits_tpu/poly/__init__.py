"""Polynomial layer: batched radix-2 NTT / iNTT / coset LDE over Goldilocks."""

from .ntt import coset_lde_j, intt_j, ntt_j  # noqa: F401
