"""qp_zk_circuits_tpu — a TPU-native Plonky2-class zero-knowledge proving framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
Rust workspace `Quantus-Network/qp-zk-circuits` (and the `qp-plonky2` proving
engine it consumes): Goldilocks field arithmetic, Poseidon2 hashing, NTT/LDE,
Merkle commitments with caps, the PLONK IOP with FRI low-degree testing, a
circuit-builder DSL, the Wormhole leaf circuit, and recursive aggregation —
all organised so the hot polynomial pipeline runs batched on TPU (MXU/VPU via
jnp + Pallas) while graph-like host logic (witness generation, transcripts,
verification) runs vectorised on CPU.

Layer map (mirrors SURVEY.md §1):
  field/     Goldilocks p = 2^64 - 2^32 + 1 as u32-pair lanes (TPU) + u64 numpy (host)
  hash/      Poseidon2 width-12 permutation, sponge, Merkle trees with caps, keccak pinning
  poly/      radix-2 NTT / iNTT / coset LDE, batched over polynomials
  fri/       FRI commit / fold / query / verify (ConstantArityBits reduction)
  plonk/     circuit-builder DSL, gates, witness generators, prover, verifier, transcripts
  wormhole/  the Wormhole application layer: inputs, leaf circuit fragments, provers,
             verifiers, aggregation (private/public batch), proof pool, services
  parallel/  jax.sharding meshes, sharded NTT / Merkle / batch-prover layouts
  ops/       Pallas TPU kernels for the hot inner loops
  utils/     byte<->felt codecs, serialization, config policy
  tools/     circuit-builder CLI, memory/performance profiler
"""

__version__ = "0.1.0"
