"""Pallas TPU kernels for the hot field ops.

The jnp layer (`field/goldilocks.py`) is the correctness oracle and the
default path; kernels here fuse its u32-pair limb arithmetic into single
VMEM-resident passes for the bandwidth-bound stages (NTT butterflies,
Poseidon rounds, quotient combination). Round-1 seeds the pattern with the
fused multiply; round-2 extends to the full NTT stage and Poseidon round
kernels per /opt/skills/guides/pallas_guide.md."""
