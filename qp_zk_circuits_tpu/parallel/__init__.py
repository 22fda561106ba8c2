"""Multi-chip parallelism: device meshes and sharded prover pipelines."""
