"""PLONK layer: circuit config, builder DSL, gates, prover, verifier, transcripts."""
