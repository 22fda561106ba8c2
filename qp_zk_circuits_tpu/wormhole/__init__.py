"""The Wormhole application layer: inputs, leaf circuit, provers, verifiers,
aggregation (private/public batch), proof pool and miner services."""
