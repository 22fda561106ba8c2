"""Shared utilities: byte<->felt codecs, serialization, config policy."""
