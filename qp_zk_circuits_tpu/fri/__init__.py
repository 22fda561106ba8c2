"""FRI low-degree testing: batched openings, commit/fold phase, queries, verification."""

from .config import FriConfig  # noqa: F401
