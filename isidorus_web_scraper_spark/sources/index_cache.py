"""Per-sf_dir build-once store location (shared by every derived-index
query).

The driver-contract queries that serve answers from a persisted store
(token/positional/compacted postings, trigram grams, IVF cells, the
LSH dedup index, doclens) all key their store to the input directory
and build it on first touch. One helper so the idiom — and any future
fix to its keying or staleness rules — lives in one place instead of
seven."""

from __future__ import annotations

import hashlib
import os
import tempfile


def cached_store(sf_dir: str, name: str, marker: str) -> tuple[str, bool]:
    """(store path, already built?) for the derived store ``name`` over
    the dataset at ``sf_dir``. ``marker`` is the store's completion
    sentinel relative to the store root (each store format names its
    own: a parquet ``_SUCCESS``, a meta json, a ``_BUILT`` flag)."""
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), f"iws-{name}-{key}")
    return path, os.path.exists(os.path.join(path, marker))
