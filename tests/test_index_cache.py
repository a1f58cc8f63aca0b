"""Versioned derived-store keying + stale-store GC (VERDICT r5 #1/#7).

A derived store built by an earlier package revision must never be
served to the current code (the stale-cache class behind the one red
driver row in round 5), and the orphaned directory must be removed so
repeated rounds don't accumulate under /tmp.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile

from isidorus_web_scraper_spark.sources import index_cache
from isidorus_web_scraper_spark.sources.index_cache import (
    STORE_REV,
    cached_store,
)

_SF = "/nonexistent/testdata/sf-cache-test"
_NAME = "cachetest"


def _cleanup():
    import shutil

    tmp = tempfile.gettempdir()
    for entry in os.listdir(tmp):
        if entry.startswith(f"iws-{_NAME}-"):
            shutil.rmtree(os.path.join(tmp, entry), ignore_errors=True)


def test_key_embeds_package_revision():
    path, built = cached_store(_SF, _NAME, "_BUILT")
    assert not built
    # the path must depend on the source stamp, not sf_dir alone
    legacy = hashlib.md5(_SF.encode()).hexdigest()[:12]
    assert not path.endswith(legacy)
    key = hashlib.md5(f"{_SF}|{STORE_REV}".encode()).hexdigest()[:12]
    assert path.endswith(key)


def test_stamp_changes_with_source(monkeypatch):
    # a different source stamp ⇒ a different store path ⇒ stores built
    # by other revisions are simply never addressed
    p1, _ = cached_store(_SF, _NAME, "_BUILT")
    monkeypatch.setattr(index_cache, "STORE_REV", "deadbeef0000")
    p2, _ = cached_store(_SF, _NAME, "_BUILT")
    assert p1 != p2


def test_gc_removes_legacy_and_stale_rev_dirs():
    _cleanup()
    tmp = tempfile.gettempdir()
    # plant a legacy (pre-r6, unversioned-key) store for this sf_dir
    legacy = os.path.join(
        tmp, f"iws-{_NAME}-{hashlib.md5(_SF.encode()).hexdigest()[:12]}"
    )
    os.makedirs(legacy, exist_ok=True)
    open(os.path.join(legacy, "_BUILT"), "w").write("ok")
    # plant an old-revision store for this sf_dir (meta records sf_dir)
    stale = os.path.join(tmp, f"iws-{_NAME}-aaaabbbbcccc")
    os.makedirs(stale, exist_ok=True)
    json.dump({"sf_dir": _SF, "rev": "old"}, open(os.path.join(stale, "_meta.json"), "w"))
    # plant a store for a DIFFERENT dataset — must survive
    other = os.path.join(tmp, f"iws-{_NAME}-ddddeeeeffff")
    os.makedirs(other, exist_ok=True)
    json.dump(
        {"sf_dir": "/some/other/sf", "rev": "old"},
        open(os.path.join(other, "_meta.json"), "w"),
    )
    path, built = cached_store(_SF, _NAME, "_BUILT")
    assert not built  # the stale stores are NOT served
    assert not os.path.exists(legacy)
    assert not os.path.exists(stale)
    assert os.path.exists(other)
    _cleanup()
    import shutil

    shutil.rmtree(other, ignore_errors=True)


def test_built_store_gets_meta_and_is_served():
    _cleanup()
    path, built = cached_store(_SF, _NAME, "_BUILT")
    assert not built
    os.makedirs(path, exist_ok=True)
    open(os.path.join(path, "_BUILT"), "w").write("ok")
    path2, built2 = cached_store(_SF, _NAME, "_BUILT")
    assert path2 == path and built2
    meta = json.load(open(os.path.join(path, "_meta.json")))
    assert meta["sf_dir"] == _SF and meta["rev"] == STORE_REV
    _cleanup()
