"""Atomic-commit parquet warehouse (Iceberg-shaped, jar-free).

The north_rule asks for Iceberg tables with per-round snapshots; the
sandbox has no Iceberg runtime jar, so this module provides the same
contract on plain parquet:

- every append/overwrite is a *commit*: data is written to a staging
  directory, then a manifest JSON is atomically swapped (write tmp +
  ``os.replace``), so readers never observe a half-written table and a
  killed crawl resumes from the last committed round (Iceberg snapshot
  semantics, reference analog: at-least-once SQS + idempotent writes,
  SURVEY.md §2.10);
- commits carry key/value properties (e.g. ``round``) — reading "just
  round N" prunes to that commit's files without touching the rest
  (Iceberg snapshot/partition pruning analog);
- ``merge`` implements MERGE INTO (upsert) as overwrite-with-join, the
  rendition of the reference's Postgres upserts
  (`workers/writer/repositories/db_repository.go:70-118`) and DynamoDB
  UpdateItem (`dynamo_client.go:56-106`).

On a real cluster this module swaps for ``df.writeTo(tbl).append()`` on
an Iceberg catalog; every call site goes through this API only.
"""

from __future__ import annotations

import contextlib
import fcntl
import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema import TABLES

_MANIFEST = "_manifest.json"


class Warehouse:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # --- manifest plumbing -------------------------------------------------
    def _table_dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _manifest_path(self, table: str) -> str:
        return os.path.join(self._table_dir(table), _MANIFEST)

    def _read_manifest(self, table: str) -> dict:
        path = self._manifest_path(table)
        if not os.path.exists(path):
            return {"commits": []}
        with open(path) as f:
            return json.load(f)

    def _swap_manifest(self, table: str, manifest: dict) -> None:
        path = self._manifest_path(table)
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)  # atomic on POSIX

    @contextlib.contextmanager
    def _locked(self, table: str, name: str = "_lock"):
        """Per-table writer lock (flock — works across processes AND
        across threads, since every call opens a fresh fd / open file
        description). Two tiers:

        - ``_lock``: held ONLY around a read-manifest → swap window
          (microseconds) — every manifest mutation takes it, so a merge
          or delete can no longer swap in a stale commit list and drop a
          commit appended concurrently by the crawl's threaded fan-out;
        - ``_rewrite_lock``: held for a whole merge/delete/compact so
          two rewriting writers never race each other's file rewrites
          (appends don't take it — they stay concurrent with rewrites,
          reconciled by the CAS re-read under ``_lock``).
        """
        os.makedirs(self._table_dir(table), exist_ok=True)
        fd = open(os.path.join(self._table_dir(table), name), "w")
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            yield
        finally:
            fcntl.flock(fd, fcntl.LOCK_UN)
            fd.close()

    # --- write paths -------------------------------------------------------
    def _stage(self, table: str, df: DataFrame) -> str:
        """Write df to a new staging dir; return its relative name."""
        rel = f"commit-{uuid.uuid4().hex}"
        out = os.path.join(self._table_dir(table), rel)
        df.write.mode("errorifexists").parquet(out)
        return rel

    def append(self, table: str, df: DataFrame, props: dict | None = None) -> None:
        """Atomic append: stage data (outside the lock — the long part),
        then read-manifest → swap under the writer lock."""
        os.makedirs(self._table_dir(table), exist_ok=True)
        rel = self._stage(table, df)
        with self._locked(table):
            manifest = self._read_manifest(table)
            manifest["commits"].append({"dir": rel, "props": props or {}})
            self._swap_manifest(table, manifest)

    def append_rows(
        self,
        table: str,
        rows: list[tuple],
        schema_ddl: str,
        props: dict | None = None,
    ) -> None:
        """Atomic append of a DRIVER-RESIDENT handful of rows (e.g. the
        one metrics row per crawl round) written directly with pyarrow —
        no Spark job. A 1-row ``append`` costs a full createDataFrame +
        parquet job + commit (~0.4 s measured per crawl round, guide §5:
        the driver should do almost no data work — and a 1-row Spark
        job is exactly that inverted). Same commit layout and manifest
        CAS as ``append``; the parquet types mirror the DDL so readers
        union these files with Spark-written commits seamlessly. Only
        for driver-small row sets — data-sized frames go through
        ``append``."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        _PA = {
            "long": pa.int64(),
            "bigint": pa.int64(),
            "int": pa.int32(),
            "integer": pa.int32(),
            "string": pa.string(),
            "boolean": pa.bool_(),
            "double": pa.float64(),
        }
        fields = []
        for part in schema_ddl.split(","):
            name, typ = part.strip().rsplit(" ", 1)
            fields.append(pa.field(name, _PA[typ.lower()]))
        schema = pa.schema(fields)
        arrays = [
            pa.array([r[i] for r in rows], type=f.type)
            for i, f in enumerate(fields)
        ]
        os.makedirs(self._table_dir(table), exist_ok=True)
        rel = f"commit-{uuid.uuid4().hex}"
        out = os.path.join(self._table_dir(table), rel)
        os.makedirs(out)
        pq.write_table(
            pa.Table.from_arrays(arrays, schema=schema),
            os.path.join(out, "part-00000.parquet"),
        )
        with self._locked(table):
            manifest = self._read_manifest(table)
            manifest["commits"].append({"dir": rel, "props": props or {}})
            self._swap_manifest(table, manifest)

    def overwrite(self, table: str, df: DataFrame, props: dict | None = None) -> None:
        """Atomic overwrite: manifest points only at the new commit."""
        os.makedirs(self._table_dir(table), exist_ok=True)
        rel = self._stage(table, df)
        with self._locked(table):
            old = [c["dir"] for c in self._read_manifest(table)["commits"]]
            self._swap_manifest(table, {"commits": [{"dir": rel, "props": props or {}}]})
        for d in old:  # orphans are safe to GC after the swap
            shutil.rmtree(os.path.join(self._table_dir(table), d), ignore_errors=True)

    @staticmethod
    def _stamp_rewrite(props: dict, asof_valid_from: int | None) -> dict:
        """Mark a rewritten (merged/deleted-from) commit so ``read_asof``
        never passes its post-rewrite contents off as an older snapshot.
        With a round bound the stamp is ``asof_valid_from`` (monotone
        max across rewrites); without one the commit is flagged
        ``merged`` = asof-unreconstructible at ANY bound."""
        out = dict(props)
        if asof_valid_from is None:
            out["merged"] = True
        else:
            out["asof_valid_from"] = max(
                int(asof_valid_from), int(out.get("asof_valid_from", -1))
            )
        return out

    def merge(
        self,
        table: str,
        updates: DataFrame,
        keys: list[str],
        commit_pred=None,
        asof_valid_from: int | None = None,
    ) -> None:
        """MERGE INTO table USING updates ON keys: matched→update, else insert.

        Updates win column-wise via coalesce(update, current) so partial
        updates (e.g. a summary arriving for an existing page,
        `db_repository.go:101-118`) preserve untouched columns.

        ``commit_pred(props)``: when given, commits it rejects provably
        contain no matching keys (e.g. their round tag is absent from
        the updates) and are kept byte-identical — the Iceberg
        copy-on-write file-pruning analog; only matching commits are
        rewritten (concurrently, props preserved) plus new commits
        for the not-matched-anywhere inserts, tagged with their round
        value so future round-pruned reads/rewrites still see them.
        Without it, the legacy whole-table overwrite runs (fine for
        small tables like jobs).

        ``asof_valid_from``: the earliest ``read_asof`` bound at which
        this merge's output may appear in a snapshot (the engine passes
        the round the merge logically belongs to). Rewritten and
        inserted commits are stamped with it; a snapshot read BELOW the
        stamp fails loudly instead of silently returning post-merge
        rows under an old round tag. Omitted ⇒ the rewritten commits
        are flagged asof-unreconstructible at any bound.

        Concurrency: the whole rewrite runs under the table's
        ``_rewrite_lock`` (rewriters serialize against each other); the
        final manifest swap re-reads the manifest under ``_lock`` and
        grafts the rewrites onto the FRESH commit list, so commits
        appended concurrently (crawl fan-out racing an enrich) are
        carried over instead of silently dropped. Rows appended after
        this merge's snapshot are not updated by it — the append
        logically happened after the merge.
        """
        if commit_pred is None:
            with self._locked(table, "_rewrite_lock"):
                snapshot = self._read_manifest(table)["commits"]
                current = self._read_commits(table, snapshot)
                non_keys = [c for c in current.columns if c not in keys]
                # full_outer keeps unmatched current rows (no-op), matched
                # rows (update wins per column), and new rows (insert).
                joined = current.alias("t").join(updates.alias("u"), keys, "full_outer")
                rel = self._stage(
                    table,
                    joined.select(
                        *[
                            F.coalesce(F.col(f"u.{k}"), F.col(f"t.{k}")).alias(k)
                            for k in keys
                        ],
                        *[
                            F.coalesce(F.col(f"u.{c}"), F.col(f"t.{c}")).alias(c)
                            for c in non_keys
                        ],
                    ),
                )
                # CAS graft (same rule as the predicate path): the merged
                # commit replaces exactly the SNAPSHOTTED commits; commits
                # appended since the snapshot are carried over, not dropped
                # (engine B's start() append must survive engine A's
                # _finalize merge on a shared warehouse).
                snap_dirs = {c["dir"] for c in snapshot}
                with self._locked(table):
                    fresh = self._read_manifest(table)
                    kept = [c for c in fresh["commits"] if c["dir"] not in snap_dirs]
                    self._swap_manifest(
                        table,
                        {
                            "commits": [
                                {
                                    "dir": rel,
                                    "props": self._stamp_rewrite(
                                        {}, asof_valid_from
                                    ),
                                }
                            ]
                            + kept
                        },
                    )
                for d in snap_dirs:
                    shutil.rmtree(
                        os.path.join(self._table_dir(table), d), ignore_errors=True
                    )
            return

        from concurrent.futures import ThreadPoolExecutor

        with self._locked(table, "_rewrite_lock"):
            current = self.read(table)
            non_keys = [c for c in current.columns if c not in keys]
            manifest = self._read_manifest(table)
            touch = [c for c in manifest["commits"] if commit_pred(c["props"])]
            upd = updates.persist()
            try:
                # inserts = update keys matched NOWHERE in the table (checked
                # against the full table, not just the touched commits)
                inserts = upd.join(current.select(keys), keys, "left_anti").select(
                    *[F.col(k) for k in keys],
                    *[F.col(c) for c in non_keys],
                )

                def _rewrite(c: dict) -> str:
                    cur = self.spark.read.parquet(
                        os.path.join(self._table_dir(table), c["dir"])
                    )
                    # left join: every current row kept, matched ones updated
                    # column-wise; inserts go to their own commit below
                    joined = cur.alias("t").join(
                        F.broadcast(upd).alias("u"), keys, "left"
                    )
                    return self._stage(
                        table,
                        joined.select(
                            *[F.col(f"t.{k}").alias(k) for k in keys],
                            *[
                                F.coalesce(F.col(f"u.{c}"), F.col(f"t.{c}")).alias(c)
                                for c in non_keys
                            ],
                        ),
                    )

                with ThreadPoolExecutor(max_workers=min(8, max(1, len(touch)))) as pool:
                    staged = {
                        c["dir"]: d for c, d in zip(touch, pool.map(_rewrite, touch))
                    }
                # insert commits carry their round tag (one commit per
                # distinct round) — an untagged commit would defeat every
                # future round-pruned read/rewrite of these rows
                insert_commits: list[dict] = []
                if not inserts.isEmpty():
                    if "round" in inserts.columns:
                        rounds = [
                            r[0]
                            for r in inserts.select("round").distinct().collect()
                        ]
                        for rd in rounds:
                            insert_commits.append(
                                {
                                    "dir": self._stage(
                                        table, inserts.filter(F.col("round") == rd)
                                    ),
                                    "props": self._stamp_rewrite(
                                        {"round": int(rd)}, asof_valid_from
                                    ),
                                }
                            )
                    else:
                        insert_commits.append(
                            {
                                "dir": self._stage(table, inserts),
                                "props": self._stamp_rewrite({}, asof_valid_from),
                            }
                        )
                with self._locked(table):
                    fresh = self._read_manifest(table)
                    # CAS graft: rewrites replace their commit in the FRESH
                    # list; commits appended since the snapshot are kept.
                    # (No commit can have vanished — removers hold
                    # _rewrite_lock, which we own.)
                    new_commits = [
                        {
                            "dir": staged[c["dir"]],
                            "props": self._stamp_rewrite(
                                c["props"], asof_valid_from
                            ),
                        }
                        if c["dir"] in staged
                        else c
                        for c in fresh["commits"]
                    ] + insert_commits
                    self._swap_manifest(table, {"commits": new_commits})
                for c in touch:
                    shutil.rmtree(
                        os.path.join(self._table_dir(table), c["dir"]),
                        ignore_errors=True,
                    )
            finally:
                upd.unpersist()

    def delete_where(
        self,
        table: str,
        predicate: str,
        commit_pred=None,
        asof_valid_from: int | None = None,
    ) -> None:
        """Predicate delete (Iceberg DELETE FROM analog; SURVEY.md J9),
        copy-on-write at COMMIT granularity — the Iceberg file-pruning
        analog that keeps a 100-TB delete from rewriting the table:

        - ``commit_pred(props) == False`` ⇒ the commit provably holds no
          matching rows (e.g. its round tag is outside the target
          scraping's [created_round, completed_round] window) and is
          kept byte-identical with ZERO I/O;
        - matching commits are filtered and rewritten individually,
          concurrently, preserving their props (round tags survive, so
          pruned reads still work after a delete);
        - one atomic manifest swap publishes all rewrites together.

        ``asof_valid_from``: as in ``merge`` — rewritten commits are
        stamped so a ``read_asof`` below the bound fails loudly rather
        than passing post-delete contents off as an older snapshot.
        """
        from concurrent.futures import ThreadPoolExecutor

        with self._locked(table, "_rewrite_lock"):
            manifest = self._read_manifest(table)
            rewrite = [
                c
                for c in manifest["commits"]
                if commit_pred is None or commit_pred(c["props"])
            ]
            if not rewrite:
                return

            def _rewrite(c: dict) -> str:
                df = self.spark.read.parquet(
                    os.path.join(self._table_dir(table), c["dir"])
                ).filter(f"NOT ({predicate})")
                return self._stage(table, df)

            with ThreadPoolExecutor(max_workers=min(8, len(rewrite))) as pool:
                staged = {
                    c["dir"]: d for c, d in zip(rewrite, pool.map(_rewrite, rewrite))
                }
            with self._locked(table):
                fresh = self._read_manifest(table)
                # CAS graft (see merge): concurrent appends survive; the
                # delete covered the table as of its snapshot only.
                new_commits = [
                    {
                        "dir": staged[c["dir"]],
                        "props": self._stamp_rewrite(c["props"], asof_valid_from),
                    }
                    if c["dir"] in staged
                    else c
                    for c in fresh["commits"]
                ]
                self._swap_manifest(table, {"commits": new_commits})
            for c in rewrite:  # orphans safe to GC after the swap
                shutil.rmtree(
                    os.path.join(self._table_dir(table), c["dir"]), ignore_errors=True
                )

    @staticmethod
    def _round_range(props: dict) -> tuple[int, int] | None:
        """The [min, max] round span a commit's rows can occupy, from its
        props — a plain round tag, or the range a prior compaction kept.
        None = untagged (can't bound it)."""
        if "round" in props:
            return props["round"], props["round"]
        if "round_min" in props and "round_max" in props:
            return props["round_min"], props["round_max"]
        return None

    def compact(
        self,
        table: str,
        target_files: int | None = None,
        upto_round: int | None = None,
        refold_compacted: bool = True,
    ) -> None:
        """Bin-pack many commits into ONE (Iceberg ``rewrite_data_files``
        analog). A 64-round crawl leaves ~64×P files per table;
        post-completion reads reopen all of them.

        Round props are LOAD-BEARING for resume (frontier round reads,
        metrics ``_next_round``, partial-round rollback) and for delete
        pruning windows, so compaction never silently drops them:

        - a table with round-tagged commits REQUIRES ``upto_round``;
          only commits provably complete (max round < upto_round) are
          folded, and the folded commit carries ``round_min/round_max``
          so round-window predicates (delete pruning) still bound it —
          rollback/pruned reads target rounds ≥ upto_round, which live
          in the untouched commits;
        - untagged tables fold wholesale as before.

        ``target_files`` coalesces the rewrite (default: leave
        partitioning to the current plan). ``refold_compacted=False``
        leaves prior compacted commits untouched (the in-crawl periodic
        mode: each pass folds only the NEW small per-round commits, so
        total compaction I/O stays linear in data written instead of
        quadratic in crawl length — Iceberg bin-pack-new-files analog).

        CONTRACT: round-exact pruned reads (``read(table, {'round': r})``)
        cannot see folded commits, so ``upto_round`` must not exceed the
        smallest round any future pruned read of this table will target
        (for the frontier: the next unconsumed round). ``read()`` enforces
        this — a round-exact read whose round falls inside a compacted
        commit's span raises instead of silently dropping those rows."""
        with self._locked(table, "_rewrite_lock"):
            manifest = self._read_manifest(table)
            commits = manifest["commits"]
            if any("round" in c["props"] or "round_max" in c["props"] for c in commits):
                if upto_round is None:
                    raise ValueError(
                        f"table '{table}' carries load-bearing round tags; pass "
                        "upto_round=N to compact only completed rounds (< N)"
                    )
                doomed = []
                for c in commits:
                    if not refold_compacted and c["props"].get("compacted"):
                        continue
                    rng = self._round_range(c["props"])
                    if rng is not None and rng[1] < upto_round:
                        doomed.append(c)
            else:
                doomed = [
                    c
                    for c in commits
                    if refold_compacted or not c["props"].get("compacted")
                ]
            if len(doomed) < 2:
                return  # nothing to fold
            paths = [os.path.join(self._table_dir(table), c["dir"]) for c in doomed]
            df = self.spark.read.parquet(*paths)
            if target_files:
                df = df.coalesce(target_files)
            rel = self._stage(table, df)
            spans = [self._round_range(c["props"]) for c in doomed]
            props: dict = {"compacted": True}
            if any(s is not None for s in spans):
                props["round_min"] = min(s[0] for s in spans if s is not None)
                props["round_max"] = max(s[1] for s in spans if s is not None)
            # rewrite stamps survive folding — else compaction would
            # launder a merged commit back into asof-readability
            if any(c["props"].get("merged") for c in doomed):
                props["merged"] = True
            avf = [
                c["props"]["asof_valid_from"]
                for c in doomed
                if "asof_valid_from" in c["props"]
            ]
            if avf:
                props["asof_valid_from"] = max(avf)
            with self._locked(table):
                fresh = self._read_manifest(table)
                doomed_dirs = {c["dir"] for c in doomed}
                kept = [c for c in fresh["commits"] if c["dir"] not in doomed_dirs]
                self._swap_manifest(
                    table, {"commits": [{"dir": rel, "props": props}] + kept}
                )
            for c in doomed:
                shutil.rmtree(
                    os.path.join(self._table_dir(table), c["dir"]), ignore_errors=True
                )

    # --- read paths --------------------------------------------------------
    def _read_commits(self, table: str, commits: list[dict]) -> DataFrame:
        """Read exactly the given commit list (a manifest snapshot)."""
        paths = [os.path.join(self._table_dir(table), c["dir"]) for c in commits]
        if not paths:
            schema = TABLES.get(table, (None, None))[0]
            if schema is None:
                schema = T.StructType([])
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(*paths)

    def read(self, table: str, props_filter: dict | None = None) -> DataFrame:
        """Read committed data; props_filter prunes to matching commits
        (e.g. {'round': 3} reads only round 3's files).

        A round-exact pruned read can never see rows folded into a
        compacted commit (those carry only round_min/round_max). That is
        safe by construction when compaction folds only CONSUMED rounds
        (CrawlEngine._compact_tables' bound rule) — but if a caller
        compacted past that bound, silently returning the unfolded subset
        would corrupt the crawl, so we fail loudly instead."""
        manifest = self._read_manifest(table)
        commits = manifest["commits"]
        if props_filter:
            if "round" in props_filter:
                r = props_filter["round"]
                for c in commits:
                    rng = self._round_range(c["props"])
                    if (
                        c["props"].get("compacted")
                        and rng is not None
                        and rng[0] <= r <= rng[1]
                        and c["props"].get("round") != r
                    ):
                        raise RuntimeError(
                            f"read({table!r}, round={r}): rows for round {r} were "
                            f"folded into compacted commit {c['dir']} "
                            f"(span {rng[0]}..{rng[1]}); a round-exact read can no "
                            "longer isolate them. compact() was called with an "
                            "upto_round past this table's still-live rounds."
                        )
            commits = [
                c
                for c in commits
                if all(c["props"].get(k) == v for k, v in props_filter.items())
            ]
        return self._read_commits(table, commits)

    def read_asof(self, table: str, upto_round: int) -> DataFrame:
        """Snapshot read (Iceberg time-travel analog at the engine's
        round granularity): the table as committed at the END of round
        ``upto_round`` — commits whose round tag is ≤ the bound, plus
        untagged commits (init/start() data, which precede every round).
        Lineage-debugging / reproducibility read: "train on the corpus
        exactly as it stood after round R" without copying anything —
        the manifest prunes newer commits so their files are never
        opened (inputFiles-pinned in tests).

        NOTE seen/frontier rows produced DURING round r are tagged r+1
        (they are round r+1's input); a caller wanting "as round r+1
        started" passes upto_round=r+1 for those two tables.

        A compacted commit qualifies only if its WHOLE span does
        (round_max ≤ upto_round); a span straddling the boundary cannot
        be split, so — like round-exact pruned reads — this fails
        loudly rather than silently returning a subset.

        Commits rewritten in place by ``merge``/``delete_where`` carry
        an ``asof_valid_from`` stamp (or a bare ``merged`` flag when the
        rewriter passed no round): their contents are post-rewrite, so a
        snapshot read below the stamp — or at any bound for an
        unstamped rewrite — also fails loudly instead of returning
        rows that did not exist at round ``upto_round``."""
        manifest = self._read_manifest(table)
        keep = []
        for c in manifest["commits"]:
            rng = self._round_range(c["props"])
            qualifies = rng is None or rng[1] <= upto_round
            if qualifies and (
                c["props"].get("merged")
                or c["props"].get("asof_valid_from", upto_round) > upto_round
            ):
                raise RuntimeError(
                    f"read_asof({table!r}, {upto_round}): commit {c['dir']} was "
                    "rewritten in place by merge()/delete_where() "
                    + (
                        f"valid from round {c['props']['asof_valid_from']}"
                        if "asof_valid_from" in c["props"]
                        else "with no round bound"
                    )
                    + "; its contents are post-rewrite, so this snapshot is no "
                    "longer reconstructible at this bound."
                )
            if rng is None:
                keep.append(c)  # untagged = pre-round data
            elif rng[1] <= upto_round:
                keep.append(c)
            elif c["props"].get("compacted") and rng[0] <= upto_round:
                raise RuntimeError(
                    f"read_asof({table!r}, {upto_round}): compacted commit "
                    f"{c['dir']} spans rounds {rng[0]}..{rng[1]} across the "
                    "asof boundary and cannot be split. Snapshot reads at "
                    "this round are no longer reconstructible; asof reads "
                    "must target a bound at or beyond the fold."
                )
        return self._read_commits(table, keep)

    def commit_props(self, table: str) -> list[dict]:
        return [c["props"] for c in self._read_manifest(table)["commits"]]

    def last_prop(self, table: str, key: str, default=None):
        vals = [p[key] for p in self.commit_props(table) if key in p]
        return vals[-1] if vals else default

    def remove_commits(self, table: str, pred) -> None:
        """Drop commits whose props match ``pred`` (atomic manifest swap,
        then GC the orphaned staging dirs) — used for partial-round
        rollback on resume."""
        # _rewrite_lock: removers must not yank commits out from under an
        # in-flight merge/delete rewrite (their CAS assumes no vanishing)
        with self._locked(table, "_rewrite_lock"), self._locked(table):
            manifest = self._read_manifest(table)
            keep = [c for c in manifest["commits"] if not pred(c["props"])]
            drop = [c for c in manifest["commits"] if pred(c["props"])]
            if not drop:
                return
            self._swap_manifest(table, {"commits": keep})
        for c in drop:
            shutil.rmtree(
                os.path.join(self._table_dir(table), c["dir"]), ignore_errors=True
            )

    def exists(self, table: str) -> bool:
        return bool(self._read_manifest(table)["commits"])

    def drop(self, table: str) -> None:
        shutil.rmtree(self._table_dir(table), ignore_errors=True)
