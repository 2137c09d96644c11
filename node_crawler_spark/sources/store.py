"""SnapshotStore — Iceberg-style committed round checkpoints on parquet.

The production design is Iceberg (north_rule: snapshot-per-round
commits of frontier / seen / sinks with per-partition lineage; resume =
read the last committed snapshot). The Iceberg runtime jar is not in
this container, so this module reproduces the commit semantics on
plain parquet:

  <root>/rounds/r=NNNNNN/<table>/...parquet     (written first)
  <root>/commits/NNNNNN.json                    (manifest, written last
                                                 via tmp + atomic rename)

A round is visible iff its manifest exists, so a job killed mid-round
leaves no partial state behind — ``last_committed_round`` skips
uncommitted directories exactly like Iceberg ignores orphaned data
files. The manifest records per-table row counts and the per-partition
row counts of the frontier/seen deltas (the lineage the north_rule asks
for).

``seen`` is stored as per-round *deltas* partitioned by a url-hash
bucket column (``pmod(xxhash64(url), buckets)``); readers get the union
of deltas ≤ R. At 10^10 urls the bucket column is what lets the D1
anti-join prune: candidate buckets are computed on the (small) new-link
side and pushed into the delta scan as a partition filter.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEEN_BUCKETS = 64


class SnapshotStore:
    def __init__(self, root: str, seen_buckets: int = SEEN_BUCKETS) -> None:
        self.root = root
        self.seen_buckets = seen_buckets
        os.makedirs(os.path.join(root, "rounds"), exist_ok=True)
        os.makedirs(os.path.join(root, "commits"), exist_ok=True)

    # -- layout ----------------------------------------------------------
    def _round_dir(self, r: int, table: str) -> str:
        return os.path.join(self.root, "rounds", f"r={r:06d}", table)

    def _commit_path(self, r: int) -> str:
        return os.path.join(self.root, "commits", f"{r:06d}.json")

    def _base_dir(self, r: int) -> str:
        return os.path.join(self.root, "seen_base", f"v={r:06d}")

    def _compaction_state_path(self) -> str:
        return os.path.join(self.root, "commits", "compaction.json")

    # -- commit protocol -------------------------------------------------
    def last_committed_round(self) -> int | None:
        commits = [
            int(f.split(".")[0])
            for f in os.listdir(os.path.join(self.root, "commits"))
            if f.endswith(".json") and f.split(".")[0].isdigit()
        ]
        return max(commits) if commits else None

    def read_manifest(self, r: int) -> dict:
        with open(self._commit_path(r)) as fh:
            return json.load(fh)

    def write_round(
        self,
        r: int,
        tables: dict[str, DataFrame],
        extra: dict | None = None,
        lineage: bool = False,
        count_tables: tuple = ("seen_delta",),
        lineage_tables: tuple = ("seen_delta", "next_frontier"),
        known_counts: dict[str, int] | None = None,
    ) -> dict:
        """Write every table, then publish the manifest atomically.

        Per-partition lineage (the north_rule's resume contract) is
        recorded for ``lineage_tables`` — for the seen delta the
        partitions are its url-hash buckets, so a resume can verify
        each shard independently; ``lineage=True`` extends that to
        every table. ``known_counts`` lets the caller pass row counts
        it already materialized (skips one count job per table).
        ``extra`` must carry the FINAL values (e.g. max_seq): the
        manifest is the atomic commit point — it is never rewritten,
        so a kill at any instant leaves either no round r or a fully
        consistent one.
        """
        manifest: dict = {"round": r, "tables": {}, **(extra or {})}
        known_counts = known_counts or {}

        def _write_one(name: str, df: DataFrame) -> DataFrame:
            path = self._round_dir(r, name)
            if name == "seen_delta":
                df = df.withColumn(
                    "bucket", F.pmod(F.xxhash64("url"), F.lit(self.seen_buckets))
                )
                # co-locate each bucket in one task → one file per bucket
                # (instead of tasks × buckets tiny files per round); when
                # the caller told us the delta is small, don't launch 64
                # tasks for a handful of rows — hash-on-bucket keeps each
                # bucket whole in one task at any task count
                n = known_counts.get(name)
                parts = (
                    self.seen_buckets
                    if n is None
                    else max(1, min(self.seen_buckets, n // 50_000 + 1))
                )
                df.repartition(parts, "bucket").write.mode(
                    "overwrite"
                ).partitionBy("bucket").parquet(path)
            else:
                df.write.mode("overwrite").parquet(path)
            return df

        # The table writes are independent jobs over already-materialized
        # round intermediates (the driver's counts forced every shared
        # localCheckpoint before commit), so submit them CONCURRENTLY:
        # on this box that overlaps the per-job scheduling floor that
        # dominates small-round commits (BENCH/BASELINE.md §6/§13); on a
        # cluster it overlaps the per-table output-commit barriers. The
        # manifest publish below still happens strictly after every
        # write returns — atomicity is unchanged.
        if len(tables) > 1:
            from concurrent.futures import (
                FIRST_EXCEPTION,
                ThreadPoolExecutor,
                wait,
            )

            with ThreadPoolExecutor(max_workers=len(tables)) as pool:
                futures = {
                    name: pool.submit(_write_one, name, df)
                    for name, df in tables.items()
                }
                # Fail fast: a doomed commit should not pay for the
                # rest of the round's writes — cancel the not-yet-
                # started siblings on first failure (in-flight writes
                # still drain; their orphan dirs are invisible without
                # a manifest and overwritten on retry). (ADVICE r4)
                wait(futures.values(), return_when=FIRST_EXCEPTION)
                if any(
                    f.done() and not f.cancelled() and f.exception()
                    for f in futures.values()
                ):
                    for f in futures.values():
                        f.cancel()
            written = {
                name: f.result()
                for name, f in futures.items()
                if not f.cancelled()
            }
        else:
            written = {n: _write_one(n, df) for n, df in tables.items()}

        for name in tables:
            df = written[name]
            path = self._round_dir(r, name)
            entry: dict = {"schema": df.schema.json()}
            if lineage or name in lineage_tables:
                # per-partition lineage straight from the parquet footers
                # the write just produced — driver-side metadata reads
                # (64 files max), NOT a second Spark scan of the data
                part_counts = self._footer_counts(path)
                entry["rows"] = sum(part_counts.values())
                entry["partitions"] = part_counts
            elif name in known_counts:
                entry["rows"] = known_counts[name]
            elif name in count_tables:
                entry["rows"] = sum(self._footer_counts(path).values())
            manifest["tables"][name] = entry
        fd, tmp = tempfile.mkstemp(dir=os.path.join(self.root, "commits"))
        with os.fdopen(fd, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, self._commit_path(r))
        return manifest

    def _footer_counts(self, path: str) -> dict[str, int]:
        """Row counts per lineage partition (a ``bucket=N`` dir for the
        seen delta, else the individual part file) read from the parquet
        footers — the metadata Iceberg would keep in its manifests."""
        import pyarrow.parquet as pq

        counts: dict[str, int] = {}
        if not os.path.isdir(path):
            return counts
        for root, _dirs, files in os.walk(path):
            for f in files:
                if not f.endswith(".parquet"):
                    continue
                fp = os.path.join(root, f)
                rel = os.path.relpath(fp, path)
                head = rel.split(os.sep)[0]
                key = head if "=" in head else rel
                counts[key] = counts.get(key, 0) + pq.ParquetFile(
                    fp
                ).metadata.num_rows
        return counts

    # -- readers ---------------------------------------------------------
    def _has_data(self, path: str) -> bool:
        if not os.path.isdir(path):
            return False
        for root, _dirs, files in os.walk(path):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    def _empty_from_manifest(
        self, spark: SparkSession, r: int, table: str
    ) -> DataFrame | None:
        from pyspark.sql import types as T

        try:
            schema_json = self.read_manifest(r)["tables"][table]["schema"]
        except (FileNotFoundError, KeyError):
            return None
        schema = T.StructType.fromJson(json.loads(schema_json))
        return spark.createDataFrame([], schema)

    def read_table(self, spark: SparkSession, r: int, table: str) -> DataFrame | None:
        path = self._round_dir(r, table)
        if self._has_data(path):
            return spark.read.parquet(path)
        return self._empty_from_manifest(spark, r, table)

    def read_union(
        self, spark: SparkSession, table: str, upto: int | None = None
    ) -> DataFrame | None:
        """Union of a table's per-round appends for rounds ≤ upto."""
        last = self.last_committed_round()
        if last is None:
            return None
        upto = last if upto is None else min(upto, last)
        dfs = []
        fallback_round = None
        for r in range(upto + 1):
            path = self._round_dir(r, table)
            if self._has_data(path):
                dfs.append(spark.read.parquet(path))
            elif os.path.isdir(path):
                fallback_round = r
        if not dfs:
            if fallback_round is None:
                return None
            return self._empty_from_manifest(spark, fallback_round, table)
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    # -- seen compaction + bucket-pruned probe ---------------------------
    # A 1000-round crawl must not pay a 1000-way union per probe/resume:
    # deltas ≤ W are periodically folded into ONE bucketed base table
    # (Iceberg rewrite_data_files analog), and readers take base ∪
    # deltas > W. Deltas are never deleted — they remain the per-round
    # commit log (resume/lineage); the base is an accelerator, published
    # atomically via dir-rename + state-file replace, so a kill mid-
    # compaction leaves the previous view intact.

    def compaction_round(self) -> int | None:
        try:
            with open(self._compaction_state_path()) as fh:
                return int(json.load(fh)["base_round"])
        except FileNotFoundError:
            return None

    def compact_seen(self, spark: SparkSession, upto: int) -> int:
        """Fold seen deltas ≤ upto into a bucket-partitioned base table.
        Returns the row count of the new base."""
        deltas = self.read_union(spark, "seen_delta", upto)
        if deltas is None:
            return 0
        tmp = os.path.join(self.root, "seen_base", f".tmp-{upto:06d}")
        (
            deltas.repartition(self.seen_buckets, "bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(tmp)
        )
        final = self._base_dir(upto)
        if os.path.exists(final):  # idempotent re-compaction
            import shutil

            shutil.rmtree(final)
        os.replace(tmp, final)
        prev = self.compaction_round()
        fd, tmp_state = tempfile.mkstemp(dir=os.path.join(self.root, "commits"))
        with os.fdopen(fd, "w") as fh:
            json.dump({"base_round": upto}, fh)
        os.replace(tmp_state, self._compaction_state_path())
        if prev is not None and prev != upto:  # retire the old base
            import shutil

            shutil.rmtree(self._base_dir(prev), ignore_errors=True)
        return spark.read.parquet(final).count()

    def read_seen(self, spark: SparkSession, upto: int | None = None) -> DataFrame | None:
        base_round = self.compaction_round()
        if base_round is None or (upto is not None and upto < base_round):
            # no base, or the reader wants a point-in-time view older
            # than the base: the per-round delta log serves it
            return self.read_union(spark, "seen_delta", upto)
        base = spark.read.parquet(self._base_dir(base_round))
        last = self.last_committed_round()
        upto = last if upto is None else min(upto, last)
        out = base
        for r in range(base_round + 1, upto + 1):
            path = self._round_dir(r, "seen_delta")
            if self._has_data(path):
                out = out.unionByName(spark.read.parquet(path))
        return out

    def read_seen_pruned(
        self, spark: SparkSession, buckets, upto: int | None = None
    ) -> DataFrame | None:
        """Seen view restricted to the given url-hash buckets — the
        filter lands on the parquet partition column, so a cold probe
        scans only the candidate buckets' files (PartitionFilters in
        the physical plan; tests/test_store_compaction.py asserts it)."""
        df = self.read_seen(spark, upto)
        if df is None:
            return None
        return df.where(F.col("bucket").isin(list(buckets)))

    @staticmethod
    def bucket_of(col, buckets: int = SEEN_BUCKETS):
        """The url→bucket function (shared by writer and probe side)."""
        return F.pmod(F.xxhash64(col), F.lit(buckets))
