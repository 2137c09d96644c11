"""D1 scale sidecar — the partitioned bloom URL-seen prefilter the
north_star names ("partitioned bloom/cuckoo URL-seen set salted by
domain-hash to defeat hot-domain skew").

Why a prefilter: the J4 seen probe is a left-anti join of the round's
candidate links (10^5-10^7 rows) against the seen set (up to 10^10
rows). The anti-join must shuffle *both* sides on url — at scale the
seen side dominates every round's cost. A bloom filter answers
"definitely not seen" without touching the seen table, so only the
(tiny) maybe-seen residue reaches the exact join. False positives are
safe — the anti-join backstops them; false negatives cannot happen
because every committed url is inserted before the next probe.

Physical design (10^10 posture):
  * The filter is a ``(shard int, bitmap binary)`` DataFrame of
    ``cfg.bloom_shards`` rows — NOT driver state. Building and
    merging are executor-side ``applyInPandas`` aggregations
    (numpy bitwise OR over packed uint64 words); the driver only
    holds the round's key count (for capacity tracking).
  * The shard key hashes (domain, url) together: the domain hash
    keeps a per-domain component (the north_star's salt) while the
    url hash spreads a hot domain uniformly over all shards — a 99%%
    single-host frontier cannot hotspot one shard
    (tests/test_seenset.py::test_hot_domain_skew).
  * The probe is a relational equi-join on ``shard`` between the
    candidate side and the bitmap table, followed by one vectorized
    Arrow UDF that tests k bit positions per row. Locally the bitmap
    table broadcasts; on a cluster where S × m grows past broadcast
    range AQE flips the same plan to a shuffle join — no rewrite.
  * Fixed-size bitmaps with capacity-doubling rebuilds: when
    inserted keys exceed m·S/bits_per_key the filter is rebuilt from
    the full seen set at double width (amortized O(log n) rebuilds
    over a crawl). Between rebuilds memory is constant.

Double hashing (Kirsch-Mitzenmacher): k positions derived from two
independent xxhash64 values, h_j = h1 + j·h2 (mod m) — one JVM hash
pass, k probes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_BITMAP_SCHEMA = "shard int, bitmap binary"


def _domain(col):
    from node_crawler_spark.functions.urlkit import hostport_col

    return hostport_col(col)


def _hash_cols(df: DataFrame, url_col: str, shards: int) -> DataFrame:
    """JVM-side shard + double-hash columns for a url column."""
    c = F.col(url_col)
    return df.withColumns(
        {
            "_b_shard": F.pmod(F.xxhash64(_domain(c), c), F.lit(shards)).cast("int"),
            "_b_h1": F.xxhash64(F.lit(17), c),
            "_b_h2": F.xxhash64(F.lit(31), c),
        }
    )


def _positions(h1: np.ndarray, h2: np.ndarray, j: int, m: int) -> np.ndarray:
    return (h1 + np.uint64(j) * h2) % np.uint64(m)


def _set_bits(bm: np.ndarray, h1: np.ndarray, h2: np.ndarray, k: int, m: int) -> None:
    for j in range(k):
        pos = _positions(h1, h2, j, m)
        np.bitwise_or.at(
            bm, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )


class BloomSeenSet:
    """Sharded bloom filter over the crawl's seen urls, held as a
    localCheckpointed (shard, bitmap) DataFrame."""

    def __init__(
        self,
        spark: SparkSession,
        shards: int = 64,
        bits_per_key: int = 10,
        hashes: int = 6,
        m_bits: int = 1 << 16,
    ) -> None:
        self.spark = spark
        self.shards = shards
        self.bits_per_key = bits_per_key
        self.k = hashes
        self.m = m_bits            # bits per shard (multiple of 64)
        self.n_keys = 0
        self.table: DataFrame | None = None  # (shard, bitmap), checkpointed

    # -- construction ----------------------------------------------------
    @classmethod
    def from_config(cls, spark: SparkSession, cfg) -> "BloomSeenSet":
        return cls(
            spark,
            shards=cfg.bloom_shards,
            bits_per_key=cfg.bloom_bits_per_key,
            hashes=cfg.bloom_hashes,
        )

    @property
    def capacity(self) -> int:
        return (self.m * self.shards) // self.bits_per_key

    def _delta_bitmaps(self, urls: DataFrame, url_col: str) -> DataFrame:
        m, k = self.m, self.k

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            bm = np.zeros(m // 64, dtype=np.uint64)
            h1 = pdf["_b_h1"].to_numpy().astype(np.uint64)
            h2 = pdf["_b_h2"].to_numpy().astype(np.uint64)
            _set_bits(bm, h1, h2, k, m)
            return pd.DataFrame(
                {"shard": [int(pdf["_b_shard"].iloc[0])], "bitmap": [bm.tobytes()]}
            )

        hashed = _hash_cols(urls.select(url_col), url_col, self.shards)
        return hashed.groupBy("_b_shard").applyInPandas(build, _BITMAP_SCHEMA)

    def insert(self, urls: DataFrame, url_col: str = "url", n_keys: int | None = None) -> None:
        """OR a delta's urls into the filter (executor-side merge)."""
        delta = self._delta_bitmaps(urls, url_col)
        if self.table is None:
            merged = delta
        else:
            def or_merge(pdf: pd.DataFrame) -> pd.DataFrame:
                maps = [np.frombuffer(b, dtype=np.uint64) for b in pdf["bitmap"]]
                out = maps[0] if len(maps) == 1 else np.bitwise_or.reduce(maps)
                return pd.DataFrame(
                    {"shard": [int(pdf["shard"].iloc[0])], "bitmap": [out.tobytes()]}
                )

            merged = (
                self.table.unionByName(delta)
                .groupBy("shard")
                .applyInPandas(or_merge, _BITMAP_SCHEMA)
            )
        old = self.table
        self.table = merged.localCheckpoint()
        if old is not None:
            old.unpersist()
        self.n_keys += urls.count() if n_keys is None else n_keys

    def rebuild_if_overloaded(self, seen: DataFrame, url_col: str = "url") -> bool:
        """Double the per-shard width and rebuild from the full seen set
        once the load factor exceeds bits_per_key bits/key. Returns True
        if a rebuild happened."""
        if self.n_keys <= self.capacity:
            return False
        need = self.n_keys * self.bits_per_key // self.shards
        m = self.m
        while m < need:
            m *= 2
        self.m = m * 2  # headroom: next doubling is a while away
        old = self.table
        self.table = None
        n = self.n_keys
        self.insert(seen, url_col=url_col, n_keys=0)
        self.n_keys = n
        if old is not None:
            old.unpersist()
        return True

    # -- probe -----------------------------------------------------------
    def probe(self, df: DataFrame, url_col: str) -> DataFrame:
        """Adds ``_maybe_seen``: False ⇒ definitely not in the filter
        (skip the exact join); True ⇒ run the exact probe (could be a
        false positive). Plan: equi-join on shard (broadcast locally,
        AQE-shufflable at scale) + one Arrow-vectorized bit test."""
        if self.table is None:
            return df.withColumn("_maybe_seen", F.lit(False))
        m, k = self.m, self.k

        @F.pandas_udf("boolean")
        def bit_test(shard: pd.Series, h1: pd.Series, h2: pd.Series,
                     bitmap: pd.Series) -> pd.Series:
            n = len(shard)
            out = np.zeros(n, dtype=bool)
            have = bitmap.notna().to_numpy()
            if have.any():
                sh = shard.to_numpy()
                h1v = h1.to_numpy().astype(np.uint64)
                h2v = h2.to_numpy().astype(np.uint64)
                for s in np.unique(sh[have]):
                    rows = np.nonzero(have & (sh == s))[0]
                    bm = np.frombuffer(
                        bitmap.iloc[int(rows[0])], dtype=np.uint64
                    )
                    hit = np.ones(len(rows), dtype=bool)
                    for j in range(k):
                        pos = _positions(h1v[rows], h2v[rows], j, m)
                        word = bm[(pos >> np.uint64(6)).astype(np.int64)]
                        hit &= ((word >> (pos & np.uint64(63)))
                                & np.uint64(1)).astype(bool)
                    out[rows] = hit
            return pd.Series(out)

        hashed = _hash_cols(df, url_col, self.shards)
        joined = hashed.join(
            F.broadcast(self.table),
            hashed["_b_shard"] == self.table["shard"],
            "left",
        )
        return joined.withColumn(
            "_maybe_seen",
            bit_test(F.col("_b_shard"), F.col("_b_h1"), F.col("_b_h2"),
                     F.col("bitmap")),
        ).drop("shard", "bitmap", "_b_shard", "_b_h1", "_b_h2")


_CUCKOO_SCHEMA = "shard int, table binary, saturated boolean"
_FP_MULT = 0x5BD1E995  # fingerprint→partner-bucket mix (MurmurHash2 M)


def _fp_partner_mask(fp, mask):
    """XOR offset of the partner bucket (numpy or int). With
    power-of-two buckets the partner map is an involution:
    partner(partner(i)) == i."""
    return (fp * _FP_MULT) % (1 << 32) & mask


class CuckooSeenSet:
    """Sharded CUCKOO-filter variant of the seen-set sidecar (the
    north_star names "bloom/cuckoo" — this is the cuckoo half):
    16-bit fingerprints in B buckets × 4 slots per shard, two
    candidate buckets (i, i ^ h(fp)), bounded deterministic kick
    chains. Same probe contract as BloomSeenSet (``_maybe_seen``,
    false positives backstopped by the exact anti-join, false
    negatives impossible for inserted keys), same executor-side
    (shard, blob) DataFrame layout and hot-domain shard spreading —
    plus what bloom cannot do: ``remove()`` (kill-switch rollbacks /
    re-crawl invalidation) at ~½ the bits per key for the same FP
    rate (16-bit fp, 8 slots probed ⇒ FP ≈ 2·4/2¹⁶ ≈ 1.2e-4 vs the
    default bloom's ~6e-3 at 10 bits/key).

    Inserts are per-key WITHIN a shard (kick chains are inherently
    sequential) but all shards build in parallel; kicks are
    deterministic (victim slot round-robins on the chain counter) so
    the filter image is bit-identical across runs. A shard whose kick
    chain overflows sets ``saturated`` — its probes all answer
    maybe-seen (safe) until ``rebuild_if_overloaded`` doubles the
    bucket count."""

    def __init__(
        self,
        spark: SparkSession,
        shards: int = 64,
        buckets: int = 1 << 11,
        slots: int = 4,
        kick_limit: int = 500,
    ) -> None:
        assert buckets & (buckets - 1) == 0, "buckets must be a power of 2"
        self.spark = spark
        self.shards = shards
        self.b = buckets
        self.slots = slots
        self.kick_limit = kick_limit
        self.n_keys = 0
        self.table: DataFrame | None = None  # (shard, table, saturated)

    @classmethod
    def from_config(cls, spark: SparkSession, cfg) -> "CuckooSeenSet":
        return cls(spark, shards=cfg.bloom_shards)

    @property
    def capacity(self) -> int:
        # 4-way cuckoo sustains ~95% load; engage rebuild at 90%
        return int(0.9 * self.b * self.slots * self.shards)

    # -- key derivation (must match between insert and probe) -----------
    @staticmethod
    def _fp_i1(h1, h2, mask):
        """(fingerprint, primary bucket) from the two JVM hashes —
        works elementwise on numpy uint64 arrays and on scalars."""
        fp = (h1 >> np.uint64(16)) % np.uint64(65535) + np.uint64(1)
        i1 = h2 & np.uint64(mask)
        return fp, i1

    def _empty_table(self) -> DataFrame:
        return self.spark.createDataFrame([], _CUCKOO_SCHEMA)

    def _apply(self, urls: DataFrame, url_col: str, remove: bool) -> DataFrame:
        b, slots, kick_limit = self.b, self.slots, self.kick_limit
        mask = b - 1

        def upsert(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            if len(right):
                shard = int(right["shard"].iloc[0])
                tab = (
                    np.frombuffer(right["table"].iloc[0], dtype=np.uint16)
                    .copy()
                    .reshape(b, slots)
                )
                sat = bool(right["saturated"].iloc[0])
            else:
                shard = int(left["_b_shard"].iloc[0])
                tab = np.zeros((b, slots), dtype=np.uint16)
                sat = False
            h1v = left["_b_h1"].to_numpy().astype(np.uint64)
            h2v = left["_b_h2"].to_numpy().astype(np.uint64)
            fps, i1s = CuckooSeenSet._fp_i1(h1v, h2v, mask)
            for fp_u, i1_u in zip(fps, i1s):
                fp, i1 = int(fp_u), int(i1_u)
                i2 = i1 ^ int(_fp_partner_mask(fp, mask))
                if remove:
                    for i in (i1, i2):
                        hit = np.nonzero(tab[i] == fp)[0]
                        if len(hit):
                            tab[i, hit[0]] = 0
                            break
                    continue
                # idempotent membership: already present in either bucket
                if (tab[i1] == fp).any() or (tab[i2] == fp).any():
                    continue
                placed = False
                for i in (i1, i2):
                    empty = np.nonzero(tab[i] == 0)[0]
                    if len(empty):
                        tab[i, empty[0]] = fp
                        placed = True
                        break
                if placed:
                    continue
                # deterministic kick chain
                i, cur = i1, fp
                for n in range(kick_limit):
                    slot = n % slots
                    cur, tab[i, slot] = int(tab[i, slot]), cur
                    i = i ^ int(_fp_partner_mask(cur, mask))
                    empty = np.nonzero(tab[i] == 0)[0]
                    if len(empty):
                        tab[i, empty[0]] = cur
                        break
                else:
                    sat = True  # overflow: probes answer maybe until rebuild
            return pd.DataFrame(
                {"shard": [shard], "table": [tab.tobytes()], "saturated": [sat]}
            )

        hashed = _hash_cols(urls.select(url_col), url_col, self.shards).select(
            "_b_shard", "_b_h1", "_b_h2"
        )
        current = self.table if self.table is not None else self._empty_table()
        return (
            hashed.groupBy("_b_shard")
            .cogroup(current.groupBy("shard"))
            .applyInPandas(upsert, _CUCKOO_SCHEMA)
        )

    def insert(
        self, urls: DataFrame, url_col: str = "url", n_keys: int | None = None
    ) -> None:
        merged = self._apply(urls, url_col, remove=False)
        old = self.table
        self.table = merged.localCheckpoint()
        if old is not None:
            old.unpersist()
        self.n_keys += urls.count() if n_keys is None else n_keys

    def remove(self, urls: DataFrame, url_col: str = "url") -> None:
        """Delete the urls' fingerprints (the cuckoo capability bloom
        lacks). Caveat inherent to cuckoo filters: deleting a key
        also deletes any OTHER key that shares both its fingerprint
        and bucket pair — only remove keys that were inserted."""
        n = urls.count()
        merged = self._apply(urls, url_col, remove=True)
        old = self.table
        self.table = merged.localCheckpoint()
        if old is not None:
            old.unpersist()
        self.n_keys = max(0, self.n_keys - n)

    def _any_saturated(self) -> bool:
        if self.table is None:
            return False
        # S rows (default 64) — the same bounded-driver-data class as
        # the bucket-prune collect
        return bool(
            self.table.where(F.col("saturated")).limit(1).count()
        )

    def rebuild_if_overloaded(self, seen: DataFrame, url_col: str = "url") -> bool:
        if self.n_keys <= self.capacity and not self._any_saturated():
            return False
        need = self.n_keys  # target ≤ 45% load after doubling
        while int(0.9 * self.b * self.slots * self.shards) < 2 * need:
            self.b *= 2
        self.b *= 2
        old = self.table
        self.table = None
        n = self.n_keys
        self.insert(seen, url_col=url_col, n_keys=0)
        self.n_keys = n
        if old is not None:
            old.unpersist()
        return True

    # -- probe -----------------------------------------------------------
    def probe(self, df: DataFrame, url_col: str) -> DataFrame:
        """Same contract as BloomSeenSet.probe: adds ``_maybe_seen``."""
        if self.table is None:
            return df.withColumn("_maybe_seen", F.lit(False))
        b, slots = self.b, self.slots
        mask = b - 1

        @F.pandas_udf("boolean")
        def slot_test(
            shard: pd.Series, h1: pd.Series, h2: pd.Series,
            table: pd.Series, saturated: pd.Series,
        ) -> pd.Series:
            n = len(shard)
            out = np.zeros(n, dtype=bool)
            have = table.notna().to_numpy()
            if have.any():
                sh = shard.to_numpy()
                h1v = h1.to_numpy().astype(np.uint64)
                h2v = h2.to_numpy().astype(np.uint64)
                fps, i1s = CuckooSeenSet._fp_i1(h1v, h2v, mask)
                i2s = i1s ^ _fp_partner_mask(fps, np.uint64(mask)).astype(
                    np.uint64
                )
                for s in np.unique(sh[have]):
                    rows = np.nonzero(have & (sh == s))[0]
                    if bool(saturated.iloc[int(rows[0])]):
                        out[rows] = True  # safe: exact join decides
                        continue
                    tab = np.frombuffer(
                        table.iloc[int(rows[0])], dtype=np.uint16
                    ).reshape(b, slots)
                    fpr = fps[rows].astype(np.uint16)
                    hit1 = (
                        tab[i1s[rows].astype(np.int64)] == fpr[:, None]
                    ).any(axis=1)
                    hit2 = (
                        tab[i2s[rows].astype(np.int64)] == fpr[:, None]
                    ).any(axis=1)
                    out[rows] = hit1 | hit2
            return pd.Series(out)

        hashed = _hash_cols(df, url_col, self.shards)
        joined = hashed.join(
            F.broadcast(self.table),
            hashed["_b_shard"] == self.table["shard"],
            "left",
        )
        return joined.withColumn(
            "_maybe_seen",
            slot_test(
                F.col("_b_shard"), F.col("_b_h1"), F.col("_b_h2"),
                F.col("table"), F.col("saturated"),
            ),
        ).drop("shard", "table", "saturated", "_b_shard", "_b_h1", "_b_h2")


def mark_seen(
    candidates: DataFrame,
    seen_keys: DataFrame,
    bloom: "BloomSeenSet | CuckooSeenSet | None",
    url_col: str = "ins_url",
) -> DataFrame:
    """The D1/J4 seen probe: adds boolean ``_seen``. With a bloom,
    only the maybe-seen residue reaches the exact join; bloom-negative
    rows bypass the shuffle entirely (the 10^10-seen win)."""
    keys = seen_keys.withColumn("_sflag", F.lit(True))
    if bloom is None or bloom.table is None:
        return (
            candidates.join(keys, on=url_col, how="left")
            .withColumn("_seen", F.col("_sflag").isNotNull())
            .drop("_sflag")
        )
    probed = bloom.probe(candidates, url_col)
    neg = (
        probed.where(~F.col("_maybe_seen"))
        .drop("_maybe_seen")
        .withColumn("_seen", F.lit(False))
    )
    pos = (
        probed.where(F.col("_maybe_seen"))
        .drop("_maybe_seen")
        .join(keys, on=url_col, how="left")
        .withColumn("_seen", F.col("_sflag").isNotNull())
        .drop("_sflag")
    )
    return pos.unionByName(neg)
