"""WARC source/sink: crawl straight off Common-Crawl-style WARC files.

Reads WARC/1.0 ``response`` records into the engine's two crawl inputs
— the page store (``PAGES_SCHEMA``: url, warc_ts, html, text, lang) and
the http-meta table (``HTTP_SCHEMA``: status/location/content-type per
url) — so ``run_crawl(spark, cfg, *warc_tables(read_warc(...)), seeds)``
replays a crawl over an archived snapshot.

Scale posture (the 100 TB shape): the parallelism unit is ONE WARC
FILE PER TASK. Common Crawl ships ~10^5 independent ~1 GiB gzip WARCs
per snapshot; ``spark.read.format("binaryFile")`` distributes whole
files across executors and the parser streams each file inside a
``mapInPandas`` Arrow batch — bytes never touch the driver, and no
intra-file split is attempted (per-record gzip members are not
seekable without a CDX index; with one, a range-reader variant can
split, but file-granular parallelism already yields ~10^5-way
distribution). Both plain ``.warc`` and Common-Crawl per-record-gzip
``.warc.gz`` (multi-member) are handled transparently. ``binaryFile``
carries Spark's 2 GiB single-file ceiling — Common Crawl's ~1 GiB
segments fit; for larger archives use the CDX range-read path below,
which never materializes a whole file.

The serializer (`warc_bytes`) is the matching sink: archive a crawl's
fetched pages back out as standard WARC response records (the
round-trip is pinned byte-identical in tests/test_warc.py).

Format reference: ISO 28500 (WARC/1.0/1.1), the public Common Crawl
layout. Reference parity: the reference crawler fetches live HTTP
(crawler.js request path); this engine's fetch-as-join reads archived
responses — a WARC file IS that archive, so this source closes the
loop from real Common-Crawl data to the fetch join (SURVEY §2 S2/J1).
"""

from __future__ import annotations

import gzip
import io
import zlib
from datetime import datetime, timezone

import pandas as pd


def _epoch_us_col():
    """Session-TZ-independent WARC-Date transport: the instant as epoch
    micros (NULL → the mandatory-date epoch sentinel, ISO 28500 §5.4).
    Collected timestamps arrive session-TZ-naive through Arrow, so a
    non-UTC session would render shifted-yet-'Z'-tagged dates if the
    timestamp itself crossed the boundary (ADVICE r4)."""
    from pyspark.sql import functions as F

    return F.unix_micros(
        F.coalesce("warc_ts", F.timestamp_seconds(F.lit(0)))
    ).alias("warc_us")


def _utc_naive(us: int):
    """Naive-UTC datetime from epoch micros — the record builders'
    strftime('...Z') contract."""
    return datetime.fromtimestamp(us / 1_000_000, tz=timezone.utc).replace(
        tzinfo=None
    )



from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RECORD_SCHEMA = (
    "url string, warc_ts timestamp, status_code int, content_type string, "
    "content_encoding string, content_length string, location string, "
    "set_cookie string, html binary, warc_file string"
)

_RECORD_COLS = [
    "url", "warc_ts", "status_code", "content_type", "content_encoding",
    "content_length", "location", "set_cookie", "html", "warc_file",
]


# ---------------------------------------------------------------------------
# byte-level parsing (pure stdlib; runs executor-side inside Arrow batches)
# ---------------------------------------------------------------------------

def gunzip_members(raw: bytes) -> bytes:
    """Decompress a possibly multi-member gzip stream (Common Crawl
    writes one gzip member per WARC record, concatenated).

    Streams through GzipFile rather than looping decompressobj /
    ``unused_data`` (or ``gzip.decompress``): both of those re-copy
    the remaining buffer once PER MEMBER — O(members²) bytes moved, a
    14×/40× measured slowdown at 20k members — while GzipFile's
    buffered reader walks the members in one linear pass."""
    out = bytearray()
    f = gzip.GzipFile(fileobj=io.BytesIO(raw))
    try:
        while True:
            chunk = f.read(1 << 20)
            if not chunk:
                break
            out += chunk
    except (EOFError, OSError, zlib.error):
        pass  # truncated/corrupt tail — keep the members already decoded
        # (at most the last buffered chunk of a partial member is lost)
    return bytes(out)


def _parse_warc_date(s: str) -> datetime | None:
    """WARC-Date (ISO-8601, 'Z' suffix) → naive-UTC datetime (the
    session TZ is pinned UTC, so naive == UTC wall time)."""
    try:
        dt = datetime.fromisoformat(s.strip().replace("Z", "+00:00"))
    except ValueError:
        return None
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


def iter_warc_records(raw: bytes):
    """Yield (warc_headers: dict[lower,str], payload: bytes) per record."""
    pos, n = 0, len(raw)
    while pos < n:
        while raw.startswith(b"\r\n", pos):
            pos += 2
        if pos >= n:
            break
        head_end = raw.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break
        head = raw[pos:head_end].decode("latin-1", "replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            break  # not a record boundary — corrupt tail, stop cleanly
        hdrs: dict[str, str] = {}
        for ln in lines[1:]:
            if ":" in ln:
                k, v = ln.split(":", 1)
                hdrs[k.strip().lower()] = v.strip()
        try:
            clen = int(hdrs.get("content-length", "0"))
        except ValueError:
            break
        payload = raw[head_end + 4 : head_end + 4 + clen]
        pos = head_end + 4 + clen
        yield hdrs, payload


def parse_http_response(payload: bytes):
    """HTTP response payload → (status_code, headers dict[lower,str],
    body bytes). Returns (None, {}, payload) when no status line."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        head, body = payload, b""
    else:
        head, body = payload[:sep], payload[sep + 4 :]
    lines = head.decode("latin-1", "replace").split("\r\n")
    parts = lines[0].split()
    if len(parts) < 2 or not parts[0].startswith("HTTP/"):
        return None, {}, payload
    try:
        status = int(parts[1])
    except ValueError:
        return None, {}, payload
    hh: dict[str, str] = {}
    for ln in lines[1:]:
        if ":" in ln:
            k, v = ln.split(":", 1)
            hh[k.strip().lower()] = v.strip()
    return status, hh, body


def parse_warc_file(name: str, raw: bytes) -> list[tuple]:
    """One WARC file (plain or gzip) → rows in _RECORD_COLS order,
    ``response`` records only."""
    if raw[:2] == b"\x1f\x8b":
        raw = gunzip_members(raw)
    rows = []
    for hdrs, payload in iter_warc_records(raw):
        if hdrs.get("warc-type") != "response":
            continue
        url = hdrs.get("warc-target-uri")
        if not url:
            continue
        status, hh, body = parse_http_response(payload)
        rows.append(
            (
                url,
                _parse_warc_date(hdrs.get("warc-date", "")),
                status,
                hh.get("content-type"),
                hh.get("content-encoding"),
                hh.get("content-length"),
                hh.get("location"),
                hh.get("set-cookie"),
                body,
                name,
            )
        )
    return rows


# ---------------------------------------------------------------------------
# the Spark face
# ---------------------------------------------------------------------------

def read_warc(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """WARC file(s)/glob → DataFrame of response records
    (RECORD_SCHEMA). One file per task; parsing happens inside
    mapInPandas Arrow batches, never on the driver."""
    bf = spark.read.format("binaryFile").load(paths).select("path", "content")

    def parse(batches):
        for pdf in batches:
            rows: list[tuple] = []
            for path, content in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_warc_file(str(path), bytes(content)))
            out = pd.DataFrame(rows, columns=_RECORD_COLS)
            if rows:
                out["warc_ts"] = pd.to_datetime(out["warc_ts"])
            yield out

    return bf.mapInPandas(parse, RECORD_SCHEMA)


def warc_tables(records: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Record DF → (pages, http_meta) in the driver's input schemas.
    Pure projections (codegen): text/lang stay NULL — the fetch join
    decodes and extracts text from html bytes exactly as it does for
    any page store (byte-identical discipline, functions/html.py)."""
    pages = records.select(
        "url",
        "warc_ts",
        "html",
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )
    http = records.select(
        "url",
        F.lit(0).alias("attempt"),
        F.col("status_code").cast("int").alias("status_code"),
        F.col("location"),
        F.col("content_type"),
        F.col("content_encoding"),
        F.col("content_length"),
        F.lit(None).cast("string").alias("error_code"),
        (F.col("status_code") == 401).alias("requires_auth"),
        F.col("set_cookie"),
        F.lit(False).alias("requires_cookie"),
    )
    return pages, http


def export_warc(
    pages: DataFrame,
    http_meta: DataFrame,
    out_dir: str,
    per_record_gzip: bool = True,
) -> DataFrame:
    """Distributed WARC export sink: archive a page store (+ its http
    metadata) as standard WARC files, one ``part-NNNNN.warc[.gz]`` +
    one ``part-NNNNN.cdx.csv`` PER PARTITION, written executor-side
    (no driver bytes — repartition the input to choose file count /
    size). The CDX sidecars are exactly what ``read_warc_by_cdx`` and
    the streaming ingest face consume, so crawl → export → re-ingest
    round-trips byte-identically (pinned in tests/test_warc.py).
    Returns the collected manifest as a DataFrame
    (warc_file, n_records, n_bytes).

    Paths are opened with plain ``open()`` executor-side, so
    ``out_dir`` must be a filesystem every executor mounts (local in
    this sandbox, NFS/Lustre on a cluster); for object stores, swap
    the two ``open()`` calls for the store's put API — the
    partition-serializer structure is unchanged."""
    import os

    h = http_meta.where(F.col("attempt") == 0).select(
        "url", "status_code", "content_type", "location", "set_cookie"
    )
    # LEFT join: redirect hops (30x rows) legitimately have no stored
    # page body, so warc_ts comes back NULL for them — strftime on a
    # NaT would fail the whole partition. WARC-Date is mandatory
    # (ISO 28500 §5.4), so such records get the deterministic epoch
    # sentinel instead of dropping the redirect from the archive.
    combined = h.join(
        pages.select("url", "warc_ts", "html"), "url", "left"
    ).select(
        "url",
        # Timezone-independent timestamp transport (ADVICE r4): the
        # sentinel is timestamp_seconds(0) — an absolute instant, not a
        # session-TZ parse — and the instant crosses the Arrow boundary
        # as EPOCH MICROS, because collected timestamps arrive as
        # session-TZ-naive pandas values: a non-UTC session would
        # otherwise render every WARC-Date shifted yet still 'Z'-tagged
        # (observed +09:00 under Asia/Tokyo before this fix).
        F.unix_micros(
            F.coalesce("warc_ts", F.timestamp_seconds(F.lit(0)))
        ).alias("warc_us"),
        "html", "status_code", "content_type", "location", "set_cookie",
    )

    os.makedirs(out_dir, exist_ok=True)
    suffix = ".warc.gz" if per_record_gzip else ".warc"

    def write_part(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        recs: list[dict] = []
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                hh = [("Content-Type", r.content_type or "text/html")]
                if r.location is not None:
                    hh.append(("Location", r.location))
                if r.set_cookie is not None:
                    hh.append(("Set-Cookie", r.set_cookie))
                recs.append(
                    {
                        "url": r.url,
                        "ts": _utc_naive(r.warc_us),
                        "body": bytes(r.html) if r.html is not None else b"",
                        "status": int(r.status_code)
                        if r.status_code is not None
                        else 200,
                        "http_headers": hh,
                    }
                )
        if not recs:
            yield pd.DataFrame(
                columns=["warc_file", "n_records", "n_bytes"]
            )
            return
        fname = os.path.join(out_dir, f"part-{pid:05d}{suffix}")
        blob, cdx = warc_bytes_indexed(recs, per_record_gzip, fname)
        with open(fname, "wb") as fh:
            fh.write(blob)
        with open(
            os.path.join(out_dir, f"part-{pid:05d}.cdx.csv"), "w"
        ) as fh:
            for c in cdx:
                fh.write(
                    f'{c["url"]},{c["warc_ts"]:%Y-%m-%dT%H:%M:%S.000Z},'
                    f'{c["warc_file"]},{c["offset"]},{c["length"]},'
                    f'{c["status_code"]}\n'
                )
        yield pd.DataFrame(
            [(fname, len(recs), len(blob))],
            columns=["warc_file", "n_records", "n_bytes"],
        )

    manifest = combined.mapInPandas(
        write_part, "warc_file string, n_records long, n_bytes long"
    )
    # materialize (the writes are the side effect) and hand back a
    # stable local DataFrame of the manifest rows
    rows = manifest.collect()
    return pages.sparkSession.createDataFrame(
        rows or [], "warc_file string, n_records long, n_bytes long"
    )


# ---------------------------------------------------------------------------
# the sink: serialize response records back to WARC bytes
# ---------------------------------------------------------------------------

def _uri_header_safe(url: str) -> str:
    """WARC header blocks are written latin-1; a crawled IRI with
    characters beyond U+00FF would raise ``UnicodeEncodeError``
    executor-side and fail the whole export partition (ADVICE r3).
    Percent-encode (UTF-8, per RFC 3987 → RFC 3986 mapping) ONLY the
    characters latin-1 can't carry, so every URL already writable
    today round-trips byte-identically."""
    try:
        url.encode("latin-1")
        return url
    except UnicodeEncodeError:
        from urllib.parse import quote

        return "".join(
            ch if ord(ch) < 256 else quote(ch, safe="") for ch in url
        )


def _http_value_safe(key: str, value: str) -> str:
    """The HTTP header block inside a response record is also written
    latin-1, and ``Location:`` carries a crawled URL — the same
    non-latin-1 IRI crash as WARC-Target-URI (ADVICE r3), one builder
    later. URL-valued headers get the percent-encoding guard
    (byte-preserving for every already-writable value); any other
    header value writes its UTF-8 bytes via the latin-1 identity
    (mojibake-but-reversible under the latin-1 read path — re-ingest
    recovers the exact bytes, where the old 'replace' fallback
    destroyed them; ADVICE r4) instead of failing the export
    partition."""
    if key.lower() == "location":
        return _uri_header_safe(value)
    try:
        value.encode("latin-1")
        return value
    except UnicodeEncodeError:
        return value.encode("utf-8").decode("latin-1")


def warc_response_record(
    url: str,
    ts: datetime,
    body: bytes,
    status: int = 200,
    http_headers: list[tuple[str, str]] | None = None,
) -> bytes:
    """One standard WARC/1.0 response record (uncompressed)."""
    reason = {200: "OK", 301: "Moved Permanently", 404: "Not Found",
              401: "Unauthorized"}.get(status, "Status")
    hh = http_headers or [("Content-Type", "text/html; charset=utf-8")]
    http_head = f"HTTP/1.1 {status} {reason}\r\n" + "".join(
        f"{k}: {_http_value_safe(k, v)}\r\n" for k, v in hh
    )
    payload = http_head.encode("latin-1") + b"\r\n" + body
    date = ts.strftime("%Y-%m-%dT%H:%M:%SZ")
    warc_head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {_uri_header_safe(url)}\r\n"
        f"WARC-Date: {date}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(payload)}\r\n"
    )
    return warc_head.encode("latin-1") + b"\r\n" + payload + b"\r\n\r\n"


def warc_bytes(records: list[dict], per_record_gzip: bool = False) -> bytes:
    """Serialize record dicts (url, ts, body, status, http_headers?)
    to a WARC file image — one gzip member per record when
    ``per_record_gzip`` (the Common Crawl layout)."""
    return warc_bytes_indexed(records, per_record_gzip)[0]


def warc_bytes_indexed(
    records: list[dict],
    per_record_gzip: bool = False,
    warc_file: str = "",
) -> tuple[bytes, list[dict]]:
    """Serialize + build the CDX-style index (Common Crawl's cdxj
    essentials: url, timestamp, filename, byte offset, record length).
    With per-record gzip each (offset, length) slice is an
    independently decompressible member — the unit of the
    record-granular read path below."""
    out = bytearray()
    cdx: list[dict] = []
    for r in records:
        blob = warc_response_record(
            r["url"], r["ts"], r["body"], r.get("status", 200),
            r.get("http_headers"),
        )
        if per_record_gzip:
            gz = zlib.compressobj(9, zlib.DEFLATED, 31)
            member = gz.compress(blob) + gz.flush()
        else:
            member = blob
        cdx.append(
            {
                "url": r["url"],
                "warc_ts": r["ts"],
                "warc_file": warc_file,
                "offset": len(out),
                "length": len(member),
                "status_code": r.get("status", 200),
            }
        )
        out += member
    return bytes(out), cdx


CDX_SCHEMA = (
    "url string, warc_ts timestamp, warc_file string, "
    "offset long, length long, status_code int"
)


def read_warc_by_cdx(spark_or_cdx, cdx: DataFrame | None = None) -> DataFrame:
    """Record-granular WARC reads driven by a CDX index DataFrame
    (CDX_SCHEMA): each task range-reads only its records' (offset,
    length) slices, so one multi-GiB WARC shards across as many tasks
    as the index is partitioned into — the split path the file-per-
    task reader can't do — and any predicate on the index (url prefix,
    status, time range) prunes bytes BEFORE they are read. Locally the
    range read is a seek; on a cluster the same code path is the
    filesystem's range request. Accepts (spark, cdx) or just (cdx)."""
    cdx_df = cdx if cdx is not None else spark_or_cdx

    def fetch(batches):
        for pdf in batches:
            rows: list[tuple] = []
            for fname, grp in pdf.groupby("warc_file", sort=False):
                path = str(fname)
                if path.startswith("file:"):
                    path = path[len("file:"):]
                with open(path, "rb") as fh:
                    for off, ln in zip(grp["offset"], grp["length"]):
                        fh.seek(int(off))
                        rows.extend(
                            parse_warc_file(str(fname), fh.read(int(ln)))
                        )
            out = pd.DataFrame(rows, columns=_RECORD_COLS)
            if rows:
                out["warc_ts"] = pd.to_datetime(out["warc_ts"])
            yield out

    return cdx_df.mapInPandas(fetch, RECORD_SCHEMA)


# ---------------------------------------------------------------------------
# WET face (Common Crawl *.warc.wet — 'conversion' records of extracted text)
# ---------------------------------------------------------------------------

WET_SCHEMA = (
    "url string, warc_ts timestamp, text string, source_file string"
)
_WET_COLS = ["url", "warc_ts", "text", "source_file"]


def warc_conversion_record(url: str, ts: datetime, text: str) -> bytes:
    """One WARC/1.0 ``conversion`` record (the WET layout: payload is
    the extracted plain text, Content-Type text/plain)."""
    payload = text.encode("utf-8")
    date = ts.strftime("%Y-%m-%dT%H:%M:%SZ")
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        f"WARC-Target-URI: {_uri_header_safe(url)}\r\n"
        f"WARC-Date: {date}\r\n"
        "Content-Type: text/plain\r\n"
        f"Content-Length: {len(payload)}\r\n"
    )
    return head.encode("latin-1") + b"\r\n" + payload + b"\r\n\r\n"


def wet_bytes(records: list[dict], per_record_gzip: bool = False) -> bytes:
    """Serialize (url, ts, text) dicts to a WET file image — one gzip
    member per record when ``per_record_gzip`` (Common Crawl layout)."""
    import gzip as _gzip

    out = []
    for r in records:
        blob = warc_conversion_record(r["url"], r["ts"], r["text"])
        out.append(_gzip.compress(blob) if per_record_gzip else blob)
    return b"".join(out)


def parse_wet_file(name: str, raw: bytes) -> list[tuple]:
    """One WET file (plain or gzip) → (_WET_COLS) rows, ``conversion``
    records only (response records in a mixed archive are skipped —
    use parse_warc_file for those)."""
    if raw[:2] == b"\x1f\x8b":
        raw = gunzip_members(raw)
    rows = []
    for hdrs, payload in iter_warc_records(raw):
        if hdrs.get("warc-type") != "conversion":
            continue
        url = hdrs.get("warc-target-uri")
        if not url:
            continue
        rows.append(
            (
                url,
                _parse_warc_date(hdrs.get("warc-date", "")),
                payload.decode("utf-8", errors="replace"),
                name,
            )
        )
    return rows


def read_wet(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """WET file(s)/glob → DataFrame of conversion records. Same
    distribution contract as ``read_warc``: one file per binaryFile
    task, parsing inside mapInPandas Arrow batches, no driver bytes."""
    bf = spark.read.format("binaryFile").load(paths).select("path", "content")

    def parse(batches):
        for pdf in batches:
            rows: list[tuple] = []
            for path, content in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_wet_file(str(path), bytes(content)))
            out = pd.DataFrame(rows, columns=_WET_COLS)
            if rows:
                out["warc_ts"] = pd.to_datetime(out["warc_ts"])
            yield out

    return bf.mapInPandas(parse, WET_SCHEMA)


def wet_documents(wet: DataFrame) -> DataFrame:
    """Conversion records → the documents-table shape the t_*/dedup
    query families consume: (url, warc_ts, text, source, n_chars),
    source = lower host[:port]. Pure codegen projection."""
    from node_crawler_spark.functions.urlkit import hostport_col

    source = hostport_col(F.col("url"))
    return wet.select(
        "url",
        "warc_ts",
        "text",
        source.alias("source"),
        F.length("text").cast("long").alias("n_chars"),
    )


def export_wet(
    docs: DataFrame, out_dir: str, per_record_gzip: bool = True
) -> DataFrame:
    """Distributed WET export sink: (url, warc_ts, text) rows →
    ``part-NNNNN.warc.wet[.gz]`` per partition, written executor-side
    like ``export_warc`` (repartition the input to choose shard
    count). Returns the manifest (wet_file, n_records, n_bytes).
    The crawl→WET path: feed ``res.crawled(spark)`` joined to the
    page store's warc_ts — text is the byte-identical extraction the
    crawl committed."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    suffix = ".warc.wet.gz" if per_record_gzip else ".warc.wet"
    src = docs.select("url", _epoch_us_col(), "text")

    def write_part(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        recs: list[dict] = []
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                recs.append(
                    {
                        "url": r.url,
                        "ts": _utc_naive(r.warc_us),
                        "text": r.text or "",
                    }
                )
        if not recs:
            yield pd.DataFrame(columns=["wet_file", "n_records", "n_bytes"])
            return
        fname = os.path.join(out_dir, f"part-{pid:05d}{suffix}")
        blob = wet_bytes(recs, per_record_gzip)
        with open(fname, "wb") as fh:
            fh.write(blob)
        yield pd.DataFrame(
            [(fname, len(recs), len(blob))],
            columns=["wet_file", "n_records", "n_bytes"],
        )

    manifest = src.mapInPandas(
        write_part, "wet_file string, n_records long, n_bytes long"
    )
    rows = manifest.collect()
    return docs.sparkSession.createDataFrame(
        rows or [], "wet_file string, n_records long, n_bytes long"
    )


# ---------------------------------------------------------------------------
# WAT face (Common Crawl metadata archives — the third of the trio:
# WARC = raw responses, WET = extracted text, WAT = per-page metadata
# as JSON, most importantly the outlink list. A WAT is the WEB GRAPH
# without the bodies: ~10× smaller than the WARC it describes, and the
# input PageRank/HITS/anchor pipelines actually want.)
# ---------------------------------------------------------------------------

WAT_SCHEMA = (
    "url string, warc_ts timestamp, links array<string>, title string, "
    "source_file string"
)
_WAT_COLS = ["url", "warc_ts", "links", "title", "source_file"]


def warc_metadata_record(
    url: str, ts: datetime, links: list[str], title: str | None = None
) -> bytes:
    """One WARC/1.0 ``metadata`` record in the Common Crawl WAT layout:
    payload is a JSON envelope whose
    ``Envelope.Payload-Metadata.HTTP-Response-Metadata.HTML-Metadata``
    carries the outlink list (``Links: [{"path": "A@/href", "url": …}]``)
    and optional ``Head.Title``. Serialization is deterministic
    (sorted keys, fixed separators) so the export round-trips
    byte-identically."""
    import json

    html_meta: dict = {
        "Links": [{"path": "A@/href", "url": u} for u in links]
    }
    if title is not None:
        html_meta["Head"] = {"Title": title}
    env = {
        "Envelope": {
            "WARC-Header-Metadata": {
                "WARC-Target-URI": url,
                "WARC-Date": ts.strftime("%Y-%m-%dT%H:%M:%SZ"),
            },
            "Payload-Metadata": {
                "HTTP-Response-Metadata": {"HTML-Metadata": html_meta}
            },
        }
    }
    payload = json.dumps(env, sort_keys=True, separators=(",", ":")).encode(
        "utf-8"
    )
    date = ts.strftime("%Y-%m-%dT%H:%M:%SZ")
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: metadata\r\n"
        f"WARC-Target-URI: {_uri_header_safe(url)}\r\n"
        f"WARC-Date: {date}\r\n"
        "Content-Type: application/json\r\n"
        f"Content-Length: {len(payload)}\r\n"
    )
    return head.encode("latin-1") + b"\r\n" + payload + b"\r\n\r\n"


def wat_bytes(records: list[dict], per_record_gzip: bool = False) -> bytes:
    """Serialize (url, ts, links[, title]) dicts to a WAT file image —
    one gzip member per record when ``per_record_gzip`` (Common Crawl
    layout)."""
    import gzip as _gzip

    out = []
    for r in records:
        blob = warc_metadata_record(
            r["url"], r["ts"], r.get("links") or [], r.get("title")
        )
        out.append(_gzip.compress(blob) if per_record_gzip else blob)
    return b"".join(out)


def parse_wat_file(name: str, raw: bytes) -> list[tuple]:
    """One WAT file (plain or gzip) → (_WAT_COLS) rows, ``metadata``
    records only; non-JSON or linkless payloads yield empty link
    arrays rather than errors (Common Crawl WATs carry records for
    robots.txt and non-HTML responses too)."""
    import json

    if raw[:2] == b"\x1f\x8b":
        raw = gunzip_members(raw)
    rows = []
    for hdrs, payload in iter_warc_records(raw):
        if hdrs.get("warc-type") != "metadata":
            continue
        url = hdrs.get("warc-target-uri")
        if not url:
            continue
        links: list[str] = []
        title = None
        try:
            env = json.loads(payload.decode("utf-8", errors="replace"))
            hm = (
                env.get("Envelope", {})
                .get("Payload-Metadata", {})
                .get("HTTP-Response-Metadata", {})
                .get("HTML-Metadata", {})
            )
            links = [
                li["url"]
                for li in hm.get("Links", [])
                if isinstance(li, dict) and "url" in li
            ]
            title = hm.get("Head", {}).get("Title")
        except (ValueError, AttributeError):
            pass  # malformed envelope — keep the record, empty links
        rows.append(
            (url, _parse_warc_date(hdrs.get("warc-date", "")), links, title, name)
        )
    return rows


def read_wat(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """WAT file(s)/glob → DataFrame of metadata records. Same
    distribution contract as ``read_warc``/``read_wet``: one file per
    binaryFile task, parsing inside mapInPandas Arrow batches, no
    driver bytes."""
    bf = spark.read.format("binaryFile").load(paths).select("path", "content")

    def parse(batches):
        for pdf in batches:
            rows: list[tuple] = []
            for path, content in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_wat_file(str(path), bytes(content)))
            out = pd.DataFrame(rows, columns=_WAT_COLS)
            if rows:
                out["warc_ts"] = pd.to_datetime(out["warc_ts"])
            yield out

    return bf.mapInPandas(parse, WAT_SCHEMA)


def wat_edges(wat: DataFrame) -> DataFrame:
    """Metadata records → the (src, dst) edge list
    ``operators/linkgraph.py``'s PageRank/HITS consume — the WAT is
    the web graph without the bodies, so rank jobs read ~10× fewer
    bytes than off the WARC. Pure posexplode, link order preserved
    in ``pos``."""
    return wat.select(
        F.col("url").alias("src"),
        F.posexplode_outer("links").alias("pos", "dst"),
    ).where(F.col("dst").isNotNull())


def export_wat(
    crawled: DataFrame, out_dir: str, per_record_gzip: bool = True
) -> DataFrame:
    """Distributed WAT export sink: (url, warc_ts, links[, title])
    rows → ``part-NNNNN.warc.wat[.gz]`` per partition, written
    executor-side like ``export_warc``/``export_wet``. Returns the
    manifest (wat_file, n_records, n_bytes). The crawl→WAT path:
    ``res.crawled(spark)`` already carries the per-page outlink
    array the reference's onPageCrawl exposes (crawler.js:93-107) —
    this archives the link graph alone."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    suffix = ".warc.wat.gz" if per_record_gzip else ".warc.wat"
    cols = ["url", "links"] + (
        ["title"] if "title" in crawled.columns else []
    )
    src = crawled.select(_epoch_us_col(), *cols)

    def write_part(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        recs: list[dict] = []
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                recs.append(
                    {
                        "url": r.url,
                        "ts": _utc_naive(r.warc_us),
                        "links": list(r.links) if r.links is not None else [],
                        "title": getattr(r, "title", None),
                    }
                )
        if not recs:
            yield pd.DataFrame(columns=["wat_file", "n_records", "n_bytes"])
            return
        fname = os.path.join(out_dir, f"part-{pid:05d}{suffix}")
        blob = wat_bytes(recs, per_record_gzip)
        with open(fname, "wb") as fh:
            fh.write(blob)
        yield pd.DataFrame(
            [(fname, len(recs), len(blob))],
            columns=["wat_file", "n_records", "n_bytes"],
        )

    manifest = src.mapInPandas(
        write_part, "wat_file string, n_records long, n_bytes long"
    )
    rows = manifest.collect()
    return crawled.sparkSession.createDataFrame(
        rows or [], "wat_file string, n_records long, n_bytes long"
    )
