"""WARC (ISO 28500) source — read/write Common-Crawl-style archives.

The north-rule input is "an Iceberg table of Common-Crawl-style web pages
(url, warc_ts, html, text, lang)"; Common Crawl itself ships WARC files,
so this closes the ingestion edge: WARC bytes -> the pages schema, with
the same byte-identity invariant `sources/pages.py` pins (html payloads
round-trip exactly; `extract_text_bytes` over them is byte-identical).

Format notes (all public spec / Common Crawl convention):
  * a WARC record = header block (CRLF lines, ends with a blank line) +
    Content-Length payload bytes + CRLF CRLF separator,
  * response records carry an HTTP/1.1 response as payload; the html is
    the body after the HTTP header block,
  * `.warc.gz` files are PER-RECORD gzip members (the Common Crawl
    convention, chosen so archives are splittable at member boundaries;
    `gzip.decompress` of the concatenation yields the plain stream),
  * record ids here are CONTENT-DERIVED (md5 of the target URI), not
    uuid4 — deterministic under task retries.

Scale story: one WARC file = one Spark task (`binaryFile` rows are
unsplittable), which is the standard Common-Crawl processing granularity
— the corpus is ~100k files per crawl, so a 1000-executor cluster keeps
full parallelism from file-count alone; `max_records_per_file` bounds
file size on the write side the same way.
"""

from __future__ import annotations

import gzip
import hashlib
import io
from typing import Iterator, List, Optional, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

WARC_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), False),
    ]
)

_CRLF = b"\r\n"


def _record_id(url: str) -> str:
    return "<urn:md5:%s>" % hashlib.md5(url.encode("utf-8")).hexdigest()


def build_record(url: str, ts_iso: str, html: bytes) -> bytes:
    """One WARC/1.0 response record (plain bytes, no compression)."""
    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=UTF-8\r\n"
        + b"Content-Length: %d\r\n\r\n" % len(html)
        + html
    )
    headers = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        + b"WARC-Record-ID: %s\r\n" % _record_id(url).encode()
        + b"WARC-Date: %s\r\n" % ts_iso.encode()
        + b"WARC-Target-URI: %s\r\n" % url.encode()
        + b"Content-Type: application/http; msgtype=response\r\n"
        + b"Content-Length: %d\r\n" % len(http)
    )
    return headers + _CRLF + http + _CRLF + _CRLF


def write_warc_file(records: List[Tuple[str, str, bytes]], path: str,
                    compress: bool = True) -> int:
    """Write (url, iso_ts, html) records to one WARC file; per-record
    gzip members when ``compress`` (Common Crawl convention)."""
    n = 0
    with open(path, "wb") as f:
        for url, ts_iso, html in records:
            raw = build_record(url, ts_iso, html)
            if compress:
                # mtime=0 => deterministic bytes under retries
                buf = io.BytesIO()
                with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                    gz.write(raw)
                f.write(buf.getvalue())
            else:
                f.write(raw)
            n += 1
    return n


def parse_warc_bytes(data: bytes) -> Iterator[Tuple[str, str, bytes]]:
    """Yield (url, warc_date, html) from plain or per-record-gzip WARC
    bytes. Content-Length-driven (spec-correct), no regex over payloads."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)  # members concatenate transparently
    pos = 0
    n = len(data)
    while pos < n:
        end = data.find(_CRLF + _CRLF, pos)
        if end < 0:
            break
        head = data[pos:end].decode("utf-8", "replace")
        fields = {}
        for line in head.split("\r\n")[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                fields[k.strip().lower()] = v.strip()
        clen = int(fields.get("content-length", "0"))
        payload = data[end + 4: end + 4 + clen]
        pos = end + 4 + clen
        while data[pos: pos + 2] == _CRLF:
            pos += 2
        if fields.get("warc-type") != "response":
            continue
        url = fields.get("warc-target-uri", "")
        date = fields.get("warc-date", "")
        # strip the HTTP response header block
        sep = payload.find(_CRLF + _CRLF)
        html = payload[sep + 4:] if sep >= 0 else payload
        yield url, date, html


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC scan: one file per task via ``binaryFile``
    (the Common-Crawl processing granularity), parsed map-side into the
    (url, warc_ts, html) pages shape."""
    files = spark.read.format("binaryFile").load(path).select("content")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for blob in b["content"]:
                rows = list(parse_warc_bytes(bytes(blob)))
                if rows:
                    yield pd.DataFrame(
                        {
                            "url": [r[0] for r in rows],
                            # keep tz-aware UTC: Arrow carries the zone, so
                            # the instant survives any session timeZone (a
                            # naive series would be re-read as session-local)
                            "warc_ts": pd.to_datetime(
                                [r[1] for r in rows], utc=True
                            ),
                            "html": [r[2] for r in rows],
                        }
                    )

    return files.mapInPandas(gen, WARC_SCHEMA)


def write_warc(df: DataFrame, directory: str, compress: bool = True) -> int:
    """WARC export of a pages-shaped frame: each input partition writes
    one ``part-NNNNN.warc[.gz]`` file (deterministic names from the
    partition id; re-runs overwrite in place). Returns the number of
    files written.

    Filesystem contract: tasks ``open()`` on the EXECUTOR's local
    filesystem, so ``directory`` must be a path every executor can write
    and the caller can read — local mode, or a shared mount (NFS / fuse)
    on a cluster.  There is no executor-side Hadoop FileSystem bridge
    from Python workers, so object-store targets should go through the
    parquet/Iceberg writers instead; this export exists for WARC
    wire-format interchange.

    WARC-Date is formatted from the raw UTC instant (``unix_micros``),
    never from the session-timezone rendering, so the ``Z`` suffix is
    correct in any ``spark.sql.session.timeZone``."""
    import os

    os.makedirs(directory, exist_ok=True)
    ext = "warc.gz" if compress else "warc"
    src = df.select(
        "url",
        F.unix_micros(F.col("warc_ts")).alias("ts_us"),
        "html",
    )

    def per_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(directory, f"part-{pid:05d}.{ext}")
        recs: List[Tuple[str, str, bytes]] = []
        for b in batches:
            iso = pd.to_datetime(b["ts_us"], unit="us", utc=True).dt.strftime(
                "%Y-%m-%dT%H:%M:%SZ")
            for url, ts_iso, html in zip(b["url"], iso, b["html"]):
                recs.append((str(url), str(ts_iso), bytes(html)))
        wrote = write_warc_file(recs, path, compress=compress) if recs else 0
        yield pd.DataFrame({"path": [path], "records": [wrote]})

    manifest = src.mapInPandas(per_partition, "path string, records long")
    return manifest.count()
