"""WARC source — round-trip byte identity with the pages table.

The north-rule input is Common-Crawl-style pages; Common Crawl ships
WARC, so the gate here is: synthesize pages -> write WARC (per-record
gzip members) -> distributed read -> html bytes, urls, and timestamps
identical, and `extract_text_bytes` over the round-tripped html equals
the synthesized text column byte-for-byte.
"""

import gzip
import os

import pytest

from sedona_db_spark.sources import pages as P
from sedona_db_spark.sources import warc as W


def test_record_roundtrip_unit():
    html = b"<html><body><p>hello</p></body></html>"
    rec = W.build_record("https://a.example/x", "2025-01-01T00:00:05Z", html)
    rows = list(W.parse_warc_bytes(rec))
    assert rows == [("https://a.example/x", "2025-01-01T00:00:05Z", html)]


def test_gzip_members_concatenate(tmp_path):
    recs = [
        ("https://a.example/1", "2025-01-01T00:00:01Z", b"<p>one</p>"),
        ("https://a.example/2", "2025-01-01T00:00:02Z", b"<p>two</p>"),
    ]
    p = str(tmp_path / "t.warc.gz")
    assert W.write_warc_file(recs, p, compress=True) == 2
    data = open(p, "rb").read()
    assert data[:2] == b"\x1f\x8b"
    # per-record members: two gzip magics present
    assert data.count(b"\x1f\x8b\x08") >= 2
    assert [r[0] for r in W.parse_warc_bytes(data)] == [r[0] for r in recs]


def test_deterministic_bytes(tmp_path):
    recs = [("https://a.example/1", "2025-01-01T00:00:01Z", b"<p>one</p>")]
    p1, p2 = str(tmp_path / "a.warc.gz"), str(tmp_path / "b.warc.gz")
    W.write_warc_file(recs, p1)
    W.write_warc_file(recs, p2)
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_distributed_roundtrip_byte_identity(spark, tmp_path):
    n = 400
    pages = P.synthesize_pages(spark, n, seed=7, partitions=4).cache()
    out = str(tmp_path / "warcs")
    files = W.write_warc(pages, out, compress=True)
    assert files == 4 and len(os.listdir(out)) == 4

    back = W.read_warc(spark, out)
    a = {r.url: (r.warc_ts, bytes(r.html)) for r in pages.collect()}
    b = {r.url: (r.warc_ts, bytes(r.html)) for r in back.collect()}
    assert set(a) == set(b) and len(b) == n
    for url in a:
        assert a[url] == b[url], url

    # the per-url extraction invariant holds through the WARC round trip
    texts = {r.url: r.text for r in pages.collect()}
    for url, (_, html) in b.items():
        assert P.extract_text_bytes(html).decode("utf-8") == texts[url]


def test_roundtrip_in_non_utc_session_timezone(spark, tmp_path):
    # WARC-Date carries a hardcoded 'Z': the writer must format the UTC
    # instant regardless of spark.sql.session.timeZone, or the timestamp
    # shifts by the session offset on round-trip.
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    try:
        pages = P.synthesize_pages(spark, 20, seed=9, partitions=1).cache()
        out = str(tmp_path / "tz")
        W.write_warc(pages, out, compress=True)
        a = {r.url: r.warc_ts for r in pages.collect()}
        b = {r.url: r.warc_ts for r in W.read_warc(spark, out).collect()}
        assert a == b
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_plain_warc_roundtrip(spark, tmp_path):
    pages = P.synthesize_pages(spark, 50, seed=3, partitions=1)
    out = str(tmp_path / "plain")
    W.write_warc(pages, out, compress=False)
    files = os.listdir(out)
    assert files == ["part-00000.warc"]
    raw = open(os.path.join(out, files[0]), "rb").read()
    assert raw.startswith(b"WARC/1.0\r\n")
    assert W.read_warc(spark, out).count() == 50


def test_non_response_records_skipped():
    html = b"<p>x</p>"
    rec = W.build_record("https://a.example/x", "2025-01-01T00:00:05Z", html)
    warcinfo = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nabcd\r\n\r\n"
    )
    rows = list(W.parse_warc_bytes(warcinfo + rec))
    assert len(rows) == 1 and rows[0][2] == html
