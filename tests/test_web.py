"""URL parsing/normalization + PII scrubbing (functions/web.py).

Expected values double-checked against a DuckDB RE2 evaluation of the
same regex chains (the oracle twin for these functions)."""

from pyspark.sql import functions as F

from sedona_db_spark.functions import web as W


def _one(spark, url, col):
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(col(F.col("url")).alias("v")).first()["v"]


def test_url_parts(spark):
    u = "HTTPS://Site7.Example.COM:443/Path/42?utm_source=x&id=9#frag"
    df = spark.createDataFrame([(u,)], "url string")
    row = df.select(
        W.url_scheme(F.col("url")).alias("s"),
        W.url_host(F.col("url")).alias("h"),
        W.url_port(F.col("url")).alias("p"),
        W.url_path(F.col("url")).alias("pa"),
        W.url_query(F.col("url")).alias("q"),
        W.url_domain(F.col("url")).alias("d"),
    ).first()
    assert row["s"] == "https"
    assert row["h"] == "site7.example.com"
    assert row["p"] == 443
    assert row["pa"] == "/Path/42"
    assert row["q"] == "utm_source=x&id=9"
    assert row["d"] == "example.com"


def test_url_parts_non_url(spark):
    row = (
        spark.createDataFrame([("not a url at all",)], "url string")
        .select(
            W.url_scheme(F.col("url")).alias("s"),
            W.url_host(F.col("url")).alias("h"),
            W.url_port(F.col("url")).alias("p"),
        )
        .first()
    )
    assert row["s"] == "" and row["h"] == "" and row["p"] is None


def test_normalize_url(spark):
    cases = {
        # utm + fragment dropped, scheme/host lowercased, :443 dropped
        "HTTPS://Site7.Example.COM:443/Path/42?utm_source=x&id=9#frag":
            "https://site7.example.com/Path/42?id=9",
        # :80 dropped for http
        "http://a.b.co.uk:80/": "http://a.b.co.uk/",
        # non-default port kept, mid-query utm dropped
        "http://user:pw@Host.net:8080/x?a=1&utm_campaign=z&b=2":
            "http://user:pw@host.net:8080/x?a=1&b=2",
        # whole query was tracking -> trailing '?' dropped
        "https://example.org?utm_medium=email": "https://example.org",
        # leading utm params dropped, '?&' re-tidied
        "https://example.org/q?utm_a=1&utm_b=2&c=3": "https://example.org/q?c=3",
        # untouched
        "ftp://files.example.net/pub": "ftp://files.example.net/pub",
        # a non-tracking param whose NAME merely contains 'utm_' survives
        # (the unanchored regex corrupted this to '?xb=2' — ADVICE r3)
        "https://example.org/q?xutm_a=1&b=2": "https://example.org/q?xutm_a=1&b=2",
        # run of consecutive utm params mid-query
        "https://example.org/q?utm_a=1&utm_b=2&utm_c=3&keep=4":
            "https://example.org/q?keep=4",
    }
    for raw, want in cases.items():
        assert _one(spark, raw, W.normalize_url) == want, raw


def test_pii_redact_and_counts(spark):
    t = "reach me at John.Doe+spam@mail.example.com or 192.168.3.7, tel +1 555 010 9988"
    df = spark.createDataFrame([(t,)], "text string")
    c = W.pii_counts(F.col("text"))
    row = df.select(
        *[v.alias(k) for k, v in c.items()],
        W.redact_pii(F.col("text")).alias("red"),
    ).first()
    assert row["n_emails"] == 1
    assert row["n_ipv4"] == 1
    assert row["n_phones"] == 1
    assert row["red"] == "reach me at <EMAIL> or <IP>, tel <PHONE>"


def test_pii_redact_order_ip_before_phone(spark):
    # the phone rule must not consume dotted quads
    t = "server 10.0.0.255 up"
    assert _one(spark, t, W.redact_pii) == "server <IP> up"


def test_pii_no_false_positive_on_plain_text(spark):
    t = "plain text with no pii at all"
    assert _one(spark, t, W.redact_pii) == t
