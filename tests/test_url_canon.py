"""_canon_url edge cases + idempotence (plans/queries/curate.py): the
crawl-dedup normalizer must be a projection (f∘f = f) and must only
erase identity-irrelevant variation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_wrangle_openstreetmaps_data_spark.plans.queries.curate import (
    _canon_url,
)

CASES = [
    # (dirty, canonical)
    ("http://example.com/p/1", "http://example.com/p/1"),
    ("HTTP://Example.COM/p/1", "http://example.com/p/1"),
    ("Http://WWW.Example.COM:80/p/1", "http://example.com/p/1"),
    ("http://example.com/p/1/", "http://example.com/p/1"),
    ("http://example.com/p/1///", "http://example.com/p/1"),
    ("http://example.com", "http://example.com"),
    ("http://example.com:80", "http://example.com"),
    # non-default port is identity-RELEVANT and survives
    ("http://example.com:8080/x", "http://example.com:8080/x"),
    ("http://example.com/p/1?utm_source=x", "http://example.com/p/1"),
    ("http://example.com/p/1?b=2&a=1", "http://example.com/p/1?a=1&b=2"),
    (
        "http://example.com/p/1?b=2&utm_medium=email&a=1",
        "http://example.com/p/1?a=1&b=2",
    ),
    ("http://example.com/p/1?a=1&&b=2", "http://example.com/p/1?a=1&b=2"),
    # www is stripped only as a leading label
    ("http://wwwx.example.com/p", "http://wwwx.example.com/p"),
    ("https://www.example.com/p", "https://example.com/p"),
    # default-port strip is SCHEME-GATED (r10 advice): 80 is not the
    # https default and 443 is not the http default — both survive
    ("https://example.com:80/x", "https://example.com:80/x"),
    ("http://example.com:443/x", "http://example.com:443/x"),
    ("https://example.com:443/x", "https://example.com/x"),
    ("HTTPS://WWW.Example.com:443", "https://example.com"),
]


@pytest.fixture(scope="module")
def canon_rows(spark):
    df = spark.createDataFrame(
        [(d, w) for d, w in CASES], ["url", "want"]
    ).select(
        "url",
        "want",
        _canon_url(F.col("url")).alias("c1"),
    )
    df = df.select("url", "want", "c1", _canon_url(F.col("c1")).alias("c2"))
    return {r["url"]: (r["want"], r["c1"], r["c2"]) for r in df.collect()}


def test_canonical_values(canon_rows):
    for url, (want, c1, _) in canon_rows.items():
        assert c1 == want, url


def test_idempotent(canon_rows):
    for url, (_, c1, c2) in canon_rows.items():
        assert c2 == c1, url
