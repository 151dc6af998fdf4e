"""URL canonicalization rules, each asserted on a crafted URL."""

from __future__ import annotations

from morphik_core_spark.operators.curation import url_canonicalize


def _canon(spark, urls):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "id bigint, url string"
    )
    out = url_canonicalize(df, "url", "id").collect()
    return {r.id: (r.canonical_url, r.registrable_domain) for r in out}


def test_rules(spark):
    got = _canon(
        spark,
        [
            "HTTP://WWW.Ex.COM:80/p?b=2&utm_source=x&a=1#f",  # everything at once
            "https://a.ex.com:443/p",  # default https port stripped
            "https://a.ex.com:80/p",  # :80 on https SURVIVES
            "http://a.ex.com:8080/p",  # non-default port survives
            "http://ex.com/p?utm_a=1&utm_b=2",  # utm-only query -> no '?'
            "http://Sub.Shop.Example.CO.UK/x",  # multi-part suffix eTLD+1
            "http://localhost/x",  # single-label host
            "http://ex.com/CaseKept/Path",  # path case preserved
        ],
    )
    assert got[0] == ("http://www.ex.com/p?a=1&b=2", "ex.com")
    assert got[1] == ("https://a.ex.com/p", "ex.com")
    assert got[2] == ("https://a.ex.com:80/p", "ex.com")
    assert got[3] == ("http://a.ex.com:8080/p", "ex.com")
    assert got[4] == ("http://ex.com/p", "ex.com")
    assert got[5] == ("http://sub.shop.example.co.uk/x", "example.co.uk")
    assert got[6] == ("http://localhost/x", "localhost")
    assert got[7] == ("http://ex.com/CaseKept/Path", "ex.com")


def test_canonical_twins_collapse(spark):
    got = _canon(
        spark,
        [
            "HTTP://WWW.Ex.COM:80/p?b=2&utm_source=x&a=1#frag",
            "http://www.ex.com/p?a=1&b=2",
        ],
    )
    assert got[0][0] == got[1][0]
