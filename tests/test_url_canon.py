"""canonicalize_urls contracts: www-stripping vs subdomain-keeping, the
two-level public-suffix rule, tracking-param/fragment removal, and
trailing-slash folding."""

from __future__ import annotations

from kinesis_app_spark.operators.curation import canonicalize_urls


def _canon(spark, urls):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "id long, url string"
    )
    return {
        r["id"]: (r["canon_host"], r["reg_domain"], r["canonical_url"])
        for r in canonicalize_urls(df).collect()
    }


def test_host_and_registrable_domain_rules(spark):
    out = _canon(
        spark,
        [
            "https://WWW.Example.COM/a",        # www stripped, lowered
            "http://cdn.example.com/a",          # cdn KEPT in host
            "https://news.bbc.co.uk/x",          # 2-level public suffix
            "https://example.io/x",              # plain 2-label host
        ],
    )
    assert out[0][0] == "example.com" and out[0][1] == "example.com"
    assert out[1][0] == "cdn.example.com" and out[1][1] == "example.com"
    assert out[2][0] == "news.bbc.co.uk" and out[2][1] == "bbc.co.uk"
    assert out[3][1] == "example.io"


def test_variants_fold_to_one_canonical_url(spark):
    out = _canon(
        spark,
        [
            "http://www.shop.com/item/9/?utm_source=a&id=7&utm_medium=b#top",
            "https://Shop.com/item/9?id=7",
            "https://shop.com/item/9/?id=7&utm_campaign=z",
        ],
    )
    vals = {v[2] for v in out.values()}
    assert vals == {"https://shop.com/item/9?id=7"}


def test_no_query_and_no_id_param(spark):
    out = _canon(
        spark,
        ["https://a.org/p/", "https://a.org/p?utm_source=x"],
    )
    assert {v[2] for v in out.values()} == {"https://a.org/p"}
