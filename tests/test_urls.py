"""URL curation (functions/urls.py, r13): canonicalization rules,
dirty-URL contract, dedup survivor rule, and the host key."""

from __future__ import annotations

from pyspark.sql import functions as F

from metadata_ingestion_framework_spark.functions.urls import (
    normalize_url,
    url_dedup,
    url_host,
)

CASES = [
    # (raw, canonical)
    ("HTTP://WWW.Example.COM:80/a/b/?utm_source=x&z=1&a=2#frag",
     "http://www.example.com/a/b?a=2&z=1"),
    ("https://site.org:443/path", "https://site.org/path"),
    ("https://site.org:8080/path", "https://site.org:8080/path"),
    ("http://h.com/p?gclid=123&fbclid=4&ref=tw&utm_medium=m",
     "http://h.com/p"),
    ("http://h.com/p?b=2&id=7", "http://h.com/p?b=2&id=7"),
    ("http://h.com/p?id=7&b=2", "http://h.com/p?b=2&id=7"),
    ("  http://h.com/trail///  ", "http://h.com/trail"),
    ("ftp://Files.Net/X", "ftp://files.net/X"),  # path case preserved
    ("no-scheme.com/x", None),
    (None, None),
]


def test_normalize_url_cases(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "i long, url string"
    )
    got = {
        r.i: r.n
        for r in df.select("i", normalize_url("url").alias("n")).collect()
    }
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, (i, CASES[i][0], got[i])


def test_url_dedup_survivors_and_dirty_rows(spark):
    df = spark.createDataFrame(
        [
            (1, "http://A.com/x?utm_source=s"),
            (2, "HTTP://a.COM:80/x"),      # same canonical as 1 -> dropped
            (3, "http://a.com/y"),
            (4, "not a url"),              # dirty: kept
            (5, "also not a url"),         # dirty: kept (NOT grouped with 4)
            (6, None),                     # dirty: kept
        ],
        "doc_id long, url string",
    )
    out = url_dedup(df, "url", "doc_id", keep_norm=True)
    rows = {r.doc_id: r["__url_norm"] for r in out.collect()}
    assert set(rows) == {1, 3, 4, 5, 6}
    assert rows[1] == "http://a.com/x"
    assert rows[4] is None and rows[5] is None


def test_url_host(spark):
    df = spark.createDataFrame(
        [
            (1, "https://WWW.News.Example.com:443/a"),
            (2, "http://example.org/b"),
            (3, "nohost"),
        ],
        "i long, url string",
    )
    got = {r.i: r.h for r in df.select("i", url_host("url").alias("h")).collect()}
    assert got[1] == "news.example.com"
    assert got[2] == "example.org"
    # scheme-less input: the regex still yields the leading token as a
    # "host" only when it looks like one; 'nohost' has no dot but the
    # contract is just lowercase-no-port-no-www of the authority
    assert got[3] == "nohost"


def test_dedup_composes_before_content_stages(spark):
    """The production shape: URL dedup first shrinks the corpus exactly
    like an exact-dedup stage — surviving ids are stable (min id) so the
    downstream content dedup sees a deterministic input."""
    df = spark.createDataFrame(
        [(i, f"http://h.com/p{i % 3}?utm_source={i}") for i in range(9)],
        "doc_id long, url string",
    )
    out = url_dedup(df, "url", "doc_id")
    assert sorted(r.doc_id for r in out.collect()) == [0, 1, 2]
    assert out.columns == ["doc_id", "url"]  # helper column dropped


def test_url_blocklist_gate_edges(spark):
    """Suffix matching is on DOT boundaries (no substring false
    positives), subdomains inherit their parent's block but never the
    reverse, path prefixes scope to their domain, www/port/case
    normalize away, and NULL urls gate to NULL."""
    from metadata_ingestion_framework_spark.functions.urls import (
        url_blocklist_gate,
    )

    rows = [
        (0, "https://bad.com/x"),                 # exact domain
        (1, "https://deep.sub.bad.com/x"),        # subdomain inherits
        (2, "https://notbad.com/x"),              # substring must NOT match
        (3, "https://WWW.Bad.COM:443/x"),         # case/port/www normalize
        (4, "https://sub.ok.com/x"),              # blocked subdomain...
        (5, "https://ok.com/x"),                  # ...never blocks parent
        (6, "https://paths.com/ads/banner"),      # path-prefix hit
        (7, "https://paths.com/adsense"),         # prefix match ('/ads' hits)
        (8, "https://paths.com/article"),         # path-prefix miss
        (9, "https://other.com/ads/banner"),      # path rule scoped to domain
        (10, None),                               # NULL -> NULL verdict
    ]
    df = spark.createDataFrame(rows, "id int, url string")
    got = {
        r.id: r.blocked
        for r in url_blocklist_gate(
            df,
            "url",
            [
                ("bad.com", None),
                ("sub.ok.com", None),
                ("paths.com", "/ads"),
            ],
        ).collect()
    }
    assert got == {
        0: True, 1: True, 2: False, 3: True, 4: True, 5: False,
        6: True, 7: True, 8: False, 9: False, 10: None,
    }


def test_url_blocklist_gate_normalizes_entries(spark):
    """ADVICE r18: config entries arrive human-typed — 'Example.com',
    'www.example.com', stray whitespace — and must normalize to the
    same form url_host emits instead of silently never matching."""
    from metadata_ingestion_framework_spark.functions.urls import (
        url_blocklist_gate,
    )

    rows = [
        (0, "https://example.com/x"),
        (1, "https://sub.example.com/x"),
        (2, "https://paths.com/ads/banner"),
        (3, "https://clean.com/x"),
    ]
    df = spark.createDataFrame(rows, "id int, url string")
    got = {
        r.id: r.blocked
        for r in url_blocklist_gate(
            df,
            "url",
            [
                ("Example.com", None),       # case normalizes
                ("www.example.com", None),   # leading www. strips
                (" PATHS.com ", "/ads"),     # whitespace + case on rules
            ],
        ).collect()
    }
    assert got == {0: True, 1: True, 2: True, 3: False}
