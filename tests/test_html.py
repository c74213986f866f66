"""HTML/boilerplate extraction (functions/html.py, r14, VERDICT r13
item 4): strip order (comments/script/style -> tags -> entities ->
whitespace), injection-safe entity decode, boilerplate signals, the
decision gate, and NULL propagation."""

from __future__ import annotations

from pyspark.sql import functions as F

from metadata_ingestion_framework_spark.functions.html import (
    boilerplate_gate,
    html_stats,
    html_text,
)


def _one(spark, html):
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    return html_stats(df, "html").collect()[0]


def test_strip_order_and_entities(spark):
    r = _one(
        spark,
        '<html><head><script>var x="<p>not text</p>";</script>'
        "<style>.c{color:red}</style></head>"
        "<body><!-- comment --><h1>Title&nbsp;One</h1>"
        "<p>A &amp;amp; B &lt;tag&gt;</p></body></html>",
    )
    # script body (even containing markup), style, and comments are gone;
    # &amp;amp; decodes ONCE (amp last); &lt;tag&gt; becomes a literal
    # <tag> and is NOT re-stripped (tags stripped before entity decode)
    assert r.text == "Title One A &amp; B <tag>"


def test_signals_and_gate(spark):
    rows = [
        (1, "<p>" + "word " * 60 + "</p>"),              # texty: keep
        (2, '<a href="u">only a link</a>'),               # all link: cut
        (3, None),                                        # NULL: cut, NULL stats
        (4, ""),                                          # empty: cut
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    out = {
        r.doc_id: r
        for r in boilerplate_gate(df, "html", min_text_chars=50).collect()
    }
    assert out[1].keep and out[1].link_density == 0.0
    assert not out[2].keep and out[2].link_density == 1.0
    assert not out[3].keep and out[3].text is None and out[3].n_tags is None
    assert not out[4].keep and out[4].text == "" and out[4].text_ratio is None


def test_link_density_counts_inner_text_only(spark):
    # 'click here' (10 chars) of 'click here and more text here!' (30)
    r = _one(spark, '<p><a href="/x"><b>click</b> here</a> and more text here!</p>')
    assert r.text == "click here and more text here!"
    assert r.n_links == 1
    assert r.link_density == round(10 / 30, 6)


def test_nested_tags_inside_anchor(spark):
    r = _one(spark, '<a href="u">a<b>b</b>c</a>')
    # tag-stripped anchor inner 'a b c' collapses to 5 chars
    assert r.text == "a b c"
    assert r.link_density == 1.0


def test_expression_composes_in_select(spark):
    df = spark.createDataFrame(
        [(1, "<p>x</p>"), (2, None)], "doc_id long, html string"
    )
    got = {
        r.doc_id: r.t
        for r in df.select("doc_id", html_text("html").alias("t")).collect()
    }
    assert got == {1: "x", 2: None}


def test_composes_as_curation_front_stage(spark):
    """The production order: html -> extract+gate -> the EXISTING text
    pipeline (exact dedup on the extracted text). Two pages with
    different markup but identical text content dedup AFTER extraction
    (markup differences must not defeat content dedup), boilerplate
    pages never reach the dedup stage."""
    from metadata_ingestion_framework_spark.operators.dedup import (
        dedup_exact,
    )

    rows = [
        (1, "<p>" + "same words " * 12 + "</p>"),
        (2, "<div><h1></h1>" + "same words " * 12 + "<br/></div>"),  # same text
        (3, '<a href="u">pure link page</a>'),                        # boilerplate
        (4, "<p>" + "other words " * 12 + "</p>"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    gated = boilerplate_gate(df, "html", min_text_chars=50).filter("keep")
    out = dedup_exact(gated, ["text"], "doc_id")
    assert sorted(r.doc_id for r in out.collect()) == [1, 4]


def test_block_extraction_preserves_paragraphs(spark):
    """html_text_blocks (r15): block-closing tags and <br> become
    paragraph breaks, inline tags become spaces, entities decode in the
    shared order, empty blocks vanish, horizontal runs collapse — the
    paragraph_dedup input convention."""
    from metadata_ingestion_framework_spark.functions.html import (
        html_text_blocks,
    )

    rows = [
        (1, "<div><h1>Title&nbsp;One</h1><p>first  para</p><p></p>"
            "<p>a &amp;amp; b</p>line<br>tail</div>"),
        (2, "<p><b>bold</b> inline</p><!-- gone --><script>var x;</script>"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {
        r.doc_id: r.t
        for r in df.select(
            "doc_id", html_text_blocks("html").alias("t")
        ).collect()
    }
    assert got[1] == "Title One\nfirst para\na &amp; b\nline\ntail"
    assert got[2] == "bold inline"
    assert got[3] is None


def test_block_extraction_feeds_paragraph_dedup(spark):
    """The r15 web order end-to-end: a shared footer paragraph across
    pages survives exactly once after html_text_blocks ->
    paragraph_dedup."""
    from metadata_ingestion_framework_spark.functions.html import (
        html_text_blocks,
    )
    from metadata_ingestion_framework_spark.operators.dedup import (
        paragraph_dedup,
    )

    footer = '<div class="footer"><a href="/a">About</a> | Terms</div>'
    rows = [
        (1, f"<p>unique first body</p>{footer}"),
        (2, f"<p>unique second body</p>{footer}"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    ext = df.select(
        "doc_id", html_text_blocks("html").alias("clean")
    )
    out = {
        r.doc_id: (r.clean_text, r.n_removed)
        for r in paragraph_dedup(ext, "clean", "doc_id").collect()
    }
    assert out[1] == ("unique first body\nAbout | Terms", 0)
    assert out[2] == ("unique second body", 1)
