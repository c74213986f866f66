"""HTML/boilerplate text extraction (r14, VERDICT r13 item 4) — the
stage every public web pipeline (C4, CCNet, RefinedWeb — public
methodology) runs BEFORE url/content dedup and quality gating: strip
markup down to text and emit the structure signals the boilerplate
gates cut on (link density, text/markup ratio).

North-star extension (no reference analogue; BASELINE.json).

Everything is CODEGEN string/regex expressions — no UDF, no shuffle —
and every rule is mirrored regex-for-regex in the DuckDB oracle twin
(the ``functions/urls.py`` precedent). Pipeline order is the standard
safe one:

1. strip comments ``<!-- ... -->`` (dotall, non-greedy);
2. strip ``<script>``/``<style>`` BLOCKS including their bodies
   (case-insensitive, dotall, non-greedy) — their contents are code,
   not text;
3. replace every remaining tag ``<[^>]+>`` with a space (block
   boundaries must not glue words together);
4. decode the common entities AFTER tag stripping (so a decoded ``&lt;``
   can never create a tag — the standard injection-safe order):
   ``&nbsp;``->space, ``&lt;``/``&gt;``/``&quot;``/``&#39;``, and
   ``&amp;`` LAST (so ``&amp;lt;`` decodes to the literal ``&lt;``);
5. collapse whitespace runs to single spaces and trim.

Signals (the RefinedWeb/C4 definitions):

- ``text_ratio``   = extracted-text chars / raw-html chars (ROUND 6);
- ``link_density`` = anchor-inner-text chars / extracted-text chars
  (ROUND 6) — anchor inner texts are taken from the comment/script-
  stripped html, tag-stripped and whitespace-collapsed individually
  (entity decode is skipped inside anchors: it cannot change the ratio
  materially and keeps the per-link HOF chain short — the HOF work is
  bounded by the LINK COUNT, not text length, so the CLAUDE.md
  per-element cost rule does not bite);
- ``n_tags`` / ``n_links`` — raw structure counts.

NULL html propagates NULL everywhere (the family contract).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_COMMENT_RE = r"(?s)<!--.*?-->"
_SCRIPT_RE = r"(?is)<script\b[^>]*>.*?</script>"
_STYLE_RE = r"(?is)<style\b[^>]*>.*?</style>"
_TAG_RE = r"<[^>]+>"
_ANCHOR_RE = r"(?is)<a\b[^>]*>(.*?)</a>"

# (pattern, replacement) applied IN ORDER after tag stripping
_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _strip_blocks(html: Column) -> Column:
    """Comments + script/style blocks removed (stages 1-2)."""
    out = F.regexp_replace(html, _COMMENT_RE, " ")
    out = F.regexp_replace(out, _SCRIPT_RE, " ")
    return F.regexp_replace(out, _STYLE_RE, " ")


def _collapse_ws(s: Column) -> Column:
    return F.trim(F.regexp_replace(s, r"\s+", " "))


def html_text(html: Column | str) -> Column:
    """Extracted clean text of ``html`` as one codegen expression
    (stages 1-5 above); NULL for NULL input."""
    out = F.regexp_replace(_strip_blocks(_col(html)), _TAG_RE, " ")
    for pat, repl in _ENTITIES:
        out = F.replace(out, F.lit(pat), F.lit(repl))
    return _collapse_ws(out)


def html_link_text_chars(html: Column | str) -> Column:
    """Total characters of anchor INNER text (tag-stripped, whitespace-
    collapsed per anchor) — the link-density numerator. 0 when no
    anchors; NULL for NULL input."""
    inner = F.regexp_extract_all(_strip_blocks(_col(html)), F.lit(_ANCHOR_RE), 1)
    lens = F.transform(
        inner,
        lambda el: F.length(
            _collapse_ws(F.regexp_replace(el, _TAG_RE, " "))
        ).cast("long"),
    )
    return F.aggregate(lens, F.lit(0).cast("long"), lambda acc, x: acc + x)


def html_stats(
    df: DataFrame, html_col: str, text_out: str = "text"
) -> DataFrame:
    """Append the extraction + boilerplate-signal columns: ``text``,
    ``n_tags``, ``n_links``, ``text_ratio``, ``link_density`` (see
    module docstring for the definitions; ratios ROUND(6), NULL-guarded
    denominators)."""
    h = F.col(html_col)
    out = df.withColumn(text_out, html_text(h))
    n_tags = F.size(F.regexp_extract_all(h, F.lit(_TAG_RE), 0)).cast("long")
    n_links = F.size(
        F.regexp_extract_all(h, F.lit(r"(?is)<a\b[^>]*>"), 0)
    ).cast("long")
    text_len = F.length(F.col(text_out)).cast("double")
    html_len = F.length(h).cast("double")
    return (
        out.withColumn("n_tags", F.when(h.isNotNull(), n_tags))
        .withColumn("n_links", F.when(h.isNotNull(), n_links))
        .withColumn(
            "text_ratio",
            F.when(html_len > 0, F.round(text_len / html_len, 6)),
        )
        .withColumn(
            "link_density",
            F.when(
                text_len > 0,
                F.round(
                    html_link_text_chars(h).cast("double") / text_len, 6
                ),
            ).when(html_len.isNotNull(), F.lit(None).cast("double")),
        )
    )


def boilerplate_gate(
    df: DataFrame,
    html_col: str,
    max_link_density: float = 0.5,
    min_text_ratio: float = 0.1,
    min_text_chars: int = 100,
    text_out: str = "text",
    keep_col: str = "keep",
) -> DataFrame:
    """The C4/RefinedWeb-shape boilerplate gate as a DECISION column
    (the curation decision-table convention — emitting the verdict
    instead of filtering keeps every signal under the value check):
    keep iff link_density <= max_link_density AND text_ratio >=
    min_text_ratio AND extracted text >= min_text_chars chars. Rows
    whose signals are NULL (NULL/empty html, empty text) are not
    keepable."""
    out = html_stats(df, html_col, text_out)
    keep = (
        (F.col("link_density") <= F.lit(max_link_density))
        & (F.col("text_ratio") >= F.lit(min_text_ratio))
        & (F.length(F.col(text_out)) >= F.lit(min_text_chars))
    )
    return out.withColumn(keep_col, F.coalesce(keep, F.lit(False)))


#: block-level boundaries -> paragraph breaks (C4 extracts text at block
#: granularity; flattening them to spaces destroys the paragraph
#: structure the CCNet/RefinedWeb dedup first stage keys on)
_BLOCK_RE = r"(?is)</(?:p|div|h[1-6]|li|tr|table|ul|ol|blockquote)\s*>|<br\s*/?>"


def html_text_blocks(html: Column | str) -> Column:
    """Extracted clean text of ``html`` with BLOCK boundaries preserved
    as newlines — the paragraph-structured extraction the web pipeline
    feeds into ``paragraph_dedup`` (C4 keeps lines, CCNet dedups
    paragraphs; the flat :func:`html_text` variant is the per-document
    signal/gate face). One codegen regex chain, replayed regex-for-regex
    by the oracle:

    1-2. comments + script/style blocks out (shared ``_strip_blocks``);
    3.   block-CLOSING tags and ``<br>`` -> newline;
    4.   remaining tags -> space;
    5.   entity decode in the shared fixed order (``&amp;`` last);
    6.   horizontal whitespace collapsed to single spaces;
    7.   newline runs (with surrounding spaces) collapsed to one
         newline; leading/trailing space+newline trimmed.

    NULL for NULL input. Empty segments between consecutive blocks are
    dropped by step 7, so the output is exactly the newline-joined
    nonempty paragraphs — ``paragraph_dedup``'s input convention."""
    out = F.regexp_replace(_strip_blocks(_col(html)), _BLOCK_RE, "\n")
    out = F.regexp_replace(out, _TAG_RE, " ")
    for pat, repl in _ENTITIES:
        out = F.replace(out, F.lit(pat), F.lit(repl))
    out = F.regexp_replace(out, r"[ \t\f\r]+", " ")
    out = F.regexp_replace(out, r" ?\n[ \n]*", "\n")
    return F.regexp_replace(out, r"^[ \n]+|[ \n]+$", "")
