"""URL-level curation (r13, VERDICT r12 item 4) — the first stage every
public web-corpus pipeline (C4, CCNet, RefinedWeb — public methodology)
runs BEFORE content dedup: canonicalize the URL, drop exact URL
duplicates, then cap per-domain (the existing ``quota_sample``).

North-star extension (no reference analogue; BASELINE.json).

Everything is CODEGEN string/array expressions — no UDF, no shuffle
beyond the dedup's own groupBy — and every rule is mirrored
regex-for-regex in the DuckDB oracle twin (``parse_url`` deliberately
avoided: it is Hive/Java-specific and not cross-engine checkable).

Normalization rules (the standard canonicalization set):

- trim, strip the ``#fragment``;
- scheme and host:port lowercase (scheme ``HTTPS`` == ``https``);
- default ports stripped (``:80`` for http, ``:443`` for https);
- trailing slashes stripped from the path;
- tracking parameters dropped (``utm_*``, ``gclid``, ``fbclid``,
  ``ref``), remaining query params sorted byte-wise and rejoined —
  param ORDER never distinguishes two URLs;
- a URL with no ``scheme://`` is dirty -> NULL (never dedups with
  anything, the family's NULL-propagation contract).

The per-element HOF work is bounded by the query-param count (a handful
per URL), not a hot inner loop — the CLAUDE.md HOF cost rule does not
bite here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tracking params every major pipeline strips; anchored full-key match
TRACKING_PARAM_RE = r"^(utm_[a-z]+|gclid|fbclid|ref)="
_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"


def normalize_url(url: Column | str) -> Column:
    """Canonical form of ``url`` as a single codegen expression; NULL for
    NULL/scheme-less input."""
    u = F.regexp_replace(F.trim(F.col(url) if isinstance(url, str) else url),
                         r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport)
    )
    pathq = F.regexp_replace(rest, r"^[^/?]*", "")
    path = F.regexp_replace(
        F.regexp_extract(pathq, r"^([^?]*)", 1), r"/+$", ""
    )
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    qpart = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(F.array_sort(params), "&")),
    ).otherwise(F.lit(""))
    return F.when(
        scheme != "",
        F.concat(scheme, F.lit("://"), host, path, qpart),
    )


def url_host(url: Column | str) -> Column:
    """Lowercased host without port or a leading ``www.`` — the
    per-domain quota key (``quota_sample`` composes on this)."""
    u = F.regexp_replace(F.trim(F.col(url) if isinstance(url, str) else url),
                         _SCHEME_RE, "")
    host = F.lower(F.regexp_extract(u, r"^([^/:?#]*)", 1))
    return F.when(
        host != "", F.regexp_replace(host, r"^www\.", "")
    )


def url_dedup(
    df: DataFrame, url_col: str, id_col: str, keep_norm: bool = False
) -> DataFrame:
    """Exact URL dedup on the CANONICAL form: one survivor per normalized
    URL, first-occurrence rule (min id — the ``dedup_exact`` argmin
    convention, same asc-nulls-first tiebreak as ``dedup_window``).
    NULL-normalized (dirty) URLs never dedup: every one is kept (the
    NULL-key contract — a billion scheme-less rows must not collapse
    into one survivor).

    ONE scan, ONE shuffle (r13 review): the earlier clean/dirty
    union-of-filters form re-ran the scan + the ~12-regex
    canonicalization once per branch. Instead a single window keeps
    ``rn == 1`` for canonical groups and EVERYTHING for NULL groups; the
    NULL window partition is salted by the id so a 100 TB pile of dirty
    rows does not serialize into one window task (the kept predicate
    ignores rn for them, so the salt affects only parallelism)."""
    from pyspark.sql import Window

    norm = df.withColumn("__url_norm", normalize_url(url_col))
    salt = F.when(
        F.col("__url_norm").isNull(),
        F.coalesce(F.col(id_col).cast("string"), F.lit("")),
    )
    w = Window.partitionBy(F.col("__url_norm"), salt).orderBy(
        F.col(id_col).asc()
    )
    out = (
        norm.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__url_norm").isNull() | (F.col("__rn") == 1))
        .drop("__rn")
    )
    return out if keep_norm else out.drop("__url_norm")


def url_blocklist_gate(
    df: DataFrame,
    url_col: str,
    blocklist: list[tuple[str, str | None]],
    out_col: str = "blocked",
) -> DataFrame:
    """Domain/path blocklist gate (r17, VERDICT r16 item 5) — the C4
    badwords/blocklist stage that runs AHEAD of :func:`url_dedup` in a
    web-curation pipeline (public methodology). ``blocklist`` rows are
    ``(host_suffix, path_prefix)``: a row with ``path_prefix=None``
    blocks the registrable domain and every subdomain (suffix match on
    dot boundaries — ``example.com`` blocks ``a.b.example.com`` but
    NEVER ``notexample.com``); a row with a path blocks only URLs whose
    path starts with that prefix under that domain. Hosts compare after
    :func:`url_host` normalization (lowercase, port and leading ``www.``
    stripped).

    ``out_col``: true/false for clean URLs, NULL for dirty rows (no
    scheme/host — the family's NULL-propagation contract: the gate
    never invents a verdict for a URL it cannot parse; downstream
    stages own the dirty-row policy).

    Scale shape: entirely MAP-SIDE codegen — the host's dot-suffix
    chain (bounded by label count, ~4-6 elements, so the HOF outer-
    reference re-evaluation rule does not bite) checks domain-only
    entries via ONE ``arrays_overlap`` against a literal array, and the
    (domain, path) rules OR-chain (blocklists with path rules are
    config-sized). A million-entry blocklist would swap the literal
    array for a broadcast equi-join on the exploded suffix chain — same
    dataflow, still no corpus shuffle.
    """
    url = F.col(url_col)
    host = url_host(url)
    parts = F.split(host, r"\.")
    chain = F.transform(
        F.sequence(F.lit(0), F.size(parts) - 1),
        lambda i: F.array_join(
            F.slice(parts, i + F.lit(1), F.size(parts)), "."
        ),
    )
    rest = F.regexp_replace(F.trim(url), _SCHEME_RE, "")
    pathq = F.regexp_replace(rest, r"^[^/?]*", "")
    path = F.regexp_extract(pathq, r"^([^?#]*)", 1)

    # normalize entries to the same form url_host emits (ADVICE r17):
    # a config row like 'Example.com' or 'www.example.com' would
    # otherwise silently never match anything
    def _norm_host(h: str) -> str:
        h = h.strip().lower()
        return h[4:] if h.startswith("www.") else h

    domains = sorted({_norm_host(h) for h, p in blocklist if p is None})
    rules = sorted({(_norm_host(h), p) for h, p in blocklist if p is not None})
    blocked = F.lit(False)
    if domains:
        blocked = F.arrays_overlap(
            chain, F.array(*[F.lit(d) for d in domains])
        )
    for h, p in rules:
        blocked = blocked | (
            F.array_contains(chain, h) & path.startswith(p)
        )
    return df.withColumn(
        out_col, F.when(host.isNotNull(), blocked)
    )
