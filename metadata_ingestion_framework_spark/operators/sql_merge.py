"""``MERGE INTO``-shaped SQL surface over :func:`~.merge.merge_apply`
(r11, VERDICT r10 item 3).

The reference's writer is driven from SQL-ish metadata — its MERGE is
``DeltaTable.merge`` with ordered clauses built from config strings
(Utility.scala:433-458). Open-source Spark without Delta has no MERGE
statement, so SQL-only callers of this engine previously had to drop to
the DataFrame API. This module parses the standard statement shape

    MERGE INTO <target_view> [AS] t
    USING <source_view> [AS] u
    ON t.k = u.k [AND <extra predicate>]
    WHEN MATCHED [AND <cond>] THEN UPDATE SET * | UPDATE SET c = expr, ...
    WHEN MATCHED [AND <cond>] THEN DELETE
    WHEN NOT MATCHED [AND <cond>] THEN INSERT * | INSERT (c, ...) VALUES (e, ...)

into the engine's ordered :class:`~.merge.MergeClause` list and executes
it with ``merge_apply`` over the session's registered views — the SAME
first-winning-clause resolution, join pruning and scale posture as the
DataFrame API, because it IS the DataFrame API underneath. Clause order
in the statement is clause order in the merge (Delta semantics).

Statement conventions (documented subset, matching the reference's
usage): table/view names and aliases are plain identifiers (no
backticks); conditions/expressions reference columns through the two
aliases (rewritten to the engine's ``target.`` / ``updates.`` aliases);
``WHEN`` is a clause keyword — a bare CASE WHEN inside a clause
condition is fine only when parenthesized expressions keep commas
nested, but clause splitting keys on ``WHEN [NOT] MATCHED`` so CASE
expressions do not collide.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from metadata_ingestion_framework_spark.operators.merge import (
    MergeClause,
    merge_apply,
)

_HEAD_RE = re.compile(
    r"^\s*MERGE\s+INTO\s+(?P<target>[\w.]+)(?:\s+AS)?(?:\s+(?P<talias>\w+))?"
    r"\s+USING\s+(?P<source>[\w.]+)(?:\s+AS)?(?:\s+(?P<salias>\w+))?"
    r"\s+ON\s+(?P<on>.*?)"
    r"(?P<clauses>\s+WHEN\s+(?:NOT\s+)?MATCHED\b.*)$",
    re.I | re.S,
)
_CLAUSE_SPLIT_RE = re.compile(r"\s+WHEN\s+(?=(?:NOT\s+)?MATCHED\b)", re.I)
_CLAUSE_RE = re.compile(
    r"^(?:WHEN\s+)?(?P<not>NOT\s+)?MATCHED"
    r"(?:\s+AND\s+(?P<cond>.*?))?"
    r"\s+THEN\s+(?P<action>.*)$",
    re.I | re.S,
)
_EQ_RE = re.compile(
    r"^\s*(\w+)\s*\.\s*(\w+)\s*=\s*(\w+)\s*\.\s*(\w+)\s*$"
)


# a complete single-quoted SQL literal, '' being the in-literal escape
_STR_LIT_RE = re.compile(r"'(?:[^']|'')*'")


def _split_top(s: str, sep: str) -> list[str]:
    """Split on a top-level separator (',' or the word 'AND'), ignoring
    separators nested inside parentheses OR single-quoted string
    literals ('' is the SQL escape for a quote inside a literal)."""
    out, depth, start, i, n = [], 0, 0, 0, len(s)
    in_str = False
    upper = s.upper()
    while i < n:
        ch = s[i]
        if in_str:
            if ch == "'":
                if i + 1 < n and s[i + 1] == "'":  # escaped quote
                    i += 2
                    continue
                in_str = False
        elif ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0:
            if sep == "," and ch == ",":
                out.append(s[start:i])
                start = i + 1
            elif (
                sep == "AND"
                and upper.startswith("AND", i)
                and (i == 0 or not s[i - 1].isalnum() and s[i - 1] != "_")
                and (
                    i + 3 >= n
                    or not s[i + 3].isalnum() and s[i + 3] != "_"
                )
            ):
                out.append(s[start:i])
                start = i + 3
                i += 3
                continue
        i += 1
    out.append(s[start:])
    return [p.strip() for p in out if p.strip()]


@dataclass
class ParsedMerge:
    target_table: str
    source_table: str
    join_keys: list[str]
    extra_join_condition: str | None
    clauses: list[MergeClause] = field(default_factory=list)


def parse_merge(statement: str) -> ParsedMerge:
    m = _HEAD_RE.match(statement.strip().rstrip(";"))
    if not m:
        raise ValueError(
            "unsupported MERGE statement — expected MERGE INTO <t> [AS] a "
            "USING <s> [AS] b ON ... WHEN [NOT] MATCHED ..."
        )
    talias = m["talias"] or m["target"]
    salias = m["salias"] or m["source"]
    if talias == salias:
        raise ValueError(
            f"target and source aliases are both {talias!r} — "
            "column references would be ambiguous"
        )
    # SINGLE-pass rewrite: sequential substitution corrupts statements
    # whose source alias is literally 'target' (pass 1's output would be
    # re-matched by pass 2 — r11 review)
    _alias_re = re.compile(
        rf"\b({re.escape(talias)}|{re.escape(salias)})\s*\."
    )
    _repl = lambda am: "target." if am.group(1) == talias else "updates."  # noqa: E731

    def rewrite(expr: str | None) -> str | None:
        """User aliases -> the engine's target./updates. aliases.

        String-literal-aware like ``_split_top`` (r12, ADVICE r11): an
        alias-shaped prefix INSIDE a quoted literal — e.g.
        ``VALUES ('u.k pending')`` with source alias ``u`` — must pass
        through verbatim, not become ``'updates.k pending'``. Literals
        (with ``''`` escapes) are carved out and only the gaps between
        them are substituted."""
        if expr is None:
            return None
        out, pos = [], 0
        for lm in _STR_LIT_RE.finditer(expr):
            out.append(_alias_re.sub(_repl, expr[pos:lm.start()]))
            out.append(lm.group(0))
            pos = lm.end()
        out.append(_alias_re.sub(_repl, expr[pos:]))
        return "".join(out).strip()

    join_keys: list[str] = []
    extras: list[str] = []
    for conjunct in _split_top(rewrite(m["on"]), "AND"):
        eq = _EQ_RE.match(conjunct)
        if eq and {eq.group(1), eq.group(3)} == {"target", "updates"}:
            # normalize to the joins.py key form "updates_col = target_col"
            if eq.group(1) == "updates":
                u_col, t_col = eq.group(2), eq.group(4)
            else:
                u_col, t_col = eq.group(4), eq.group(2)
            join_keys.append(u_col if u_col == t_col else f"{u_col} = {t_col}")
        else:
            extras.append(f"({conjunct})")
    if not join_keys:
        raise ValueError(
            "MERGE ON must contain at least one alias-to-alias equality "
            "(the shuffle key — an unkeyed MERGE is a cross join)"
        )

    clauses: list[MergeClause] = []
    for raw in _CLAUSE_SPLIT_RE.split(m["clauses"].strip()):
        cm = _CLAUSE_RE.match(raw.strip())
        if not cm:
            raise ValueError(f"unsupported MERGE clause: {raw!r}")
        when = "not_matched" if cm["not"] else "matched"
        cond = rewrite(cm["cond"])
        action = cm["action"].strip()
        au = action.upper()
        if au == "DELETE":
            if when != "matched":
                raise ValueError("DELETE is only valid WHEN MATCHED")
            clauses.append(
                MergeClause(when=when, action="delete", condition=cond)
            )
        elif au.startswith("UPDATE"):
            if when != "matched":
                raise ValueError("UPDATE is only valid WHEN MATCHED")
            body = re.sub(r"^UPDATE\s+SET\s+", "", action, flags=re.I | re.S)
            if body.strip() == "*":
                set_map = None
            else:
                set_map = {}
                for assign in _split_top(body, ","):
                    lhs, rhs = assign.split("=", 1)
                    col = lhs.strip().split(".")[-1]
                    set_map[col] = rewrite(rhs)
            clauses.append(
                MergeClause(
                    when=when, action="update", condition=cond, set=set_map
                )
            )
        elif au.startswith("INSERT"):
            if when != "not_matched":
                raise ValueError("INSERT is only valid WHEN NOT MATCHED")
            body = re.sub(r"^INSERT\s*", "", action, flags=re.I | re.S).strip()
            if body == "*":
                set_map = None
            else:
                bm = re.match(
                    r"^\((?P<cols>.*?)\)\s*VALUES\s*\((?P<vals>.*)\)$",
                    body,
                    re.I | re.S,
                )
                if not bm:
                    raise ValueError(
                        f"unsupported INSERT form: {action!r} — use "
                        "INSERT * or INSERT (cols) VALUES (exprs)"
                    )
                cols = [c.strip().split(".")[-1]
                        for c in _split_top(bm["cols"], ",")]
                vals = [rewrite(v) for v in _split_top(bm["vals"], ",")]
                if len(cols) != len(vals):
                    raise ValueError(
                        f"INSERT has {len(cols)} columns but "
                        f"{len(vals)} values"
                    )
                set_map = dict(zip(cols, vals))
            clauses.append(
                MergeClause(
                    when=when, action="insert", condition=cond, set=set_map
                )
            )
        else:
            raise ValueError(f"unsupported MERGE action: {action!r}")
    return ParsedMerge(
        target_table=m["target"],
        source_table=m["source"],
        join_keys=join_keys,
        extra_join_condition=" AND ".join(extras) if extras else None,
        clauses=clauses,
    )


def sql_merge(
    spark: SparkSession,
    statement: str,
    partition_col: str | None = None,
    allow_schema_evolution: bool = False,
) -> DataFrame:
    """Execute a MERGE statement over the session's registered views and
    return the post-merge target state as a DataFrame (pure — the caller
    writes/persists it; same contract as ``merge_apply``).

    Same MERGE precondition as Delta (and ``merge_apply``): each target
    row matches at most one source row — dedup the source first
    (``dedup_window``) when it may carry multiple rows per key."""
    parsed = parse_merge(statement)
    return merge_apply(
        spark.table(parsed.target_table),
        spark.table(parsed.source_table),
        parsed.join_keys,
        parsed.clauses,
        extra_join_condition=parsed.extra_join_condition,
        partition_col=partition_col,
        allow_schema_evolution=allow_schema_evolution,
    )
