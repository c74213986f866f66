"""MERGE / SCD engine (reference parity: Utility.scala:394-707,731-1045).

The reference delegates upserts to Delta Lake's ``DeltaTable.merge`` with
ordered whenMatched/whenNotMatched clauses. delta-spark is not available in
this environment, so the engine implements MERGE semantics Spark-first, as a
single declarative plan:

    target FULL OUTER JOIN updates ON <condition>
      -> ordered clause resolution via nested CASE (first matching wins,
         mirroring Delta's clause order semantics, Utility.scala:438-457)
      -> one select producing the post-merge state

This keeps the whole merge inside Catalyst (one shuffle on the join keys,
AQE-coalesced), instead of the driver orchestrating row-level writes. On a
cluster with Delta available the same clause lists map 1:1 onto
``DeltaTable.merge`` — see ``delta_merge_builder`` at the bottom.

Scale posture (100 TB):
- the update side is deduped (one row per key) before the join;
- manual partition pruning (Utility.scala:339-348) is reproduced by
  splitting the target into affected/unaffected partitions with the
  IN-list filter and joining ONLY the affected slice — the unaffected
  slice is unioned back untouched (no shuffle, no rewrite);
- the join itself is a plain equi/theta join Catalyst can plan (sort-merge
  w/ AQE skew splitting; broadcast when the update batch is small).

MERGE precondition (same as Delta): each target row matches at most one
update row — guaranteed by the pre-merge dedup on the join keys.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from metadata_ingestion_framework_spark.operators.dedup import dedup_window
from metadata_ingestion_framework_spark.operators.joins import (
    build_inner_join_condition,
    build_partition_pruning_filter,
)

_T_MARK = "__t_present"
_U_MARK = "__u_present"


@dataclass
class MergeClause:
    """One ordered MERGE clause (mirrors MergeBuilderLogicSCD1, BaseWritter.scala:21-29).

    ``when``: 'matched' | 'not_matched'.
    ``condition``: optional SQL over ``updates.`` / ``target.`` aliases.
    ``action``: 'update' | 'delete' (matched) or 'insert' (not_matched).
    ``set``: column -> SQL expression map; None means updateAll/insertAll.
    """

    when: str
    action: str
    condition: str | None = None
    set: dict[str, str] | None = field(default=None)


DEFAULT_SCD1_CLAUSES = [
    MergeClause(when="matched", action="update"),
    MergeClause(when="not_matched", action="insert"),
]


def _clause_cond(c: MergeClause) -> Column:
    return F.expr(c.condition) if c.condition else F.lit(True)


def _evolve_schemas(
    target: DataFrame, updates: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Symmetric null-fill so both merge sides share one schema — the Delta
    ``withSchemaEvolution`` analog (VERDICT r8 item 6): columns the update
    batch adds are appended to the target null-typed (existing history
    reads NULL for them), and target columns absent from the updates are
    null-filled on the update side (insertAll inserts NULL there). Types
    come from the side that HAS the column, so the evolved schema is
    exact, not string-coerced."""
    t_missing = [c for c in updates.columns if c not in target.columns]
    u_missing = [c for c in target.columns if c not in updates.columns]
    if t_missing:
        target = target.select(
            "*",
            *[
                F.lit(None).cast(updates.schema[c].dataType).alias(c)
                for c in t_missing
            ],
        )
    if u_missing:
        updates = updates.select(
            "*",
            *[
                F.lit(None).cast(target.schema[c].dataType).alias(c)
                for c in u_missing
            ],
        )
    return target, updates


def merge_apply(
    target: DataFrame,
    updates: DataFrame,
    join_keys: list[str],
    clauses: list[MergeClause] | None = None,
    extra_join_condition: str | None = None,
    partition_col: str | None = None,
    allow_schema_evolution: bool = False,
) -> DataFrame:
    """Pure MERGE: return the post-merge state of ``target``.

    Ordered clause resolution: for a matched (or not-matched) row the FIRST
    clause whose condition holds wins — Delta semantics (Utility.scala:438-457).
    Unmatched-by-any-clause rows: matched targets stay as-is, unmatched
    updates are dropped (no implicit insert), unmatched targets stay.

    ``allow_schema_evolution`` (r9, VERDICT r8 item 6): update-side columns
    absent from the target are appended to the output schema, null-filled
    for existing history — Delta's ``withSchemaEvolution``. Off (default),
    extra update-side columns are silently dropped, exactly like Delta's
    updateAll/insertAll without autoMerge.
    """
    clauses = clauses if clauses is not None else DEFAULT_SCD1_CLAUSES
    # Columns the update batch NATIVELY carries, before any evolution
    # null-fill. Delta's updateAll under withSchemaEvolution leaves target
    # columns absent from the source UNCHANGED (only insertAll writes NULL
    # there) — so updateAll must resolve those to target.<col>, not to the
    # null-filled updates.<col> (which would silently erase matched rows).
    native_update_cols = set(updates.columns)
    if allow_schema_evolution:
        target, updates = _evolve_schemas(target, updates)
    out_cols = target.columns

    untouched = None
    if partition_col:
        prune = build_partition_pruning_filter(updates, partition_col, target_alias="target")
        if prune is not None:
            # Null / not-in-list partitions can never match the update batch:
            # keep them verbatim (no join, no rewrite) — the join only sees
            # the affected partition slice. NULL-safe: coalesce, don't drop.
            affected = F.coalesce(prune, F.lit(False))
            t = target.alias("target")
            untouched = t.filter(~affected).select("target.*")
            target = t.filter(affected).select("target.*")

    t = target.withColumn(_T_MARK, F.lit(True)).alias("target")
    u = updates.withColumn(_U_MARK, F.lit(True)).alias("updates")
    cond = build_inner_join_condition(
        join_keys, update_alias="updates", target_alias="target",
        extra_join_condition=extra_join_condition,
    )
    joined = t.join(u, cond, "full_outer")

    matched = F.col(f"target.{_T_MARK}").isNotNull() & F.col(f"updates.{_U_MARK}").isNotNull()
    target_only = F.col(f"target.{_T_MARK}").isNotNull() & F.col(f"updates.{_U_MARK}").isNull()
    update_only = F.col(f"target.{_T_MARK}").isNull() & F.col(f"updates.{_U_MARK}").isNotNull()

    # Ordered clause applicability: clause i fires iff its side-predicate and
    # condition hold and no earlier same-side clause fired.
    applies: list[Column] = []
    for c in clauses:
        side = matched if c.when == "matched" else update_only
        this = side & _clause_cond(c)
        for prev, pc in zip(applies, clauses):
            if pc.when == c.when:
                this = this & ~prev
        applies.append(this)

    def value_of(col_name: str) -> Column:
        """Resolve output column via first-winning clause, else keep target."""
        # build in reverse so earlier clauses take precedence in the when-chain
        chain = F.col(f"target.{col_name}")  # default for matched-no-clause
        for c, ap in reversed(list(zip(clauses, applies))):
            if c.action == "update":
                # set=None -> updateAll; partial set leaves other cols as
                # target. Under schema evolution, updateAll only touches
                # columns the update batch natively has — target-only
                # columns stay (Delta withSchemaEvolution parity). WITHOUT
                # evolution the fallback must not fire: Delta rejects an
                # updateAll whose source lacks target columns, and the
                # unresolved `updates.<col>` reference keeps that loud
                # analysis error instead of silently half-updating.
                if c.set is None:
                    v = (
                        F.col(f"updates.{col_name}")
                        if (
                            col_name in native_update_cols
                            or not allow_schema_evolution
                        )
                        else F.col(f"target.{col_name}")
                    )
                elif col_name in c.set:
                    v = F.expr(c.set[col_name])
                else:
                    v = F.col(f"target.{col_name}")
            elif c.action == "insert":
                # set=None -> insertAll; partial set leaves other cols NULL
                if c.set is None:
                    v = F.col(f"updates.{col_name}")
                elif col_name in c.set:
                    v = F.expr(c.set[col_name])
                else:
                    v = F.lit(None)
            else:  # delete — value irrelevant, row filtered out
                continue
            chain = F.when(ap, v).otherwise(chain)
        return chain

    deleted = F.lit(False)
    inserted = F.lit(False)
    for c, ap in zip(clauses, applies):
        if c.action == "delete":
            deleted = deleted | ap
        if c.action == "insert":
            inserted = inserted | ap

    keep = (target_only | matched | inserted) & ~deleted
    result = joined.filter(keep).select(*[value_of(c).alias(c) for c in out_cols])
    if untouched is not None:
        result = untouched.unionByName(result)
    return result


def _dedup_updates(
    updates: DataFrame, join_keys: list[str], updated_at_col: str | None
) -> DataFrame:
    """Pre-merge dedup: one row per key, first by updated_at ASC.

    Parity: Utility.scala:406-413 — the reference orders ASCENDING, so the
    earliest row per key wins; replicated, not 'fixed' (SURVEY.md §7.3b).
    """
    keys = [k.split("=")[0].strip() if "=" in k else k.strip() for k in join_keys]
    keys = [k.split("<")[0].split(">")[0].split("!")[0].strip() for k in keys]
    order = [updated_at_col] if updated_at_col and updated_at_col in updates.columns else []
    return dedup_window(updates, keys, order or keys)


def scd1_merge(
    target: DataFrame | None,
    updates: DataFrame,
    join_keys: list[str],
    updated_at_col: str | None = None,
    clauses: list[MergeClause] | None = None,
    extra_join_condition: str | None = None,
    partition_col: str | None = None,
    grouping_key_col: str = "grouping_jk",
    allow_schema_evolution: bool = False,
) -> DataFrame:
    """SCD Type 1 (upsert-in-place). Returns the new table state.

    Parity: Utility.scala:394-479 (`writeSCD1`): dedup updates -> bootstrap
    if target missing -> MERGE with config-driven clauses (default
    updateAll/insertAll). A ``grouping_jk`` column, when present on both
    sides, is appended to the join keys (Utility.scala:417-421) — it is a
    bounded hash bucket that tightens the shuffle key and prunes skew.
    """
    u = _dedup_updates(updates, join_keys, updated_at_col)
    if target is None:
        return u
    keys = list(join_keys)
    if grouping_key_col in u.columns and grouping_key_col in target.columns:
        keys.append(grouping_key_col)
    return merge_apply(
        target, u, keys, clauses,
        extra_join_condition=extra_join_condition, partition_col=partition_col,
        allow_schema_evolution=allow_schema_evolution,
    )


def scd2_merge(
    target: DataFrame | None,
    updates: DataFrame,
    join_keys: list[str],
    match_condition: str,
    updated_at_col: str | None = None,
    current_flag_col: str = "current_flag",
    expiry_col: str = "expiry_at",
    effective_col: str | None = None,
    soft_delete: bool = True,
    partition_col: str | None = None,
    allow_schema_evolution: bool = False,
) -> DataFrame:
    """SCD Type 2 (versioned history in one table). Returns the new state.

    Parity: Utility.scala:493-608 (`writeSCD2`), three stages:
      1. J3 pre-join: updates x current-target rows where ``match_condition``
         holds (i.e. the tracked attributes changed) -> these need a fresh
         'current' version row.
      2. staged union (J6, Utility.scala:283-323): stage-1 rows get NULL merge
         keys so they fail the match and are inserted as new versions; the
         original updates keep real keys so they expire the old version.
      3. single ordered MERGE: matched & changed -> expire (current_flag=false,
         expiry_at=updates.<effective>); matched & row_active=false ->
         deleted_flag=true (soft delete, Utility.scala:574-581); not matched
         -> insert as current.

    ``match_condition`` is SQL over ``target.``/``updates.`` aliases, e.g.
    ``"target.current_flag = true AND target.place <> updates.place"``.
    """
    u = _dedup_updates(updates, join_keys, updated_at_col)
    if target is None:
        return u
    if allow_schema_evolution:
        # evolve BEFORE the clause lists are built: they enumerate
        # target.columns, so the new column must already be on the target
        # for expire (keeps NULL history) and insert (takes the update's
        # value) to cover it
        target, u = _evolve_schemas(target, u)

    cond = build_inner_join_condition(join_keys, "updates", "target")
    # Stage 1: rows whose tracked attributes changed vs the current version.
    changed = (
        u.alias("updates")
        .join(target.alias("target"), cond, "inner")
        .where(F.expr(match_condition))
        .select("updates.*")
    )
    # Stage 2: staged union — changed rows with a NULL staging key never match.
    staged = changed.withColumn("__stage_insert", F.lit(True)).unionByName(
        u.withColumn("__stage_insert", F.lit(False))
    )

    eff = effective_col or updated_at_col
    expire_set = {c: f"target.{c}" for c in target.columns}
    expire_set[current_flag_col] = "false"
    if eff is not None:
        expire_set[expiry_col] = f"updates.{eff}"

    clauses = [
        MergeClause(
            when="matched", action="update",
            condition=f"updates.__stage_insert = false AND ({match_condition})",
            set=expire_set,
        ),
        MergeClause(when="not_matched", action="insert",
                    set={c: f"updates.{c}" for c in target.columns}),
    ]
    if soft_delete and "row_active" in u.columns:
        # Clause ORDER parity (Utility.scala:556-581): the reference registers
        # whenMatched(matchCondition).updateExpr (expire) FIRST, then
        # whenMatched(row_active=false) (soft delete). Keeping that order means
        # a delete whose tracked attributes also changed EXPIRES the old
        # current row (first-winning clause) instead of leaving two current
        # rows per key.
        clauses.insert(1, MergeClause(
            when="matched", action="update",
            condition="updates.__stage_insert = false AND updates.row_active = false",
            set={**{c: f"target.{c}" for c in target.columns}, "deleted_flag": "true"},
        ))

    # The staging key: real keys merge (expire), NULL keys insert.
    keys_with_stage = list(join_keys)
    merged = merge_apply(
        target, staged, keys_with_stage, clauses,
        extra_join_condition="updates.__stage_insert = false",
        partition_col=partition_col,
    )
    return merged


def scd4_merge(
    target: DataFrame | None,
    history: DataFrame | None,
    updates: DataFrame,
    join_keys: list[str],
    updated_at_col: str | None = None,
    partition_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """SCD Type 4 (current table + separate history table).

    Returns (new_current, new_history). Parity: Utility.scala:621-707:
      1. J4 history capture: current-target pre-images of rows about to be
         overwritten by active updates, stamped ``history_created_at``;
      2. SCD1 on the current table (soft-delete on row_active=false,
         updateAll on active, insertAll on new — Utility.scala:678-687).
    """
    u = _dedup_updates(updates, join_keys, updated_at_col)
    if target is None:
        return u, history if history is not None else u.limit(0)

    cond = build_inner_join_condition(join_keys, "updates", "target")
    active = F.expr("updates.row_active = true") if "row_active" in u.columns else F.lit(True)
    pre_images = (
        target.alias("target")
        .join(u.alias("updates"), cond & active, "inner")
        .select(
            "target.*",
            (F.col(f"updates.{updated_at_col}") if updated_at_col else F.current_timestamp())
            .alias("history_created_at"),
        )
    )
    new_history = pre_images if history is None else history.unionByName(pre_images, allowMissingColumns=True)

    if "row_active" in u.columns:
        clauses = [
            MergeClause(when="matched", action="update",
                        condition="updates.row_active = false",
                        set={**{c: f"target.{c}" for c in target.columns}, "deleted_flag": "true"}),
            MergeClause(when="matched", action="update", condition="updates.row_active = true"),
            MergeClause(when="not_matched", action="insert"),
        ]
    else:
        clauses = None
    new_current = merge_apply(target, u, join_keys, clauses, partition_col=partition_col)
    return new_current, new_history


def delta_merge_builder(spark, target_table: str, updates: DataFrame,
                        join_keys: list[str], clauses: list[MergeClause]):
    """Map the same clause list onto DeltaTable.merge when delta-spark exists.

    Kept import-gated: this container has no delta-spark; on a Delta-enabled
    cluster this is the preferred physical path (file-level rewrite with DPP).
    """
    try:
        from delta.tables import DeltaTable  # type: ignore
    except ImportError as e:  # pragma: no cover - env without delta
        raise NotImplementedError("delta-spark not installed; use merge_apply") from e
    cond = " AND ".join(
        f"updates.{k} = target.{k}" if not any(op in k for op in "<>!=") else k
        for k in join_keys
    )
    b = (
        DeltaTable.forName(spark, target_table)
        .alias("target")
        .merge(updates.alias("updates"), cond)
    )
    for c in clauses:
        if c.when == "matched" and c.action == "update":
            b = b.whenMatchedUpdate(condition=c.condition, set=c.set) if c.set else \
                b.whenMatchedUpdateAll(condition=c.condition)
        elif c.when == "matched" and c.action == "delete":
            b = b.whenMatchedDelete(condition=c.condition)
        elif c.when == "not_matched":
            b = b.whenNotMatchedInsert(condition=c.condition, values=c.set) if c.set else \
                b.whenNotMatchedInsertAll(condition=c.condition)
    return b
