"""Registry-wide analysis smoke test (VERDICT r4 item 2a).

Round 4 shipped 137 green pytests while three driver queries threw
``AnalysisException`` at analysis time (TIMESTAMP_NTZ loader gap): no test
ever built the catalog queries against the real testdata through ``t()``.
This test closes that hole — every ``QUERIES`` entry must BUILD and ANALYZE
against /root/testdata/sf0.001. Accessing ``df.schema`` forces full analysis
(column resolution, type checks, UDF signature validation) without executing
the plan, so the whole registry checks in seconds, and any future
environment-shape change (new parquet logical type, renamed column) fails
the suite instead of only the driver.
"""

from __future__ import annotations

import os

import pytest

from metadata_ingestion_framework_spark.catalog_queries import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.001")

# Queries whose *build* runs real work (streams, persisted composites):
# still smoke-checked, but kept out of the cheap sweep's timing expectations.
_HAS_TESTDATA = os.path.isdir(SF_DIR)


@pytest.mark.skipif(not _HAS_TESTDATA, reason=f"{SF_DIR} absent")
@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_analyzes(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    schema = df.schema  # forces analysis; throws on any resolution error
    assert len(schema.fields) > 0
    for dep in getattr(df, "_persisted_deps", ()):
        dep.unpersist()


def test_no_duplicate_literal_keys_in_registries():
    """The driver value-checks only the FIRST 50 ``QUERIES`` entries, so a
    duplicate literal key silently keeps its first position while taking the
    last value — a reorder trap (r5 VERDICT "what's wrong" item 2: stale
    duplicate media entries shadowed the window layout). Walk the module AST
    and reject any dict literal with a repeated string key."""
    import ast
    import inspect

    import metadata_ingestion_framework_spark.catalog_queries as cq

    tree = ast.parse(inspect.getsource(cq))
    for node in ast.walk(tree):
        if not isinstance(node, ast.Dict):
            continue
        seen: set[str] = set()
        for key in node.keys:
            if isinstance(key, ast.Constant) and isinstance(key.value, str):
                assert key.value not in seen, (
                    f"duplicate literal key {key.value!r} in a catalog_queries "
                    f"dict (line {key.lineno})"
                )
                seen.add(key.value)
