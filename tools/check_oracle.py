"""Driver-mimic correctness harness.

Runs every __spark_entry__.queries() entry at a scale-factor dir and
compares against oracle_sql() via DuckDB: row count + column names +
order-insensitive value comparison (exact; doubles must match to 1e-9
because both sides are engineered deterministic).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
        # tz-aware -> naive UTC for cross-engine compare
        if str(df[c].dtype).startswith("datetime64[ns,"):
            df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
        elif str(df[c].dtype).startswith("datetime64[us"):
            df[c] = df[c].astype("datetime64[ns]")
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> tuple[bool, str]:
    if len(spark_pdf) != len(oracle_pdf):
        return False, f"row count {len(spark_pdf)} vs {len(oracle_pdf)}"
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        return False, f"columns {s_cols} vs {o_cols}"
    s, o = normalize(spark_pdf), normalize(oracle_pdf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        # The driver's value hash is dtype-sensitive: DuckDB SUM(bigint)
        # returns HUGEINT which lands in pandas as float64, and equal values
        # with int64-vs-float64 dtypes hash differently. Mirror that here so
        # an integer/float dtype split can never pass locally (r7 postmortem:
        # token_budget / curation_v2 / salted_join_agg).
        s_int = pd.api.types.is_integer_dtype(sv)
        o_int = pd.api.types.is_integer_dtype(ov)
        s_flt = pd.api.types.is_float_dtype(sv)
        o_flt = pd.api.types.is_float_dtype(ov)
        if (s_int and o_flt) or (s_flt and o_int):
            return False, (
                f"col {c} dtype mismatch: spark {sv.dtype} vs oracle {ov.dtype}"
                " (driver hash is type-sensitive — CAST the oracle side)"
            )
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            import numpy as np

            svn = pd.to_numeric(sv, errors="coerce")
            ovn = pd.to_numeric(ov, errors="coerce")
            both_nan = svn.isna() & ovn.isna()
            close = np.isclose(svn.fillna(0), ovn.fillna(0), rtol=0, atol=1e-9)
            ok = (both_nan | (close & ~(svn.isna() ^ ovn.isna()))).all()
            exact = (svn.fillna(-1.23e300) == ovn.fillna(-1.23e300)).all()
            if not ok:
                bad = (~(both_nan | close)).idxmax()
                return False, f"col {c} row {bad}: {sv[bad]!r} vs {ov[bad]!r}"
            if not exact:
                print(f"    (note: col {c} matches at 1e-9 but not bit-exact)")
        else:
            eq = (sv.fillna("\x00NULL") == ov.fillna("\x00NULL")) | (sv.isna() & ov.isna())
            if not eq.all():
                bad = (~eq).idxmax()
                return False, f"col {c} row {bad}: {sv[bad]!r} vs {ov[bad]!r}"
    return True, "ok"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e
    from metadata_ingestion_framework_spark import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = e.queries()
    oracles = e.oracle_sql()
    passed = failed = rows_only = 0
    failures: list[str] = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        sdf = None
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as exc:
            failed += 1
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(exc).__name__}: {exc}")
            continue
        finally:
            # release operator-persisted intermediates: a 91-query session
            # would otherwise accumulate every query's caches (sig tables,
            # prefix rows, cell assignments) until LRU eviction
            if sdf is not None:
                for dep in getattr(sdf, "_persisted_deps", ()):
                    dep.unpersist()
                # leak detector (r8): anything still cached after the
                # advertised deps are released means a query dropped its
                # _persisted_deps (bare .select) or an operator cached
                # outside the convention. Warn, don't fail — the pytest
                # guard (tests/test_persist_hygiene.py) owns the hard gate.
                leaked = dict(spark.sparkContext._jsc.getPersistentRDDs())
                if leaked:
                    print(f"    WARNING {name}: {len(leaked)} cached RDD(s) leaked")
                    spark.catalog.clearCache()
                    for jrdd in leaked.values():
                        try:
                            jrdd.unpersist()
                        except Exception:
                            pass
        if name not in oracles:
            rows_only += 1
            print(f"ROWS  {name}: {len(spdf)} rows ({time.perf_counter()-t0:.2f}s, no oracle)")
            continue
        try:
            opdf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:
            failed += 1
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {exc}")
            continue
        ok, msg = compare(spdf, opdf)
        status = "PASS " if ok else "FAIL "
        if ok:
            passed += 1
        else:
            failed += 1
            failures.append(name)
        print(f"{status} {name}: {len(spdf)} rows ({time.perf_counter()-t0:.2f}s) {msg if not ok else ''}")

    print(f"\n== {passed} pass, {failed} fail, {rows_only} rows-only ==")
    if failures:
        print("failures:", " ".join(failures))
        sys.exit(1)


if __name__ == "__main__":
    main()
