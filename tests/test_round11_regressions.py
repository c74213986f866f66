"""Round-11 regression tests for the r10 ADVICE items.

- tablestore.unescape_partition_value: %XX sequences are BYTES — a
  multi-byte UTF-8 value escaped byte-wise must round-trip, not mojibake
  through per-byte ``chr()``.
- write_partition_delta: the prior version's FULL nesting must match the
  declared partition cols — a single-level table hit with a two-level
  delta (or the reverse) refuses loudly instead of writing a mixed
  layout that only fails at a later read.
- bpe_train: an exception between distributed rounds must release BOTH
  live persists (the round intermediate and the base vocab).
- IvfIndex.append: persists its Arrow-assigned batch across the two
  consumers and releases it afterwards (no cache survives the call).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metadata_ingestion_framework_spark.plans.tablestore import (
    VersionedParquetStore,
    escape_partition_value,
    unescape_partition_value,
)


def test_unescape_multibyte_utf8_value():
    # byte-wise escaping of 'é' (0xC3 0xA9) — decode must reassemble the
    # code point, not emit 'Ã©'
    assert unescape_partition_value("%C3%A9") == "é"
    # mixed literal + escaped specials round-trip through our own escape
    val = "é=1:b%"
    assert unescape_partition_value(escape_partition_value(val)) == val
    # lone '%' not followed by two hex digits stays literal
    assert unescape_partition_value("a%zz") == "a%zz"


def test_partition_values_roundtrips_nonascii_and_specials(spark, tmp_path):
    store = VersionedParquetStore(spark, str(tmp_path / "pv11"))
    df = spark.createDataFrame(
        [(1, "é=x"), (2, "plain")], "id int, k string"
    )
    store.write(df, "t", partition_by=["k"])
    assert set(store.partition_values("t", "k")) == {"é=x", "plain"}


def test_delta_refuses_two_level_cols_on_single_level_table(spark, tmp_path):
    store = VersionedParquetStore(spark, str(tmp_path / "mixed1"))
    df = spark.createDataFrame(
        [(1, 0, 0), (2, 1, 1)], "id int, b int, c int"
    )
    store.write(df, "t", partition_by=["b"])
    with pytest.raises(ValueError, match="nesting does not match"):
        store.write_partition_delta(
            df.filter(F.col("b") == 0), "t", ["b", "c"], [0]
        )
    # no new version was written
    assert store.current_version("t") == 1


def test_delta_refuses_single_level_cols_on_two_level_table(spark, tmp_path):
    store = VersionedParquetStore(spark, str(tmp_path / "mixed2"))
    df = spark.createDataFrame(
        [(1, 0, 0), (2, 1, 1)], "id int, b int, c int"
    )
    store.write(df, "t", partition_by=["b", "c"])
    with pytest.raises(ValueError, match="nests deeper"):
        store.write_partition_delta(
            df.filter(F.col("b") == 0), "t", "b", [0]
        )
    assert store.current_version("t") == 1


def test_bpe_train_releases_persists_on_midround_failure(spark, monkeypatch):
    from metadata_ingestion_framework_spark.functions import bpe

    corpus = spark.createDataFrame(
        [("hi hi there",), ("hi there there",)], "text string"
    )
    real = bpe._pair_counts
    calls = {"n": 0}

    def boom(vocab):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("injected mid-round failure")
        return real(vocab)

    monkeypatch.setattr(bpe, "_pair_counts", boom)
    before = set(dict(spark.sparkContext._jsc.getPersistentRDDs()))
    with pytest.raises(RuntimeError, match="injected"):
        bpe.bpe_train(corpus, k_merges=4)
    after = dict(spark.sparkContext._jsc.getPersistentRDDs())
    leaked = {k: v for k, v in after.items() if k not in before}
    assert not leaked, f"bpe_train leaked {len(leaked)} cached RDD(s)"


def test_ivf_append_releases_assigned_persist(spark, tmp_path):
    from metadata_ingestion_framework_spark.operators.ivf_index import IvfIndex

    def vecs(ids):
        return spark.createDataFrame(
            [(i, [float(i % 3), float((i * 7) % 5)]) for i in ids],
            "vec_id bigint, embedding array<float>",
        )

    idx = IvfIndex(
        spark, str(tmp_path / "ivf11"), dim=2, n_cells=2, vec_bucket_width=8
    )
    idx.build(vecs(range(16)))
    before = set(dict(spark.sparkContext._jsc.getPersistentRDDs()))
    idx.append(vecs(range(16, 24)))
    after = dict(spark.sparkContext._jsc.getPersistentRDDs())
    leaked = {k: v for k, v in after.items() if k not in before}
    assert not leaked, "IvfIndex.append leaked its assigned persist"
    got = sorted(
        r.vec_id for r in idx.store.read(idx.VECS).select("vec_id").collect()
    )
    assert got == list(range(24))
