"""Source-layer tests: paginated HTTP JSON (injected fetcher, no network),
CSV with DDL schema, parquet reader options."""

from __future__ import annotations

import json

from metadata_ingestion_framework_spark.sources.http import (
    fetch_paginated_json,
    fetch_pages_partitioned,
    json_page_to_df,
)
from metadata_ingestion_framework_spark.sources.readers import read_csv, read_parquet


def _page(ids, nxt=None):
    return json.dumps({
        "data": [
            {"id": i, "type": "user",
             "attributes": {"email": f"u{i}@x.com", "created": f"2021-01-0{i}T10:00:00Z"}}
            for i in ids
        ],
        "links": {"next": nxt},
    })


def test_json_page_flattening(spark):
    df = json_page_to_df(spark, _page([1, 2]))
    assert set(df.columns) == {"id", "type", "email", "created"}
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["email"] == "u1@x.com"  # nested attributes flattened


def test_fetch_paginated_follows_next(spark):
    pages = {
        "http://api/p1": _page([1, 2], "http://api/p2"),
        "http://api/p2": _page([3], "http://api/p3"),
        "http://api/p3": _page([4]),
    }
    calls = []

    def fake_fetch(url, api_key):
        calls.append(url)
        return pages[url]

    out = fetch_paginated_json(spark, "http://api/p1", fetch_fn=fake_fetch)
    assert sorted(r["id"] for r in out.collect()) == [1, 2, 3, 4]
    assert calls == ["http://api/p1", "http://api/p2", "http://api/p3"]


def test_fetch_pages_partitioned(spark):
    pages = {"u1": _page([1, 2]), "u2": _page([5])}
    cursors = spark.createDataFrame([("u1", None), ("u2", None)], "url string, api_key string")
    out = fetch_pages_partitioned(
        cursors, lambda url, key: pages[url], "id long, email string"
    )
    assert sorted(r["id"] for r in out.collect()) == [1, 2, 5]


def test_read_csv_ddl_schema(spark, tmp_path):
    p = str(tmp_path / "emp.csv")
    with open(p, "w") as f:
        f.write("empid,ename,sal\n1,KING,5000.0\n2,BLAKE,2850.5\n")
    df = read_csv(spark, p, "empid int, ename string, sal double")
    assert df.dtypes == [("empid", "int"), ("ename", "string"), ("sal", "double")]
    assert df.count() == 2


def test_read_parquet_projection_and_cap(spark, emp, tmp_path):
    p = str(tmp_path / "emp_parq")
    emp.write.parquet(p)
    df = read_parquet(spark, p, row_cap=3, columns=["empid", "sal"])
    assert df.columns == ["empid", "sal"]
    assert df.count() == 3


def test_write_csv_append_accumulates(spark, tmp_path):
    """K6 parity (HttpReader.scala:57,60): consecutive appends accumulate;
    header + schema survive the roundtrip."""
    from metadata_ingestion_framework_spark.sources.http import write_csv_append

    path = str(tmp_path / "extract")
    a = spark.createDataFrame([(1, "x"), (2, "y")], "id int, v string")
    b = spark.createDataFrame([(3, "z")], "id int, v string")
    write_csv_append(a, path)
    write_csv_append(b, path)
    back = spark.read.csv(path, header=True, inferSchema=True)
    assert {(r["id"], r["v"]) for r in back.collect()} == {(1, "x"), (2, "y"), (3, "z")}


def test_read_orc_roundtrip(spark, tmp_path):
    from metadata_ingestion_framework_spark.sources.readers import read_orc

    path = str(tmp_path / "orc")
    spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string").write.orc(path)
    df = read_orc(spark, path, columns=["id"])
    assert [f.name for f in df.schema] == ["id"]
    assert {r.id for r in df.collect()} == {1, 2}
    assert read_orc(spark, path, row_cap=1).count() == 1


def test_read_json_explicit_schema(spark, tmp_path):
    from metadata_ingestion_framework_spark.sources.readers import read_json

    path = tmp_path / "j"
    path.mkdir()
    (path / "a.jsonl").write_text('{"id": 1, "v": "x"}\n{"id": 2, "v": "y"}\n')
    df = read_json(spark, str(path), ddl_schema="id int, v string")
    assert {(r.id, r.v) for r in df.collect()} == {(1, "x"), (2, "y")}
    # explicit schema: an undeclared field is simply not read
    (path / "b.jsonl").write_text('{"id": 3, "v": "z", "extra": true}\n')
    assert read_json(spark, str(path), ddl_schema="id int, v string").count() == 3


def test_read_text_lines_and_whole_file(spark, tmp_path):
    from metadata_ingestion_framework_spark.sources.readers import read_text

    path = tmp_path / "txt"
    path.mkdir()
    (path / "doc1.txt").write_text("line one\nline two\n")
    (path / "doc2.txt").write_text("solo\n")
    lines = read_text(spark, str(path))
    assert lines.count() == 3 and [f.name for f in lines.schema] == ["value"]
    files = read_text(spark, str(path), whole_file=True)
    assert files.count() == 2
    assert {r.value.strip().splitlines()[0] for r in files.collect()} == {"line one", "solo"}
