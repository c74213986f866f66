"""SQL function-registration surface (§2.11 last line — Encrypt.scala:7-11 /
Decrypt.scala:7-11 parity): every registered SQL function must be callable
from ``spark.sql`` and agree value-for-value with the DataFrame-API helper
it mirrors.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from metadata_ingestion_framework_spark.functions.hashing import (
    hash_it,
    hash_numerical_it,
)
from metadata_ingestion_framework_spark.functions.pii import decrypt_it, encrypt_it
from metadata_ingestion_framework_spark.functions.sql_registry import (
    register_sql_functions,
)


def test_register_and_sql_roundtrip(spark, emp):
    names = register_sql_functions(spark)
    assert set(names) >= {"mifs_encrypt", "mifs_decrypt", "mifs_hash", "mifs_mask"}
    emp.createOrReplaceTempView("emp_sqlreg")

    out = spark.sql(
        """
        SELECT empid,
               mifs_decrypt(mifs_encrypt(ename)) AS rt,
               mifs_encrypt(ename) AS enc,
               mifs_hash(ename) AS h,
               mifs_bucket(ename) AS b,
               mifs_mask(concat(ename, '42')) AS m,
               mifs_epoch_ts(0) AS ts0,
               mifs_clean_iso('2024-01-02T03:04:05Z') AS iso
        FROM emp_sqlreg
        """
    ).collect()
    by_id = {r["empid"]: r for r in out}
    assert by_id[7839]["rt"] == "KING"
    assert by_id[7839]["m"] == "KING**"
    assert by_id[7839]["iso"] == "2024-01-02 03:04:05"
    assert str(by_id[7839]["ts0"]) == "1970-01-01 00:00:00"
    assert all(0 <= r["b"] < 500 for r in out)

    # value parity with the DataFrame-API helpers
    df_api = hash_numerical_it(
        hash_it(emp.select("empid", "ename"), "h", 256, "ename"),
        "b",
        "ename",
    )
    api = {r["empid"]: (r["h"], r["b"]) for r in df_api.collect()}
    for r in out:
        assert (r["h"], r["b"]) == api[r["empid"]]

    enc_api = encrypt_it(emp.select("empid", "ename"), "ename")
    api_enc = {r["empid"]: r["ename"] for r in enc_api.collect()}
    for r in out:
        assert r["enc"] == api_enc[r["empid"]]
    dec_api = decrypt_it(enc_api, "ename")
    assert {r["empid"]: r["ename"] for r in dec_api.collect()}[7839] == "KING"


def test_null_sentinel_conventions(spark):
    register_sql_functions(spark)
    row = spark.sql(
        "SELECT mifs_decrypt(mifs_encrypt(CAST(NULL AS STRING))) AS rt, "
        "mifs_hash(CAST(NULL AS STRING)) AS h"
    ).collect()[0]
    # null -> 'n/a' sentinel -> decrypt maps back to null (pii parity)
    assert row["rt"] is None
    assert row["h"] is not None  # hash coalesces the sentinel, never null
