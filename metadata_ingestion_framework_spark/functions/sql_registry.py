"""SQL function-registration surface (reference parity: Encrypt.scala:7-11,
Decrypt.scala:7-11 + the Hive ``CREATE FUNCTION`` deployment they imply).

The reference packages its scalar helpers as Hive UDF classes so SQL users
can call ``encrypt(col)`` / ``decrypt(col)`` without touching the Scala API.
The Spark-4-idiomatic equivalent is a SQL scalar function (``CREATE
TEMPORARY FUNCTION name(...) RETURNS ... RETURN <expr>``): unlike a
``spark.udf.register`` Python UDF it stays a Catalyst expression — codegen,
predicate pushdown through it where legal, zero serialization — which is
the only register-a-function shape that survives a 100 TB scan.

``register_sql_functions(spark)`` installs the whole engine surface once
per session; every function mirrors the DataFrame-API helper it names,
value-for-value (same sentinel/null conventions).
"""

from __future__ import annotations

import base64
import hashlib

from pyspark.sql import SparkSession


def _aes_key_b64(key: str | None) -> str:
    """Base64 of the 16-byte AES key derived exactly like pii._aes_key."""
    k = key if key is not None else "mifs-default-key"
    return base64.b64encode(hashlib.sha256(k.encode()).digest()[:16]).decode()


def register_sql_functions(spark: SparkSession, key: str | None = None) -> list[str]:
    """Create the engine's TEMPORARY SQL functions; returns their names.

    - ``mifs_encrypt(s)`` / ``mifs_decrypt(s)`` — deterministic AES-ECB,
      base64 ciphertext, 'n/a' null sentinel (pii.encrypt_it/decrypt_it;
      Encrypt.scala/Decrypt.scala parity — the reference fetches its key
      from a secret scope, we derive from ``key``).
    - ``mifs_hash(s)`` — sha2-256 with the 'n/a' null coalesce
      (hashing.hash_it single-column shape, Utility.scala:42-45).
    - ``mifs_bucket(s)`` — abs(hash)%500 grouping bucket
      (hashing.hash_numerical_it, Utility.scala:61-64).
    - ``mifs_mask(s)`` — digit masking (pii.mask_it's default pattern).
    - ``mifs_epoch_ts(ms)`` — epoch-millis to timestamp
      (timestamps.epoch_millis_to_timestamp).
    - ``mifs_clean_iso(s)`` — ISO-8601 'T'/'Z' cleanup
      (timestamps.clean_iso_timestamp).
    """
    kb64 = _aes_key_b64(key)
    defs = {
        "mifs_encrypt": (
            "(s STRING) RETURNS STRING RETURN "
            f"base64(aes_encrypt(coalesce(s, 'n/a'), unbase64('{kb64}'), 'ECB'))"
        ),
        "mifs_decrypt": (
            "(s STRING) RETURNS STRING RETURN "
            f"nullif(cast(aes_decrypt(unbase64(s), unbase64('{kb64}'), 'ECB') AS STRING), 'n/a')"
        ),
        "mifs_hash": (
            "(s STRING) RETURNS STRING RETURN sha2(coalesce(s, 'n/a'), 256)"
        ),
        "mifs_bucket": (
            "(s STRING) RETURNS BIGINT RETURN "
            "pmod(abs(cast(hash(coalesce(s, 'n/a')) AS BIGINT)), 500)"
        ),
        "mifs_mask": (
            "(s STRING) RETURNS STRING RETURN regexp_replace(s, '[0-9]', '*')"
        ),
        "mifs_epoch_ts": (
            "(ms BIGINT) RETURNS TIMESTAMP RETURN timestamp_millis(ms)"
        ),
        "mifs_clean_iso": (
            "(s STRING) RETURNS STRING RETURN translate(translate(s, 'T', ' '), 'Z', '')"
        ),
    }
    for name, body in defs.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{body}")
    return list(defs)
