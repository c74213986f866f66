"""Epoch-append growth probe for CorpusShardStore (r17).

The store's 100 TB claim is that append cost tracks the BATCH, not the
corpus: each epoch writes only its own fresh shards (plus any vacated
old shards), hard-links everything else, and derives its base from the
tiny EPOCHS table. This probe appends N equal-size epochs (sf0.1
documents, id-offset replicas with a small re-ingest overlap so the
vacate path runs every epoch) and times each append — super-linear
growth in the sequence is the failure signature (an O(store) rewrite
sneaking in). Also counts hard-linked vs fresh shard dirs per version
as direct evidence of the carry.

Appends one JSON line to PROGRESS.jsonl (cwd). Check `uptime` before
trusting absolute numbers; the GROWTH SHAPE is the signal.

Run: python tools/corpus_probe.py [sf_dir] [epochs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from metadata_ingestion_framework_spark import get_spark
    from metadata_ingestion_framework_spark.operators.corpus import (
        CorpusShardStore,
    )

    spark = get_spark("corpus-probe")
    root = "/tmp/corpus_probe_store"
    shutil.rmtree(root, ignore_errors=True)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    base_n = docs.count()
    st = CorpusShardStore(
        spark, root, shard_tokens=50_000, member_bucket_width=1024
    )
    walls, linked, fresh = [], [], []
    for e in range(1, n_epochs + 1):
        batch = docs.withColumn(
            "doc_id", F.col("doc_id") + F.lit((e - 1) * base_n)
        )
        if e > 1:
            # re-ingest ~2% of the PREVIOUS epoch's ids: the vacate
            # probe + old-shard rewrite runs on every append
            overlap = docs.withColumn(
                "doc_id", F.col("doc_id") + F.lit((e - 2) * base_n)
            ).filter(F.col("doc_id") % 50 == 3)
            batch = batch.unionByName(overlap)
        t0 = time.perf_counter()
        st.append_epoch(batch, e, f"probe-e{e}")
        walls.append(round(time.perf_counter() - t0, 2))
        v = st.store.current_version(st.CORPUS)
        vdir = st.store._version_path(st.CORPUS, v)
        if v == 1:
            linked.append(0)
            fresh.append(len(os.listdir(vdir)))
            continue
        prev = st.store._version_path(st.CORPUS, v - 1)
        prev_inodes = {}
        for d in os.listdir(prev):
            if d.startswith("shard="):
                for f in os.listdir(os.path.join(prev, d)):
                    if f.endswith(".parquet"):
                        prev_inodes[d] = os.stat(
                            os.path.join(prev, d, f)
                        ).st_ino
        n_link = n_fresh = 0
        for d in os.listdir(vdir):
            if not d.startswith("shard="):
                continue
            ino = None
            for f in os.listdir(os.path.join(vdir, d)):
                if f.endswith(".parquet"):
                    ino = os.stat(os.path.join(vdir, d, f)).st_ino
            if prev_inodes.get(d) == ino:
                n_link += 1
            else:
                n_fresh += 1
        linked.append(n_link)
        fresh.append(n_fresh)
        print(
            f"epoch {e}: {walls[-1]}s, fresh dirs {n_fresh}, "
            f"linked {n_link}",
            file=sys.stderr,
        )
    growth = round(walls[-1] / walls[1], 2) if len(walls) > 2 else None
    line = {
        "probe": "corpus_epoch_append",
        "sf_dir": sf_dir,
        "epochs": n_epochs,
        "batch_docs": base_n,
        "append_sec": walls,
        "fresh_shard_dirs": fresh,
        "linked_shard_dirs": linked,
        "last_over_second_append": growth,
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    with open("PROGRESS.jsonl", "a") as f:
        f.write(json.dumps(line) + "\n")
    print(json.dumps(line))
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
