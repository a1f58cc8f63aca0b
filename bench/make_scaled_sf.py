#!/usr/bin/env python
"""Generate a TIMING-ONLY scaled dataset (default 10x sf0.1) with the
same schemas and similar distributions as /root/testdata — the sf1-tier
evidence VERDICT r5 #5 asks for. NOT oracle-matched (the driver's
generator is private): used exclusively to show the r6 plan shapes hold
when tables are 10x, never for correctness claims.

Usage: python bench/make_scaled_sf.py [factor] [out_dir]
Then:  SPARK_GRAFT_SF_DIR=<out_dir> python bench_extra.py <queries...>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from isidorus_web_scraper_spark.session import get_spark

FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = (
    sys.argv[2]
    if len(sys.argv) > 2
    else f"/tmp/iws-scaled-sf{FACTOR}x"
)
SRC = "/root/testdata/sf0.1"

spark = get_spark("make-scaled-sf")

# replicate each row FACTOR times with shifted ids and deterministically
# permuted text word order (docs stay same length/vocab; dedup families
# keep realistic collision structure because copies 0 keep original text)
docs = spark.read.parquet(f"{SRC}/documents.parquet")
n_docs = docs.count()
rep = docs.withColumn("k", F.explode(F.sequence(F.lit(0), F.lit(FACTOR - 1))))
scaled_docs = rep.select(
    (F.col("doc_id") + F.col("k") * n_docs).alias("doc_id"),
    F.when(F.col("k") == 0, F.col("text"))
    .otherwise(
        F.concat_ws(
            " ",
            F.shuffle(F.split(F.col("text"), " ")),
        )
    )
    .alias("text"),
    "lang",
    "source",
    "n_chars",
)
scaled_docs.write.mode("overwrite").parquet(f"{OUT}/documents.parquet")

ev = spark.read.parquet(f"{SRC}/events.parquet")
n_ev = ev.count()
n_users = ev.agg(F.max("user_id")).first()[0] + 1
rep = ev.withColumn("k", F.explode(F.sequence(F.lit(0), F.lit(FACTOR - 1))))
rep.select(
    (F.col("event_id") + F.col("k") * n_ev).alias("event_id"),
    (F.col("ts") + F.make_interval(secs=F.col("k") * 17)).alias("ts"),
    (F.col("user_id") + F.col("k") * n_users).alias("user_id"),
    "event_type",
    "value",
    "props",
).write.mode("overwrite").parquet(f"{OUT}/events.parquet")

emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
n_emb = emb.count()
rep = emb.withColumn("k", F.explode(F.sequence(F.lit(0), F.lit(FACTOR - 1))))
rep.select(
    (F.col("vec_id") + F.col("k") * n_emb).alias("vec_id"),
    F.when(F.col("k") == 0, F.col("embedding"))
    .otherwise(F.reverse(F.col("embedding")))
    .alias("embedding"),
    "label",
).write.mode("overwrite").parquet(f"{OUT}/embeddings.parquet")

# TPC-H-ish + small dims: plain copies (star-join queries scale with
# lineitem/orders; dims stay dims)
import shutil

for t in ["region", "nation", "customer", "supplier", "part"]:
    shutil.copytree(
        f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet", dirs_exist_ok=True
    )
for t, key in [("orders", "o_orderkey"), ("lineitem", "l_orderkey")]:
    df = spark.read.parquet(f"{SRC}/{t}.parquet")
    n = df.agg(F.max(key)).first()[0] + 1
    rep = df.withColumn(
        "k", F.explode(F.sequence(F.lit(0), F.lit(FACTOR - 1)))
    )
    rep.select(
        *[
            (F.col(c) + F.col("k") * n).alias(c) if c == key else F.col(c)
            for c in df.columns
        ]
    ).write.mode("overwrite").parquet(f"{OUT}/{t}.parquet")

open(f"{OUT}/_DONE", "w").write("timing-only scaled dataset\n")
print(f"wrote {OUT} (factor {FACTOR})")
