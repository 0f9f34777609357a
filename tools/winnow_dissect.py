"""Stage dissection of winnowing_fingerprints (guide §1): time each
pipeline stage in isolation with the noop sink so the optimization
targets the stage that actually dominates.

Run: python tools/winnow_dissect.py [reps]  (env SPARK_GRAFT_SF_DIR)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F
from pyspark.sql import Window as W

from padua_spark.session import get_spark


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, build, reps):
    ts = []
    for _ in range(reps):
        spark.sparkContext.setJobDescription(f"winnow_dissect:{label}")
        t0 = time.time()
        noop(build())
        ts.append(time.time() - t0)
    print(f"{label:28s} median {statistics.median(ts):6.2f}s {ts}")


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="winnow_dissect")
    spark.sparkContext.setLogLevel("ERROR")
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    d = d.select("doc_id", "text")
    from padua_spark.extensions.dedup import MOD

    k_gram, window, max_doc_chars = 20, 8, 4096

    t = F.substring(F.lower(F.col("text")), 1, max_doc_chars)
    codes = F.transform(
        F.filter(F.split(F.col("_t"), ""), lambda c: c != ""),
        lambda c: F.ascii(c).cast("long"),
    )
    hashes = F.transform(
        F.sequence(F.lit(1), F.size("_codes") - F.lit(k_gram - 1)),
        lambda p: F.aggregate(
            F.slice("_codes", p, k_gram),
            F.lit(7).cast("long"),
            lambda a, c: (a * 131 + c) % F.lit(MOD),
        ),
    )
    pre = d.where(
        F.col("text").isNotNull() & (F.length("text") >= k_gram)
    ).select(F.col("doc_id").alias("_id"), t.alias("_t"))

    def st_codes():
        return pre.select("_id", codes.alias("_codes"))

    def st_hashes():
        return (
            st_codes()
            .where(F.size("_codes") >= k_gram)
            .select("_id", hashes.alias("_hs"))
        )

    def st_explode():
        return st_hashes().select(
            "_id", F.posexplode("_hs").alias("_i", "_h")
        )

    def st_winmin():
        base = st_explode().select(
            "_id", (F.col("_i") + 1).alias("_pos"), F.col("_h")
        )
        key = (
            F.col("_h") * F.lit(2 ** 21)
            + (F.lit(2 ** 21 - 1) - F.col("_pos"))
        )
        win = W.partitionBy("_id").orderBy("_pos").rowsBetween(
            0, window - 1
        )
        return (
            base.select("_id", "_pos", key.alias("_key"))
            .select("_id", F.min("_key").over(win).alias("_sel"))
            .distinct()
            .select("_id", F.shiftright("_sel", 21).alias("_fh"))
            .distinct()
        )

    def st_full():
        from padua_spark.extensions.text import winnowing_fingerprints

        return winnowing_fingerprints(
            d, "doc_id", "text", k_gram=20, window=8, min_shared=2,
            max_docs_per_fp=50,
        )

    # warm-up
    spark.range(1000).selectExpr("sum(id)").collect()
    noop(spark.read.parquet(os.path.join(sf_dir, "region.parquet")))

    timed(spark, "codes(array)", st_codes, reps)
    timed(spark, "codes+hashes(foldperpos)", st_hashes, reps)
    timed(spark, "...+posexplode", st_explode, reps)
    timed(spark, "...+windowmin+distinct", st_winmin, reps)
    timed(spark, "full operator", st_full, reps)


if __name__ == "__main__":
    main()
