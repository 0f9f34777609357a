"""10x scale audit: time selected queries() entries at sf0.1 and at
the generated benchdata/sf1 (tools/gen_sf1.py) BACK-TO-BACK in one
session — interleaving makes the per-query RATIO robust to machine
drift even when absolute numbers wobble (the BENCH_SF1.md method).

Per query: one warm rep then min of 2 timed reps at each sf, plus the
output-row counts so output-bound ratios can be separated from compute
ratios. Prints one markdown table row per query.

Run: python tools/sf1_audit.py q1,q2,...   (or no arg = ROUND10 list)
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import __spark_entry__ as entrymod
from padua_spark.session import get_spark

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# override either side for other decades, e.g. the sf1->sf10 audit:
#   SF_AUDIT_A=benchdata/sf1 SF_AUDIT_B=benchdata/sf10 \
#     python tools/sf1_audit.py q1,q2
SF01 = os.environ.get("SF_AUDIT_A", "/root/testdata/sf0.1")
SF1 = os.environ.get(
    "SF_AUDIT_B", os.path.join(_REPO, "benchdata", "sf1")
)

ROUND10 = [
    "pagerank_trade", "personalized_pagerank", "label_propagation",
    "hits_scores", "textrank_keywords", "graph_modularity",
    "rake_keywords", "ngram_novelty", "code_prose_profile",
    "hodges_lehmann_shift", "hodges_lehmann_pseudomedian",
    "hosmer_lemeshow", "spiegelhalter_z", "hotelling_t2",
    "croston_forecast", "abc_analysis", "propensity_strata_att",
    "rolling_correlation", "decomposition_strength",
    "calinski_harabasz", "silhouette_simplified", "mmr_rerank",
    "binned_divergences", "windowed_novelty",
    "windowed_quality_screen", "fleming_harrington_test",
    "l_moments", "log_log_elasticity", "two_proportion_effects",
]


def _run(fn, spark, sf_dir):
    # time the WHOLE query - build (counts/persists happen inside
    # fn()) plus execution - and clear the cache between reps so a
    # previous rep's persisted stages can't be silently reused via
    # the CacheManager's logical-plan match (bench.py's isolation
    # rule)
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    rows = df.count()
    spark.catalog.clearCache()
    return wall, rows


def main() -> None:
    names = (
        [n for n in sys.argv[1].split(",") if n]
        if len(sys.argv) > 1
        else ROUND10
    )
    spark = get_spark(app_name="padua_spark_sf1_audit")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    la = os.path.basename(SF01.rstrip("/")) or "A"
    lb = os.path.basename(SF1.rstrip("/")) or "B"
    print(f"| query | t {la} (s) | t {lb} (s) | ratio | exp | rows_out |")
    print("|---|---|---|---|---|---|")
    for name in names:
        fn = queries[name]
        try:
            _run(fn, spark, SF01)  # warm
            t_a = min(_run(fn, spark, SF01)[0] for _ in range(2))
            _, rows_a = _run(fn, spark, SF01)
            _run(fn, spark, SF1)  # warm
            t_b = min(_run(fn, spark, SF1)[0] for _ in range(2))
            _, rows_b = _run(fn, spark, SF1)
            ratio = t_b / t_a if t_a > 0 else float("nan")
            exp = math.log10(ratio) if ratio > 0 else float("nan")
            growth = rows_b / rows_a if rows_a else float("nan")
            print(
                f"| {name} | {t_a:.2f} | {t_b:.2f} | {ratio:.2f} "
                f"| {exp:.2f} | {growth:.1f}x |"
            )
        except Exception as exc:  # noqa: BLE001 — keep auditing
            print(f"| {name} | ERROR {type(exc).__name__}: {exc} |")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
