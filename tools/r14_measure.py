"""Round-13 optimization-round measurement harness (guide §1).

For each named query: capture ``.explain("formatted")`` into
``plans/r14/<query>_<tag>.txt`` and time the noop-sink execution
(guide §1.4) ``reps`` times with the job labelled
(``setJobDescription``, guide §1.5).  Prints one JSON line per query:
``{"name":..., "times":[...], "median":..., "exchanges":N,
"plan_file":...}`` so the before/after evidence in OPTIMIZATION_r14.md
is reproducible.

Run: ``python tools/r14_measure.py <tag> <query1,query2,...> [reps]``
(env ``SPARK_GRAFT_SF_DIR`` selects the scale, default sf0.1).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import __spark_entry__ as entrymod
from padua_spark.plans.inspect import explain_str
from padua_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1]
    names = [n for n in sys.argv[2].split(",") if n]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r14",
    )
    os.makedirs(plans_dir, exist_ok=True)
    spark = get_spark(app_name=f"r14_measure_{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    # same warm-up as bench.py so rep medians are comparable
    spark.range(1000).selectExpr("sum(id)").collect()
    warm = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    warm.write.format("noop").mode("overwrite").save()
    try:
        from padua_spark.benchdata import (
            ensure_maxquant_fixture,
            ensure_msp_fixture,
        )

        ensure_maxquant_fixture(sf_dir)
        ensure_msp_fixture(sf_dir)
    except Exception:
        pass
    for name in names:
        if name not in queries:
            print(json.dumps({"name": name, "err": "unknown"}))
            continue
        try:
            df = queries[name](spark, sf_dir)
            plan = explain_str(df, "formatted")
            pfile = os.path.join(plans_dir, f"{name}_{tag}.txt")
            with open(pfile, "w") as fh:
                fh.write(plan)
            n_exch = len(
                re.findall(r"\bExchange\b", plan)
            )
            n_bcast = len(re.findall(r"BroadcastExchange", plan))
            times = []
            for _ in range(reps):
                # bench.py's timed region: construction (which for the
                # iterative/persisting operators does real work via
                # internal count()/collect() actions) PLUS the noop
                # sink — timing only the sink would miss most of an
                # iterative query's wall.
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"r14:{name}")
                t0 = time.perf_counter()
                df = queries[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                times.append(round(time.perf_counter() - t0, 3))
                spark.sparkContext.setJobDescription(None)
                spark.catalog.clearCache()
            s = sorted(times)
            med = (
                s[len(s) // 2]
                if len(s) % 2
                else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2.0
            )
            print(
                json.dumps(
                    {
                        "name": name,
                        "times": times,
                        "median": round(med, 3),
                        "shuffle_exchanges": n_exch - n_bcast,
                        "broadcast_exchanges": n_bcast,
                        "plan_file": os.path.relpath(
                            pfile,
                            os.path.dirname(
                                os.path.dirname(os.path.abspath(__file__))
                            ),
                        ),
                    },
                    separators=(",", ":"),
                ),
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001 — record and continue
            print(
                json.dumps(
                    {"name": name, "err": f"{type(exc).__name__}: {exc}"[:200]}
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
