"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark at sf0.01 and its ``oracle_sql()`` twin on
DuckDB, compare row counts and order-insensitive values (columns sorted
by name, rows sorted by all columns)."""

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tests.conftest import SF_ORACLE

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()

# Loose dtype families for cross-engine schema comparison (the driver
# records schema matches too — catch int-vs-double drifts locally).
_SPARK_FAMILY = {
    "bigint": "int", "int": "int", "smallint": "int", "tinyint": "int",
    "double": "float", "float": "float",
    "string": "str", "boolean": "bool", "timestamp": "ts",
}
_DUCK_FAMILY = {
    "BIGINT": "int", "INTEGER": "int", "SMALLINT": "int", "TINYINT": "int",
    "HUGEINT": "int", "UBIGINT": "int",
    "DOUBLE": "float", "FLOAT": "float", "DECIMAL": "float",
    "VARCHAR": "str", "BOOLEAN": "bool", "TIMESTAMP": "ts",
}


def _spark_family(dtype: str) -> str:
    return _SPARK_FAMILY.get(dtype.split("(")[0], dtype)


def _duck_family(dtype: str) -> str:
    return _DUCK_FAMILY.get(dtype.split("(")[0], dtype)


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                elif v == 0.0:
                    v = 0.0  # normalize -0.0
            if isinstance(v, bool):
                v = bool(v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [sorted(c for c in cols)] + out


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_oracle_match(name, spark, duck):
    sdf = QUERIES[name](spark, SF_ORACLE)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns
    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = [tuple(r) for r in res.fetchall()]
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs oracle {len(duck_rows)}"
    )
    # dtype families must agree column-by-column (driver checks schema)
    duck_types = {
        r[0]: _duck_family(str(r[1]))
        for r in duck.execute(f"DESCRIBE {ORACLES[name]}").fetchall()
    }
    for col, dtype in sdf.dtypes:
        fam = duck_types.get(col)
        if fam in ("int", "float", "str", "bool"):
            assert _spark_family(dtype) == fam, (
                f"{name}.{col}: spark {dtype} vs duck {fam}"
            )
    a = _normalize(spark_rows, spark_cols)
    b = _normalize(duck_rows, duck_cols)
    assert a[0] == b[0], f"{name}: columns {a[0]} vs {b[0]}"
    mismatches = [
        (i, x, y) for i, (x, y) in enumerate(zip(a[1:], b[1:])) if x != y
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatching rows; first 3: "
        f"{mismatches[:3]}"
    )


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES.keys()) - set(ORACLES.keys()))
)
def test_rows_only(name, spark):
    sdf = QUERIES[name](spark, SF_ORACLE)
    assert sdf.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(5).collect()
    assert df.columns
