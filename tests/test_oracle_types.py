"""Column-TYPE parity between every oracle and its Spark twin.

The round-5 driver's one red row (`wilcoxon_signed_rank`) was not a
value bug: DuckDB types ``sum(BIGINT)`` as HUGEINT (→ ``Decimal`` in
Python) where Spark produces BIGINT, and a typed value comparison then
mismatches on IDENTICAL values — invisible to stringified compares
like ``oracle_sweep``'s. This suite pins the fix structurally: for
every ``oracle_sql()`` entry, DESCRIBE the SQL in DuckDB and compare
each column's type family AND integer width against the Spark
DataFrame's schema. A new entry whose oracle leaks HUGEINT/DECIMAL
or mismatches int32/int64 fails here before any driver ever hashes it.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as em
from tests.conftest import SF_ORACLE

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# normalized type names: exact integer widths matter (a typed compare
# distinguishes numpy int32 from int64 rows); HUGEINT/DECIMAL never
# appear on the Spark side, so mapping them to themselves makes any
# leak a mismatch.
NORM = {
    "HUGEINT": "hugeint", "UBIGINT": "hugeint", "DECIMAL": "decimal",
    "BIGINT": "i64", "INTEGER": "i32", "SMALLINT": "i16", "TINYINT": "i8",
    "bigint": "i64", "int": "i32", "smallint": "i16", "tinyint": "i8",
    "DOUBLE": "f64", "double": "f64", "FLOAT": "f32", "float": "f32",
    "VARCHAR": "str", "string": "str",
    "BOOLEAN": "bool", "boolean": "bool",
    "TIMESTAMP": "ts", "timestamp": "ts",
}


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_ORACLE}/{t}.parquet')"
        )
    return con


def _norm(t: str) -> str:
    return NORM.get(str(t).split("(")[0], str(t))


@pytest.mark.parametrize("name", sorted(em.oracle_sql()))
def test_oracle_types_align(spark, duck, name):
    sql = em.oracle_sql()[name]
    desc = {
        r[0]: _norm(r[1])
        for r in duck.execute(f"DESCRIBE {sql}").fetchall()
    }
    sdt = {c: _norm(t) for c, t in em.queries()[name](spark, SF_ORACLE).dtypes}
    assert set(desc) == set(sdt), (
        f"{name}: column sets differ: oracle-only "
        f"{sorted(set(desc) - set(sdt))}, spark-only "
        f"{sorted(set(sdt) - set(desc))}"
    )
    mismatched = {
        c: (sdt[c], desc[c]) for c in desc if sdt[c] != desc[c]
    }
    assert not mismatched, (
        f"{name}: type skew (spark, duckdb): {mismatched} — cast the "
        "oracle aggregate to BIGINT or widen the Spark column"
    )
