"""Oracle-side (DuckDB) Arrow-type canon audit.

``tests/test_ts_canon.py`` audits the SPARK output types of every
oracle-checked query — but the r2-r5 ``orders_profile`` red row lived
on the OTHER side: DuckDB types an uncast integer ``sum()`` as HUGEINT
(int128), which fetches as a Python ``int`` via ``fetchall()`` (so the
local replica passed) but as ``decimal128(38, 0)`` via Arrow — the
driver's fetch path — where the canon layer renders ``0.0`` vs Spark's
``0`` and the value hash diverges (VERDICT r5 "What's wrong" #1/#2).

This test closes that blind spot: it executes every ``oracle_sql()``
statement against DuckDB at sf0.001 and asserts the resulting Arrow
schema contains only types with one canonical form. Re-introducing an
uncast integer ``sum()`` (or any other HUGEINT-producing expression)
in any oracle fails CI by name before it can fail in a driver round.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pytest

import __spark_entry__ as entry
from hr_moderndatapipeline_spark.sources.readers import TABLES

# Timestamp columns proven canon-safe by green driver rounds — keep in
# sync with tests/test_ts_canon.py's _PROVEN_TS (spark-side allowlist).
from tests.test_ts_canon import _PROVEN_TS


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _is_canonical(t: pa.DataType) -> bool:
    if pa.types.is_decimal(t):
        # decimal128(38, 0) is DuckDB's Arrow rendering of HUGEINT — the
        # exact type that broke orders_profile. Real money decimals
        # (e.g. DECIMAL(18,2)) canonicalize identically on both engines.
        return not (t.precision == 38 and t.scale == 0)
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return _is_canonical(t.value_type)
    return (
        pa.types.is_integer(t)
        or pa.types.is_floating(t)
        or pa.types.is_boolean(t)
        or pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_date(t)
    )


def test_oracle_arrow_schemas_are_canonical(duck):
    violations: list[str] = []
    for name, sql in sorted(entry.oracle_sql().items()):
        tbl = duck.execute(sql).fetch_arrow_table()
        proven_ts = _PROVEN_TS.get(name, (set(), ""))[0]
        for field in tbl.schema:
            t = field.type
            if pa.types.is_timestamp(t):
                if field.name not in proven_ts:
                    violations.append(
                        f"{name}.{field.name}: unproven TIMESTAMP ({t}) in "
                        "oracle output — emit epoch-day/second BIGINT or a "
                        "string on both engines, or prove it in a driver round"
                    )
            elif not _is_canonical(t):
                violations.append(
                    f"{name}.{field.name}: non-canonical Arrow type {t} "
                    "(HUGEINT? wrap the expression in CAST(... AS BIGINT))"
                )
    assert not violations, "\n".join(violations)


def test_no_direct_bigproduct_double_casts_in_oracles():
    """DuckDB converts HUGEINT→DOUBLE as hi·2⁶⁴ + lo in float
    arithmetic — double-rounded, 1-2 ULP off above 2^53 (the
    segment_revenue_trend sf0.1 finding). Sums of products and
    products of aggregates promote to HUGEINT, so casting them
    straight to DOUBLE in an oracle is a latent cross-engine hash
    mismatch: route big conversions through VARCHAR (correctly-
    rounded string parse) instead. This lint names the pattern."""
    import re

    import __spark_entry__ as entry

    bad = []
    for name, sql in entry.oracle_sql().items():
        for pat in (
            r"CAST\(\s*sum\([^()]*\*[^()]*\)\s*AS\s+DOUBLE\)",
            r"CAST\(\s*\w+\s*\*\s*\w+\b[^()]*\bAS\s+DOUBLE\)",
            # r7 (ADVICE r6): PLAIN sums promote to HUGEINT/DECIMAL(38)
            # too — a direct DOUBLE cast is the same latent ULP bug the
            # products had, it just needs |sum| > 2^53 to fire.
            r"CAST\(\s*sum\([^()]*\)\s*AS\s+DOUBLE\)",
        ):
            if re.search(pat, sql, re.I):
                bad.append(name)
        # Window-sum aliases (sum(...) OVER (...) AS x) are HUGEINT as
        # well — flag CAST(x AS DOUBLE) on any such alias by name.
        for alias in set(
            re.findall(r"sum\([^()]*\)\s*OVER\s*\([^()]*\)\s*AS\s+(\w+)", sql, re.I)
        ):
            if re.search(
                rf"CAST\(\s*{re.escape(alias)}\s+AS\s+DOUBLE\)", sql, re.I
            ):
                bad.append(f"{name} (window alias {alias})")
    assert not bad, (
        f"oracles cast integer/decimal sums straight to DOUBLE (HUGEINT "
        f"double-rounding risk) — route through VARCHAR: {sorted(set(bad))}"
    )
