"""Oracle output-type canon audit.

``orders_profile`` was driver-red for three rounds with values that
were byte-identical Spark-vs-DuckDB locally — the divergence lived in
the harness's canonicalization of TIMESTAMP outputs, a layer we cannot
observe. Lesson (VERDICT r4 task 3): every oracle-checked query's
output must use types with exactly one canonical form (integral,
string, boolean, date, decimal, double), and any TIMESTAMP column must
be explicitly allowlisted here with the driver rounds that proved that
column's canon safe. A new timestamp column in an oracle output fails
this test BY NAME before it can fail in a driver round.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    ByteType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    TimestampNTZType,
    TimestampType,
)

import __spark_entry__ as entry

# Types with one canonical representation in every harness layer.
_SAFE = (
    BooleanType, ByteType, ShortType, IntegerType, LongType,
    FloatType, DoubleType, DecimalType, StringType, DateType,
)
_TS = (TimestampType, TimestampNTZType)

# query -> {timestamp columns proven safe} — proof = green hash_match
# in the named driver rounds' CORRECTNESS_r0N.json.
_PROVEN_TS: dict[str, tuple[set[str], str]] = {
    "asof_purchase_state": ({"purchase_ts", "effective_start_date"}, "driver r1-r4"),
    "attrition_fact": ({"attrition_ts"}, "driver r1-r4"),
    "cdc_op_classification": ({"ts"}, "driver r1-r4"),
    "cdc_upsert_current_orders": ({"o_orderdate"}, "driver r1-r4"),
    "event_change_pairs": ({"ts"}, "driver r1-r4"),
    "event_hourly_window": ({"window_start"}, "driver r1-r4"),
    "incremental_orders_agg": ({"first_date"}, "driver r4"),
    "latest_order_per_customer": ({"o_orderdate"}, "driver r1-r4"),
    # passthrough parquet column; passthrough-timestamp canon proven by
    # latest_order_per_customer / cdc_upsert_current_orders r1-r4.
    "pit_order_features": ({"o_orderdate"}, "passthrough class, driver r1-r4"),
    "scd2_apply_fold": (
        {"ts", "effective_start_date", "effective_end_date"}, "driver r2-r4"
    ),
    "scd2_user_state": (
        {"ts", "effective_start_date", "effective_end_date"}, "driver r1-r4"
    ),
    "shipping_priority": ({"o_orderdate"}, "driver r2-r4"),
    "user_hourly_resampled": ({"slot_ts"}, "driver r2-r4"),
    # max(ts) over the events table — passthrough of the exact column
    # proven by event_change_pairs / cdc_op_classification r1-r4.
    "user_value_ewma": ({"last_ts"}, "passthrough class, driver r1-r4"),
    "ewma_incremental_state": ({"last_ts"}, "passthrough class, driver r1-r4"),
}


def test_oracle_outputs_use_canonical_types(spark, sf_dir):
    oracle_names = set(entry.oracle_sql())
    violations: list[str] = []
    for name, fn in sorted(entry.queries().items()):
        if name not in oracle_names:
            continue  # rows-only contract: hash canon never applies
        df = fn(spark, sf_dir)
        proven = _PROVEN_TS.get(name, (set(), ""))[0]
        for f in df.schema.fields:
            if isinstance(f.dataType, _TS):
                if f.name not in proven:
                    violations.append(
                        f"{name}.{f.name}: unproven TIMESTAMP output — emit "
                        "epoch-day/epoch-second BIGINT or a yyyy-MM-dd string "
                        "on both engines, or add a driver-round proof above"
                    )
            elif not isinstance(f.dataType, _SAFE):
                violations.append(
                    f"{name}.{f.name}: non-canonical type "
                    f"{f.dataType.simpleString()} in an oracle-checked output"
                )
    assert not violations, "\n".join(violations)


def test_proven_allowlist_has_no_stale_entries(spark, sf_dir):
    """Every allowlisted column still exists and is still a timestamp —
    a stale entry would silently re-open the canon hole it documents."""
    qs = entry.queries()
    stale: list[str] = []
    for name, (cols, _proof) in _PROVEN_TS.items():
        df = qs[name](spark, sf_dir)
        ts_cols = {
            f.name for f in df.schema.fields if isinstance(f.dataType, _TS)
        }
        for c in cols - ts_cols:
            stale.append(f"{name}.{c}: allowlisted but no longer a TIMESTAMP output")
    assert not stale, "\n".join(stale)
