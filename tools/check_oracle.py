"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same parquet, compare row count, column names, and an
order-insensitive value hash. Run before committing query changes.

Usage: python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time
import traceback

import duckdb

REPO = "/root/repo"
sys.path.insert(0, REPO)

from hr_moderndatapipeline_spark import get_spark  # noqa: E402
from hr_moderndatapipeline_spark.sources.readers import TABLES  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402


def canon(v) -> str:
    import datetime
    from decimal import Decimal

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — catches any FP divergence
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def value_hash(rows: list[tuple], col_order: list[int]) -> str:
    lines = sorted("|".join(canon(r[i]) for i in col_order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc()
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(s_rows)} rows, cols={s_cols} ({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            # Fetch through Arrow, NOT fetchall(): the driver's gate hashes
            # Arrow-fetched values, and the two paths type integers
            # differently (DuckDB HUGEINT -> Python int natively, but
            # decimal128(38,0) via Arrow — the r2-r5 orders_profile bug).
            # Sharing the driver's fetch path makes the replica see what
            # the driver sees.
            res = con.execute(oracles[name])
            tbl = res.fetch_arrow_table()
            d_cols = list(tbl.column_names)
            _py_cols = [c.to_pylist() for c in tbl.columns]
            d_rows = list(zip(*_py_cols)) if _py_cols else []
        except Exception:
            print(f"FAIL {name}: duckdb error")
            traceback.print_exc()
            n_fail += 1
            continue
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            s_order = [s_cols.index(c) for c in sorted(s_cols)]
            d_order = [d_cols.index(c) for c in sorted(d_cols)]
            hs = value_hash(s_rows, s_order)
            hd = value_hash(d_rows, d_order)
            if hs != hd:
                problems.append("value-hash mismatch")
                # show a few differing lines for debugging
                sl = sorted("|".join(canon(r[i]) for i in s_order) for r in s_rows)
                dl = sorted("|".join(canon(r[i]) for i in d_order) for r in d_rows)
                diffs = [(a, b) for a, b in zip(sl, dl) if a != b][:3]
                for a, b in diffs:
                    print(f"    spark: {a[:200]}\n    duck : {b[:200]}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} ({time.time()-t0:.1f}s)")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
