"""File-level min/max manifest + pruned reads — the manifest half of
an Iceberg/Delta table format, for plain parquet directories.

Spark's parquet reader already skips ROW GROUPS via pushed filters,
but it still has to LIST and open every file's footer first; at
100 TB (millions of files) the listing itself is the bottleneck and
the footers are a million small reads. Table formats fix this with a
manifest: per-file column stats collected once at write time, so
query planning touches only the (tiny) manifest. This module is that
pattern for the repo's versioned-snapshot tables:

- ``build_file_index`` reads every data file's parquet FOOTER (not
  its data) on the EXECUTORS — the file list is parallelized and
  each task opens only footers via pyarrow, so indexing scales with
  the cluster, not the driver — and returns one row per
  (file, column) with min/max/null_count/row_count.
- ``pruned_paths`` evaluates an interval predicate against the
  manifest (a frame of O(#files) rows) and returns the file paths
  that MIGHT contain matches; files whose [min, max] excludes the
  interval are never opened.
- ``read_pruned`` is the end-to-end read: prune by manifest, then
  ``spark.read.parquet(*paths)`` with the residual filter still
  applied — pruning is a superset selection, so results are
  byte-identical to the full scan with the same filter (unit-tested).

Composes with the layout operators: ``zorder_cluster`` /
``cluster_by`` make per-file ranges tight, which is what makes this
index selective. Stats use parquet's logical-type ordering as
surfaced by pyarrow; columns without footer statistics simply yield
null min/max and are never pruned on (safe default).
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_INDEX_SCHEMA = (
    "path string, column string, row_count long, null_count long, "
    "min_val double, max_val double, min_str string, max_str string"
)


def _down(v) -> float:
    """Largest double <= v: int->double rounds to nearest, which for
    values beyond 2^53 can round UP and shrink the published range —
    a file whose true min is then wrongly excluded. Outward rounding
    keeps the manifest range a superset of the true range."""
    import math as _math

    f = float(v)
    return _math.nextafter(f, -_math.inf) if f > v else f


def _up(v) -> float:
    """Smallest double >= v (see ``_down``)."""
    import math as _math

    f = float(v)
    return _math.nextafter(f, _math.inf) if f < v else f


def _footer_stats(batches: Iterator[pd.DataFrame], columns: Sequence[str]):
    """mapInPandas worker: one input row per file path; output one
    row per (file, indexed column) from the footer only."""
    import pyarrow.parquet as pq

    for pdf in batches:
        out = []
        for path in pdf["path"]:
            try:
                md = pq.ParquetFile(path).metadata
            except FileNotFoundError:
                # a compaction/vacuum raced this stat (or a stale
                # manifest lineage is being re-evaluated after one):
                # a vanished file simply has no manifest rows
                continue
            per_col: dict[str, dict] = {
                c: {"rows": 0, "nulls": 0, "mins": [], "maxs": [], "complete": True}
                for c in columns
            }
            for rg in range(md.num_row_groups):
                for ci in range(md.row_group(rg).num_columns):
                    col = md.row_group(rg).column(ci)
                    name = col.path_in_schema
                    if name not in per_col:
                        continue
                    acc = per_col[name]
                    acc["rows"] += md.row_group(rg).num_rows
                    st = col.statistics
                    # null_count is valid whenever statistics exist,
                    # independent of min/max (an all-null row group
                    # has nulls but no min/max).
                    if st is not None:
                        acc["nulls"] += st.null_count or 0
                    if st is not None and st.has_min_max:
                        acc["mins"].append(st.min)
                        acc["maxs"].append(st.max)
                    elif st is None or (st.null_count or 0) < md.row_group(rg).num_rows:
                        # A non-all-null row group WITHOUT min/max
                        # stats leaves the file's true range unknown:
                        # publishing the partial range would prune a
                        # file that still contains matching values.
                        acc["complete"] = False
            for name, acc in per_col.items():
                # Numeric stats publish as outward-rounded doubles;
                # string/byte stats publish as strings (parquet
                # byte-array min/max order == UTF-8 code-point order,
                # and writer-side truncation keeps min a prefix-lower
                # / max an incremented-upper bound, so the published
                # range stays a SUPERSET of the true range). Anything
                # else (mixed, undecodable, incomplete coverage)
                # indexes as null -> listed but never pruned on.
                lo = hi = lo_s = hi_s = None
                ok = acc["complete"] and acc["mins"]
                if ok:
                    try:
                        mn, mx = min(acc["mins"]), max(acc["maxs"])
                        if isinstance(mn, bool) or isinstance(mx, bool):
                            pass
                        elif isinstance(mn, (int, float)) and isinstance(mx, (int, float)):
                            lo, hi = _down(mn), _up(mx)
                        else:
                            if isinstance(mn, bytes):
                                mn = mn.decode("utf-8")  # strict: fail -> null
                            if isinstance(mx, bytes):
                                mx = mx.decode("utf-8")
                            if isinstance(mn, str) and isinstance(mx, str):
                                lo_s, hi_s = mn, mx
                    except (TypeError, ValueError, UnicodeDecodeError):
                        lo = hi = lo_s = hi_s = None
                out.append(
                    {
                        "path": path,
                        "column": name,
                        "row_count": acc["rows"],
                        "null_count": acc["nulls"],
                        "min_val": lo,
                        "max_val": hi,
                        "min_str": lo_s,
                        "max_str": hi_s,
                    }
                )
        yield pd.DataFrame(
            out,
            columns=[
                "path",
                "column",
                "row_count",
                "null_count",
                "min_val",
                "max_val",
                "min_str",
                "max_str",
            ],
        )


def build_file_index(
    spark: SparkSession, data_dir: str, columns: Sequence[str]
) -> DataFrame:
    """Manifest DataFrame for every ``*.parquet`` under ``data_dir``
    (one row per file × indexed column). Footer reads run on
    executors via an Arrow-batched ``mapInPandas`` over the
    parallelized path list. Numeric columns publish outward-rounded
    double min/max; string columns publish string min/max (UTF-8
    code-point order == parquet byte order, truncation-safe bounds);
    other types index with null stats and are never pruned on."""
    paths = sorted(
        os.path.join(root, name)
        for root, _, names in os.walk(data_dir)
        for name in names
        if name.endswith(".parquet")
    )
    if not paths:
        raise FileNotFoundError(f"no parquet files under {data_dir}")
    cols = list(columns)
    files_df = spark.createDataFrame([(p,) for p in paths], "path string")
    return files_df.repartition(min(len(paths), 64)).mapInPandas(
        lambda it: _footer_stats(it, cols), schema=_INDEX_SCHEMA
    )


def _column_rows(index: DataFrame, column: str) -> list:
    """The column's manifest rows, materialized ONCE. An uncached
    manifest's lineage re-runs the mapInPandas footer scan over every
    file on EACH evaluation — the exact listing/footer cost the
    manifest exists to avoid — so every consumer question (does the
    column exist? which files intersect? any file for schema?) must
    derive from this single collect (ADVICE r5). O(#files) rows to
    the driver, same movement a manifest read always makes."""
    rows = (
        index.filter(F.col("column") == column)
        .select("path", "min_val", "max_val", "min_str", "max_str")
        .collect()
    )
    if not rows:
        # silently returning zero paths would make a typo'd or
        # never-indexed column read as "no data matches"
        raise KeyError(f"column {column!r} is not in this manifest")
    return rows


def _intersecting(rows: list, lo, hi) -> list[str]:
    """Paths whose stat range intersects [lo, hi] — plus files with
    no stats for the column (never prune blind). String bounds prune
    on the string stats, numeric bounds on the double stats; a
    bounds/stat-kind mismatch is a loud TypeError, because the
    RESIDUAL filter would otherwise cast the column and silently
    drop rows (string col >= 5.0 null-casts to false)."""
    is_str = isinstance(lo, str) or isinstance(hi, str)
    if is_str and not (isinstance(lo, str) and isinstance(hi, str)):
        raise TypeError("mixed string/numeric bounds")
    mn_f, mx_f = ("min_str", "max_str") if is_str else ("min_val", "max_val")
    other_mn = "min_val" if is_str else "min_str"
    if any(r[mn_f] is None and r[other_mn] is not None for r in rows):
        kind = "numeric" if is_str else "string"
        want = "string" if is_str else "numeric"
        raise TypeError(
            f"column carries {kind} statistics but the bounds are {want} — "
            "pruning would be blind and the residual filter would null-cast"
        )
    return sorted(
        r["path"]
        for r in rows
        if r[mn_f] is None or (r[mn_f] <= hi and r[mx_f] >= lo)
    )


def pruned_paths(
    index: DataFrame, column: str, lo: float | str, hi: float | str
) -> list[str]:
    """Paths that MIGHT contain values of ``column`` in [lo, hi] —
    numeric or string bounds, matching the column's stat kind.
    One manifest evaluation; driver-cheap by design (O(#files))."""
    return _intersecting(_column_rows(index, column), lo, hi)


def read_pruned(
    spark: SparkSession,
    index: DataFrame,
    column: str,
    lo: float | str,
    hi: float | str,
) -> DataFrame:
    """Manifest-pruned scan: open only files that might match, then
    keep the exact residual filter (pruning is a superset), so the
    result equals the unpruned filtered scan — including the empty
    result when no file can intersect (schema read from one manifest
    file, zero data rows). Evaluates the manifest exactly once."""
    rows = _column_rows(index, column)
    paths = _intersecting(rows, lo, hi)
    if not paths:
        # any manifest row's file carries the table schema
        return spark.read.parquet(rows[0]["path"]).filter(F.lit(False))
    return spark.read.parquet(*paths).filter(
        (F.col(column) >= lo) & (F.col(column) <= hi)
    )


def update_file_index(
    spark: SparkSession,
    index: DataFrame,
    data_dir: str,
    columns: Sequence[str],
) -> DataFrame:
    """Incremental manifest maintenance: stat only files NOT already
    indexed and append their rows — the steady-state path when a
    table receives frequent small publishes (re-statting a million
    existing files per append is the anti-pattern the manifest
    exists to avoid). Removed files are dropped from the result so
    the manifest never claims rows a compaction deleted."""
    on_disk = {
        os.path.join(root, name)
        for root, _, names in os.walk(data_dir)
        for name in names
        if name.endswith(".parquet")
    }
    # Materialize the surviving manifest rows NOW (one collect of the
    # O(#files x cols) metadata — the same movement pruned_paths
    # already makes): the input index's lineage contains footer reads
    # of every path it was built from, and re-executing that lineage
    # after a compaction deleted files would crash on the dead paths.
    # The returned frame's lineage must not reference removed files.
    kept_rows = [r for r in index.collect() if r["path"] in on_disk]
    known = {r["path"] for r in kept_rows}
    fresh = sorted(on_disk - known)
    kept = spark.createDataFrame(kept_rows, schema=_INDEX_SCHEMA)
    if not fresh:
        return kept
    cols = list(columns)
    files_df = spark.createDataFrame([(p,) for p in fresh], "path string")
    fresh_rows = files_df.repartition(min(len(fresh), 64)).mapInPandas(
        lambda it: _footer_stats(it, cols), schema=_INDEX_SCHEMA
    )
    return kept.unionByName(fresh_rows)
