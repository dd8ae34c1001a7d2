"""Training-corpus shard export: range-sharded, size-bounded parquet
with a deterministic JSON manifest.

A 100 TB curation pipeline ends with a write, and the write has
contracts of its own: files small enough for the training loader's
readers, a global order so shard N's key range precedes shard N+1's
(resumable/addressable reads), and a manifest the loader can trust
without listing or footer-scanning the directory. The reference's
export story is a plain ``to_parquet`` with none of these
(jobs/bronze/bronze_builder.py writes a single unmanaged directory).

Spark-first mechanics:
- ``repartitionByRange(num_shards, key)`` gives contiguous,
  non-overlapping key ranges per shard (sampled range bounds — the
  same primitive Z-ordering uses), so the manifest's per-file
  [min,max] intervals are disjoint and a reader can binary-search
  the manifest instead of scanning it.
- ``sortWithinPartitions(key)`` makes every file internally sorted —
  parquet row-group stats become maximally selective for free.
- ``option("maxRecordsPerFile", n)`` is the size bound: a skewed
  range bucket splits into multiple files rather than one huge one.
- Row accounting rides the write job via ``Dataset.observe`` (no
  second scan); per-file stats come from one executor-side footer
  sweep (``fileindex.build_file_index``), not a data re-read.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hr_moderndatapipeline_spark.functions.metrics import observed
from hr_moderndatapipeline_spark.sources.fileindex import build_file_index

MANIFEST_NAME = "_shard_manifest.json"


def export_training_shards(
    df: DataFrame,
    out_dir: str,
    key: str,
    num_shards: int,
    max_records_per_file: int | None = None,
) -> dict:
    """Write ``df`` as ``num_shards`` range-sharded, internally
    sorted parquet files under ``out_dir`` plus a ``_shard_manifest.json``;
    returns the manifest dict. ``key`` must be an orderable column
    (numeric or string). Exact total row count is observed during
    the write itself; per-file row counts and key bounds are read
    from parquet footers on executors afterwards (O(#files))."""
    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")
    spark = df.sparkSession
    shaped = df.repartitionByRange(num_shards, F.col(key)).sortWithinPartitions(key)
    shaped, obs = observed(shaped, "export", rows=F.count(F.lit(1)))
    writer = shaped.write.mode("error")
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(out_dir)
    total_rows = obs.get["rows"]

    index = build_file_index(spark, out_dir, [key]).filter(F.col("column") == key)
    files = []
    for r in sorted(index.collect(), key=lambda r: r["path"]):
        files.append(
            {
                "path": os.path.relpath(r["path"], out_dir),
                "rows": r["row_count"],
                "bytes": os.path.getsize(r["path"]),
                "key_min": r["min_val"] if r["min_val"] is not None else r["min_str"],
                "key_max": r["max_val"] if r["max_val"] is not None else r["max_str"],
            }
        )
    manifest = {
        "format": "shard-manifest/v1",
        "key": key,
        "num_shards": num_shards,
        "total_rows": total_rows,
        "total_files": len(files),
        "files": files,
    }
    if sum(f["rows"] for f in files) != total_rows:
        raise RuntimeError(
            "manifest rows disagree with observed write count — "
            "concurrent writer or partial footer sweep"
        )
    with open(os.path.join(out_dir, MANIFEST_NAME), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    return manifest


def read_shard_manifest(out_dir: str) -> dict:
    with open(os.path.join(out_dir, MANIFEST_NAME)) as fh:
        m = json.load(fh)
    if m.get("format") != "shard-manifest/v1":
        raise ValueError(f"not a shard manifest: {out_dir}")
    return m


def read_shards_for_range(
    spark: SparkSession, out_dir: str, lo, hi
) -> DataFrame:
    """Read only the shard files whose [key_min, key_max] interval
    intersects [lo, hi] — the manifest-driven pruned read a training
    loader does to fetch a key slice without listing the directory.
    Returns an empty frame with the exported schema if nothing
    intersects. Files whose key stats are absent (all-null key
    column) are never matched — a ranged read by key is only
    meaningful over non-null keys."""
    m = read_shard_manifest(out_dir)
    hit = [
        os.path.join(out_dir, f["path"])
        for f in m["files"]
        if f["key_min"] is not None and not (f["key_max"] < lo or f["key_min"] > hi)
    ]
    if not hit:
        return spark.read.parquet(out_dir).limit(0)
    return spark.read.parquet(*hit)
