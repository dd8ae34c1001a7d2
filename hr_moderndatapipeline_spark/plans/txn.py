"""Multi-table atomic publish: cross-table snapshot consistency.

A pipeline that publishes ``orders`` and ``lineitem`` with two
independent ``publish_snapshot`` calls has a window where a reader
joins the NEW orders against the OLD lineitem — at 100 TB that
window is minutes long and the inconsistent join is silent. Real
lakehouses solve this with a transaction log spanning tables
(Delta's commit protocol is per-table; multi-table needs an outer
coordinator). This module is that coordinator for the repo's
versioned-directory protocol:

1. every table writes its data as an UNREFERENCED version directory
   (``target/<table>/v{n}`` — invisible to readers, who resolve
   through the manifest);
2. one root manifest ``{"tables": {name: version}}`` is written to a
   temp file and ``os.replace``d over ``_MANIFEST`` — the single
   atomic commit point.

A crash anywhere before step 2 leaves the previous manifest intact:
readers keep seeing the old, mutually-consistent set; the orphaned
version directories are garbage, not corruption (re-publishing
allocates fresh versions; ``vacuum_snapshots`` reclaims per table).
Readers pin one manifest read and resolve every table through it, so
a concurrent publish cannot tear a multi-table read.

Cites reference `jobs/bronze/bronze_builder.py:134-137` (its per-table
loop publishes 4 tables non-atomically — the gap this closes).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_MANIFEST"


def _next_version(table_dir: str) -> int:
    if not os.path.isdir(table_dir):
        return 0
    vs = [
        int(d[1:])
        for d in os.listdir(table_dir)
        if d.startswith("v") and d[1:].isdigit()
    ]
    return max(vs) + 1 if vs else 0


def publish_tables(dfs: dict[str, DataFrame], target: str) -> dict[str, int]:
    """Atomically publish a consistent set of tables. Returns the
    committed {table: version} map. All data writes happen BEFORE
    the single manifest swing; a failure mid-write leaves the prior
    manifest (and therefore the prior consistent set) in force."""
    if not dfs:
        raise ValueError("publish_tables: need at least one table")
    os.makedirs(target, exist_ok=True)
    versions: dict[str, int] = {}
    for name, df in dfs.items():
        tdir = os.path.join(target, name)
        v = _next_version(tdir)
        df.write.mode("overwrite").parquet(os.path.join(tdir, f"v{v}"))
        versions[name] = v
    tmp = os.path.join(target, f".{MANIFEST}.tmp")
    with open(tmp, "w") as f:
        json.dump({"format": 1, "tables": versions}, f, sort_keys=True)
    os.replace(tmp, os.path.join(target, MANIFEST))  # the one commit point
    return versions


def read_manifest(target: str) -> dict[str, int] | None:
    """The committed table→version map, or None before first commit.
    Read this ONCE per logical transaction and resolve all tables
    through the same copy — that is what makes multi-table reads
    tear-free."""
    path = os.path.join(target, MANIFEST)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        doc = json.load(f)
    if doc.get("format") != 1 or "tables" not in doc:
        raise ValueError(f"unrecognized manifest format in {path}")
    return dict(doc["tables"])


def read_published(
    spark: SparkSession, target: str, table: str, manifest: dict[str, int] | None = None
) -> DataFrame:
    """Read one table through a manifest (pass the same manifest to
    every read in a transaction; omitted = read the current one)."""
    m = manifest if manifest is not None else read_manifest(target)
    if m is None or table not in m:
        raise KeyError(f"table {table!r} has no committed version under {target}")
    return spark.read.parquet(os.path.join(target, table, f"v{m[table]}"))
