"""Tracked-persist registry (ADVICE r5): operators that persist an
intermediate must register the handle and expose a release path —
repeated invocations in one long-lived session must not accumulate
pinned executor storage with no way to free it."""

from __future__ import annotations

from pyspark.sql import functions as F

from hr_moderndatapipeline_spark.cache import pinned_tags, release_pins
from hr_moderndatapipeline_spark.operators.dedup import minhash_index
from hr_moderndatapipeline_spark.operators.relational import (
    assign_stable_ids,
    release_stable_ids_cache,
)
from hr_moderndatapipeline_spark.sources.readers import load_table


def test_stable_ids_pin_is_tracked_and_releasable(spark, sf_dir):
    release_stable_ids_cache(spark)  # clean slate for this app
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    before = pinned_tags().count("stable_ids")
    out = assign_stable_ids(docs, ["doc_id"])
    n = out.count()
    assert n > 0
    assert pinned_tags().count("stable_ids") == before + 1
    assert release_stable_ids_cache(spark) >= 1
    assert "stable_ids" not in pinned_tags()


def test_minhash_pins_are_tracked_and_releasable(spark, sf_dir):
    release_pins(spark, tag="minhash")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    idx = minhash_index(docs.limit(50), "doc_id", "text")
    idx.count()
    assert "minhash" in pinned_tags()
    assert release_pins(spark, tag="minhash") >= 1
    assert "minhash" not in pinned_tags()


def test_release_is_scoped_by_tag(spark, sf_dir):
    release_pins(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    assign_stable_ids(docs, ["doc_id"]).count()
    # releasing a different tag must not touch the stable_ids pin
    assert release_pins(spark, tag="minhash") == 0
    assert "stable_ids" in pinned_tags()
    assert release_pins(spark) >= 1
    assert pinned_tags() == []


def test_double_release_is_safe(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    assign_stable_ids(docs, ["doc_id"]).count()
    release_pins(spark)
    assert release_pins(spark) == 0  # idempotent, no raise
