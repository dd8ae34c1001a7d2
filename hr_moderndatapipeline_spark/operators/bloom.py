"""Bloom-filter semi-join reduction — filter the big side of a join
BEFORE its shuffle.

Spark's own runtime filtering (``spark.sql.optimizer.runtime.
bloomFilter.enabled``) injects a bloom filter only WITHIN a single
query when the optimizer sees both sides; it cannot help when the
small key set comes from a previous pipeline stage, a published
table, or a different engine. This module is the explicit form of
the same idea, built entirely from public Spark column expressions
(no internal ``bloom_filter_agg``/``might_contain``, which are not
SQL-registered):

- **build**: each dim key sets ``k`` bits of an ``m``-bit filter at
  positions ``pmod(xxhash64(key, seed_i), m)``; the bit array is
  packed into ``m/64`` longs via a ``bit_or`` hash aggregate (map-side
  partial combine, one shuffle of 16-byte rows), and only the
  non-zero words cross to the driver — driver movement is
  O(m/64) longs, the same contract as Spark's internal runtime
  filter, which also assembles the bloom on the driver and
  re-broadcasts it.
- **probe**: the packed words become ONE array literal in the plan
  (not m/64 child expressions), and membership is
  ``element_at(words, pos div 64) & (1 << pos % 64)`` AND-ed over the
  ``k`` hash functions — pure whole-stage-codegen arithmetic, no
  Python, evaluated at the scan so Parquet row groups whose rows all
  miss are never shuffled.

False positives pass the filter but are removed by the exact join
the caller runs afterwards, so ``fact.join(dim)`` with and without
the pre-filter return byte-identical results (the oracle for
``bloom_filtered_supplier_revenue``). At 100 TB the win is the
shuffle: a fact table joined to a 0.1%-selective dim shuffles ~0.1%
of its rows (plus fpp) instead of all of them.

Reference parity: the reference has no bloom machinery; its joins
always move the full fact side (e.g. the revenue rollups in
tests/delta_reader_spark.py). This is a scale uplift, not a port.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Distinct salts fed to xxhash64 as an extra hashed column — k
# independent hash functions from one JVM hash primitive.
_MAX_HASHES = 16


def optimal_params(expected_items: int, fpp: float) -> tuple[int, int]:
    """Textbook bloom sizing: bits ``m = -n ln p / (ln 2)^2`` rounded
    up to a multiple of 64, hashes ``k = (m/n) ln 2`` clamped to
    [1, 16]."""
    if expected_items <= 0:
        raise ValueError("expected_items must be positive")
    if not (0.0 < fpp < 1.0):
        raise ValueError("fpp must be in (0, 1)")
    m = -expected_items * math.log(fpp) / (math.log(2) ** 2)
    n_words = max(1, math.ceil(m / 64))
    k = max(1, min(_MAX_HASHES, round(m / expected_items * math.log(2))))
    return n_words * 64, k


#: Serialized-filter format version. Bump whenever the hash input
#: canonicalization changes: a probe against a published filter built
#: by a different canonicalization silently drops every member key,
#: so the format marker turns that into a loud load-time error.
#: (v3 unified all numerics through DECIMAL(38,18) — v2 derived the
#: canon from the DIM side only, so an int dim + double fact hashed
#: '5' vs '5.0' and emptied the join, ADVICE r5. v4 keeps the unified
#: numeric canon but routes it through DOUBLE: the BigDecimal
#: cast+format sat on the probe's per-row hot path and tripled the
#: bloom query's bench time.)
_FORMAT = 4

#: Key canonicalization kinds (recorded in the filter so the probe
#: side applies the SAME normalization as the build side):
#: - "numeric": every NumericType canons as ``(CAST(x AS DOUBLE) +
#:   0.0)`` stringified. This aligns EXACTLY with Spark's own join
#:   coercion for mixed numeric widths (an int-vs-double join
#:   compares the double casts), so join-equal values hash equal:
#:   int 5, double 5.0, DECIMAL(10,2) 5.00 all canon to "5.0";
#:   +0.0 absorbs -0.0 (join-equal under NormalizeFloatingNumbers).
#:   Integral keys beyond 2^53 may collide in the double — false
#:   POSITIVES only (the exact join removes them), never negatives,
#:   and cheap codegen arithmetic instead of BigDecimal formatting.
#: - "timestamp": hash the epoch-micros long — a timestamp's STRING
#:   form depends on spark.sql.session.timeZone, which may differ
#:   between the build session and a probe session reviving a
#:   published filter.
#: - "string": plain cast for everything else.
_KIND_STRING = "string"
_KIND_TIMESTAMP = "timestamp"
_KIND_NUMERIC = "numeric"


def _key_kind(df: DataFrame, key: Column) -> str:
    from pyspark.sql import types as T

    dt = df.select(key).schema[0].dataType
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return _KIND_TIMESTAMP
    if isinstance(dt, T.NumericType):
        return _KIND_NUMERIC
    return _KIND_STRING


def _check_probe_kind(df: DataFrame, key: Column, bloom: dict) -> None:
    """Refuse to probe with a column whose canonicalization family
    differs from the one the filter was built with: the hashes would
    silently disagree and every member key would miss (the documented
    'superset of the semi-join' contract would break). int-vs-double
    and similar joins are fine — both sides are 'numeric'."""
    probe = _key_kind(df, key)
    built = bloom.get("key_kind", _KIND_STRING)
    if probe != built:
        raise TypeError(
            f"bloom probe key canonicalizes as {probe!r} but the filter was "
            f"built from a {built!r} key: probing would miss every member "
            "key. Cast the probe column (or rebuild the filter) so both "
            "sides share one canonicalization."
        )


def _canon(key: Column, kind: str) -> Column:
    if kind == _KIND_TIMESTAMP:
        return F.unix_micros(key).cast("string")
    if kind == _KIND_NUMERIC:
        return (key.cast("double") + F.lit(0.0)).cast("string")
    return key.cast("string")


def _positions(key: Column, n_bits: int, n_hashes: int, kind: str) -> list[Column]:
    """Bit position of hash i: pmod(xxhash64(canon(key), i), m).
    Hashing the salt as a second column gives k independent
    functions; pmod keeps the (possibly negative) 64-bit hash in
    [0, m)."""
    k = _canon(key, kind)
    return [
        F.pmod(F.xxhash64(k, F.lit(i)), F.lit(n_bits)) for i in range(n_hashes)
    ]


def build_bloom(
    dim: DataFrame,
    key: str | Column,
    expected_items: int,
    fpp: float = 0.01,
) -> dict:
    """Aggregate the dim side's join keys into a packed bloom filter.

    One job: explode each key into its k bit positions, ``bit_or``
    the single-bit masks per 64-bit word (partial aggregation
    combines map-side), collect only the non-zero words. Returns a
    plain dict (``words``: list of m/64 ints, ``n_bits``,
    ``n_hashes``) so the filter can be stored, logged, or shipped to
    another session — the published-filter pattern a multi-stage
    100 TB pipeline needs."""
    n_bits, n_hashes = optimal_params(expected_items, fpp)
    key_col = F.col(key) if isinstance(key, str) else key
    kind = _key_kind(dim, key_col)
    pos = F.explode(F.array(*_positions(key_col, n_bits, n_hashes, kind))).alias("pos")
    packed = (
        dim.select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("word"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("pos") % 64).cast("int")
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    words = [0] * (n_bits // 64)
    for row in packed:
        words[row["word"]] = row["bits"]
    return {
        "format": _FORMAT,
        "key_kind": kind,
        "words": words,
        "n_bits": n_bits,
        "n_hashes": n_hashes,
    }


def _check_format(bloom: dict) -> None:
    if bloom.get("format") != _FORMAT:
        raise ValueError(
            f"bloom filter format {bloom.get('format')!r} != {_FORMAT}: built by an "
            "incompatible version; rebuild it (probing would drop every member key)"
        )


def _membership(words: Column, bloom: dict, key: Column) -> Column:
    tests = []
    kind = bloom.get("key_kind", _KIND_STRING)
    for p in _positions(key, bloom["n_bits"], bloom["n_hashes"], kind):
        word = F.element_at(words, (p / 64).cast("int") + 1)
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
        )
        tests.append(word.bitwiseAND(mask) != 0)
    out = tests[0]
    for t in tests[1:]:
        out = out & t
    return out


def might_contain(bloom: dict, key: Column) -> Column:
    """Membership test as pure column arithmetic against the packed
    words embedded as ONE array literal. True for every inserted key;
    false-positive rate ~``fpp`` for others. The probe applies the
    key canonicalization recorded in the filter, so build and probe
    stay consistent across sessions and configs.

    The literal form suits filters up to ~1M bits; for the tens of
    megabytes a 100M-key dim needs, use ``filter_by_bloom``, which
    ships the words once per executor via a broadcast join instead of
    inside every serialized task. ``filter_by_bloom`` also validates
    the probe column's canonicalization kind against the filter's —
    this bare-Column form cannot see the probe type, so prefer the
    DataFrame form whenever you have one."""
    _check_format(bloom)
    return _membership(F.lit(bloom["words"]), bloom, key)


#: Above this many packed words (64 KiB of longs) the filter rides a
#: broadcast exchange instead of a plan literal: a literal is
#: serialized into EVERY task (Spark's internal runtime filter
#: broadcasts for the same reason), and a 100M-key / 1% filter is
#: ~15M words — task-size-limit territory.
_LITERAL_WORDS_MAX = 8192


def filter_by_bloom(
    df: DataFrame, bloom: dict, key: Column, literal_max_words: int = _LITERAL_WORDS_MAX
) -> DataFrame:
    """Keep rows whose key might be in the filter, choosing the
    cheapest shipping mode for the words: plan literal for small
    filters, single-row broadcast join (words cross the network once
    per executor) for large ones. Result rows are identical either
    way."""
    _check_format(bloom)
    _check_probe_kind(df, key, bloom)
    if len(bloom["words"]) <= literal_max_words:
        return df.filter(might_contain(bloom, key))
    words_df = F.broadcast(
        df.sparkSession.createDataFrame(
            [(bloom["words"],)], "_bloom_words array<bigint>"
        )
    )
    return (
        df.join(words_df)  # 1-row broadcast: no data movement of df
        .filter(_membership(F.col("_bloom_words"), bloom, key))
        .drop("_bloom_words")
    )


def bloom_semi_filter(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    expected_items: int,
    fpp: float = 0.01,
) -> DataFrame:
    """Drop fact rows whose key cannot be in ``dim`` before any
    shuffle. The result is a superset of the semi-join (false
    positives ≤ fpp), so composing with the exact join afterwards is
    result-identical to joining without the filter — only cheaper."""
    bloom = build_bloom(dim, dim_key, expected_items, fpp)
    return filter_by_bloom(fact, bloom, F.col(fact_key))


def bloom_to_json(bloom: dict) -> str:
    """Serialize a built filter for publication (a config store, a
    file next to the table, a message) — the cross-stage contract
    single-query runtime filtering cannot offer."""
    import json

    return json.dumps(
        {k: bloom[k] for k in ("format", "key_kind", "words", "n_bits", "n_hashes")},
        separators=(",", ":"),
    )


def bloom_from_json(payload: str) -> dict:
    """Inverse of ``bloom_to_json``; the result feeds
    ``might_contain`` directly."""
    import json

    bloom = json.loads(payload)
    missing = {"format", "key_kind", "words", "n_bits", "n_hashes"} - bloom.keys()
    if missing:
        raise ValueError(f"not a serialized bloom filter: missing {sorted(missing)}")
    if bloom["format"] != _FORMAT:
        raise ValueError(
            f"bloom filter format {bloom['format']!r} != {_FORMAT}: rebuild required"
        )
    return bloom
