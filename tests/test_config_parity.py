"""Config layer (``${ENV}``-resolved YAML, reference config/config.py)
and the cross-engine snapshot parity checker (S3 counterpart)."""

from __future__ import annotations

import pytest

from hr_moderndatapipeline_spark.config import load_config, resolve_placeholders
from hr_moderndatapipeline_spark.sources.parity import snapshot_parity_check
from hr_moderndatapipeline_spark.streaming.sinks import publish_snapshot

YAML_DOC = """
postgres:
  host: db.internal
  user: ${TEST_PGUSER}
  password: ${TEST_PGPASSWORD:-fallback-pw}
  url: jdbc:postgresql://${TEST_PGUSER}@db/hr
topics:
  - hr_txn.${TEST_PGUSER}.departments
spark:
  shuffle_partitions: 32
"""


def test_config_env_resolution(tmp_path, monkeypatch):
    monkeypatch.setenv("TEST_PGUSER", "svc_hr")
    monkeypatch.delenv("TEST_PGPASSWORD", raising=False)
    p = tmp_path / "config.yaml"
    p.write_text(YAML_DOC)
    cfg = load_config(str(p))
    assert cfg["postgres"]["user"] == "svc_hr"
    assert cfg["postgres"]["password"] == "fallback-pw"   # ${VAR:-default}
    assert cfg["postgres"]["url"] == "jdbc:postgresql://svc_hr@db/hr"  # inline
    assert cfg["topics"] == ["hr_txn.svc_hr.departments"]
    assert cfg["spark"]["shuffle_partitions"] == 32       # non-strings untouched


def test_config_strict_raises_on_unset(monkeypatch):
    monkeypatch.delenv("TEST_NOPE", raising=False)
    with pytest.raises(KeyError, match="TEST_NOPE"):
        resolve_placeholders("${TEST_NOPE}")
    # reference-permissive mode: empty string
    assert resolve_placeholders("${TEST_NOPE}", strict=False) == ""


def test_snapshot_parity_spark_vs_duckdb(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, -2.25), (3, "c", None)],
        "id int, name string, score double",
    )
    target = str(tmp_path / "snap")
    publish_snapshot(df, target, "v1")
    out = snapshot_parity_check(spark, target)
    assert out == {
        "rows_spark": 3,
        "rows_duckdb": 3,
        "columns_match": True,
        "rows_match": True,
    }


def test_empty_env_var_takes_default_like_shell():
    """shell ':-' semantics: an EMPTY variable (blank CI secret) must
    fall back to the default, not resolve to ''."""
    import os

    from hr_moderndatapipeline_spark.config import resolve_placeholders

    os.environ["HR_MDP_TEST_EMPTY"] = ""
    try:
        assert resolve_placeholders("${HR_MDP_TEST_EMPTY:-fallback}") == "fallback"
        assert resolve_placeholders("${HR_MDP_TEST_EMPTY:-}") == ""
    finally:
        del os.environ["HR_MDP_TEST_EMPTY"]


def test_set_but_empty_var_resolves_empty_without_default():
    """ADVICE r5: shell applies ':-' semantics only when ':-' is
    written. A plain ${VAR} with VAR exported EMPTY (e.g. optional
    password for local dev) resolves to '' even in strict mode —
    only a genuinely unset variable raises."""
    import os

    from hr_moderndatapipeline_spark.config import resolve_placeholders

    os.environ["HR_MDP_TEST_EMPTY2"] = ""
    try:
        assert resolve_placeholders("${HR_MDP_TEST_EMPTY2}", strict=True) == ""
        assert resolve_placeholders("pw=${HR_MDP_TEST_EMPTY2};", strict=True) == "pw=;"
    finally:
        del os.environ["HR_MDP_TEST_EMPTY2"]
