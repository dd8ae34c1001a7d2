"""Shared Spark fixture: one session for the whole suite, small
parallelism for speed. Mirrors the driver's environment (bare-ish
session; engine confs applied via sources.readers.ensure_engine_confs
on load, so tests also exercise the foreign-session hardening)."""

from __future__ import annotations

import pytest

from hr_moderndatapipeline_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
