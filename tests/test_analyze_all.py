"""Whole-surface analysis gate.

Round 3's regression was an ANALYSIS-time failure (TIMESTAMP_NTZ vs
``unix_micros``) that only surfaced in the driver because the unit
suite didn't build every query. This gate closes that class: every
``queries()`` entry is constructed against the test corpus and its
``.schema`` is read, which forces full Catalyst analysis (resolution,
type checking) of the plan — so any environment drift that breaks a
query's analysis fails HERE, named, not in the driver's sampled run.

Execution stays lazy for most queries; entries with eager
construction steps (localCheckpoint pair graphs, codebook training)
run them at sf0.001 where they are milliseconds.
"""

from __future__ import annotations

import pytest

from hr_moderndatapipeline_spark import queries as qmod

_ALL = sorted(qmod.queries())


@pytest.mark.parametrize("name", _ALL)
def test_query_analyzes(spark, sf_dir, name):
    df = qmod.queries()[name](spark, sf_dir)
    assert len(df.schema.fields) > 0
