"""Process-safe scratch directories for queries that persist
intermediate state (IVF index, streaming checkpoints/sinks).

The original layout keyed scratch space by (family, sf) only — fine
for one process, but two concurrent runs on the same scale factor
(the driver's gate next to a user bench, or a report generator next
to the test suite) would clear each other's directories mid-read.
Scoping by Spark applicationId makes each process's scratch private
while staying FIXED within a run (a fresh mkdtemp per invocation
would leak one copy per call — the round-5 lesson). Stale siblings
from dead applications are swept opportunistically by age, bounding
the total footprint."""

from __future__ import annotations

import os
import shutil
import tempfile
import time

from pyspark.sql import SparkSession

_STALE_SECONDS = 24 * 3600


def process_workdir(spark: SparkSession, family: str, *parts: str) -> str:
    """A cleared, per-(application, parts) scratch dir under
    ``$TMP/<family>/``. Re-calling with the same arguments in the
    same application clears and returns the same path."""
    root = os.path.join(tempfile.gettempdir(), family)
    os.makedirs(root, exist_ok=True)
    app = spark.sparkContext.applicationId
    # sweep siblings of dead apps by age — best-effort, never fatal
    now = time.time()
    for entry in os.listdir(root):
        if entry == app:
            continue
        p = os.path.join(root, entry)
        try:
            if now - os.path.getmtime(p) > _STALE_SECONDS:
                shutil.rmtree(p, ignore_errors=True)
        except OSError:
            pass
    safe = [p.strip("/").replace("/", "_") for p in parts]
    d = os.path.join(root, app, *safe)
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    return d
