"""Custom Python data source (Spark 4 ``pyspark.sql.datasource``):
a manifest-driven JSONL source with real partition planning.

The reference ingests REST-ish exports by collecting JSON to the
driver and parallelizing (the anti-pattern SURVEY.md §4 flags); the
Spark-4 Python DataSource API is the idiomatic replacement: the
DRIVER plans one ``InputPartition`` per manifest entry (no data
touched), and each EXECUTOR reads only its own file inside
``reader.read(partition)`` — distributed ingestion of a format Spark
has no built-in reader for, without a collect anywhere.

This matters beyond JSONL: the same four-class skeleton
(DataSource → reader → partitions → per-partition iterator) is how
any bespoke feed (paginated API snapshots, vendor log formats,
proprietary binary frames) becomes a first-class ``spark.read``
source. Registration is per-session: ``register_jsonl_source(spark)``
then ``spark.read.format("manifest_jsonl").option("path", dir)``.

Scale posture: partition count == manifest entries, so parallelism
follows the data layout; rows stream out of each file lazily (no
per-partition materialization); the manifest read is the only driver
I/O. Schema is declared in the manifest, not inferred — no sampling
scan, and drift fails loudly at read time rather than silently
widening types.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

MANIFEST_NAME = "_jsonl_manifest.json"

_ALLOWED_TYPES = {"bigint", "double", "string", "boolean"}


class _JsonlPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class ManifestJsonlReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.dir = options["path"]
        with open(os.path.join(self.dir, MANIFEST_NAME)) as fh:
            self.manifest = json.load(fh)

    def partitions(self) -> list[InputPartition]:
        return [
            _JsonlPartition(os.path.join(self.dir, f["path"]))
            for f in self.manifest["files"]
        ]

    def read(self, partition: _JsonlPartition) -> Iterator[tuple]:
        names = [f.name for f in self.schema.fields]
        with open(partition.path) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                yield tuple(rec.get(n) for n in names)


class ManifestJsonlDataSource(DataSource):
    """``spark.read.format("manifest_jsonl").option("path", dir)``
    over a directory containing ``_jsonl_manifest.json``::

        {"schema": {"col": "bigint"|"double"|"string"|"boolean", ...},
         "files": [{"path": "part-0.jsonl", "rows": 123}, ...]}
    """

    @classmethod
    def name(cls) -> str:
        return "manifest_jsonl"

    def schema(self) -> str:
        with open(os.path.join(self.options["path"], MANIFEST_NAME)) as fh:
            m = json.load(fh)
        cols = m["schema"]
        bad = {t for t in cols.values() if t not in _ALLOWED_TYPES}
        if bad:
            raise ValueError(f"unsupported manifest types: {sorted(bad)}")
        return ", ".join(f"{c} {t}" for c, t in cols.items())

    def reader(self, schema: StructType) -> DataSourceReader:
        return ManifestJsonlReader(schema, self.options)

    def streamReader(self, schema: StructType) -> "ManifestJsonlStreamReader":
        return ManifestJsonlStreamReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool) -> ManifestJsonlWriter:
        return ManifestJsonlWriter(schema, self.options, overwrite)


class _JsonlCommit(WriterCommitMessage):
    def __init__(self, path: str, rows: int):
        self.path = path
        self.rows = rows


class ManifestJsonlWriter(DataSourceWriter):
    """Two-phase commit, the API's intended shape: every task writes
    its partition to a uniquely-named ``.tmp`` file and reports it in
    a WriterCommitMessage; only the DRIVER's ``commit()`` renames the
    reported files into place and publishes the manifest (atomic
    replace). A failed/speculative task's ``.tmp`` is simply never
    committed — readers key off the manifest, so partial output is
    invisible by construction (same write-then-publish contract as
    ``append_jsonl_batch``). Assumes writer and committer share a
    filesystem, like every local path in this repo."""

    _SPARK_TO_MANIFEST = {"long": "bigint", "bigint": "bigint", "double": "double",
                          "string": "string", "boolean": "boolean"}

    def __init__(self, schema: StructType, options: dict, overwrite: bool):
        self.dir = options["path"]
        self.overwrite = overwrite
        self.names = [f.name for f in schema.fields]
        self.types = {}
        for f in schema.fields:
            t = self._SPARK_TO_MANIFEST.get(f.dataType.simpleString())
            if t is None:
                raise ValueError(
                    f"manifest_jsonl cannot write column {f.name!r} of type "
                    f"{f.dataType.simpleString()} (supported: bigint, double, "
                    "string, boolean)"
                )
            self.types[f.name] = t
        os.makedirs(self.dir, exist_ok=True)

    def write(self, iterator) -> _JsonlCommit:
        import uuid

        tmp = f"task-{uuid.uuid4().hex}.jsonl.tmp"
        rows = 0
        with open(os.path.join(self.dir, tmp), "w") as fh:
            for row in iterator:
                fh.write(
                    json.dumps({n: row[n] for n in self.names}, sort_keys=True) + "\n"
                )
                rows += 1
        return _JsonlCommit(tmp, rows)

    def commit(self, messages) -> None:
        m_path = os.path.join(self.dir, MANIFEST_NAME)
        old_files: list[dict] = []
        if os.path.exists(m_path) and not self.overwrite:
            with open(m_path) as fh:
                old_files = json.load(fh)["files"]
        elif os.path.exists(m_path) and self.overwrite:
            with open(m_path) as fh:
                doomed = [f["path"] for f in json.load(fh)["files"]]
        else:
            doomed = []
        if not self.overwrite:
            doomed = []
        start = len(old_files)
        new_files = []
        for i, msg in enumerate(sorted(messages, key=lambda m: m.path)):
            final = f"part-{start + i}.jsonl"
            os.replace(os.path.join(self.dir, msg.path), os.path.join(self.dir, final))
            new_files.append({"path": final, "rows": msg.rows})
        manifest = {"schema": self.types, "files": old_files + new_files}
        tmp = m_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=1, sort_keys=True)
        os.replace(tmp, m_path)
        for p in doomed:  # overwrite: drop the files the old manifest listed
            if p not in {f["path"] for f in new_files}:
                try:
                    os.remove(os.path.join(self.dir, p))
                except FileNotFoundError:
                    pass

    def abort(self, messages) -> None:
        for msg in messages:
            try:
                os.remove(os.path.join(self.dir, msg.path))
            except FileNotFoundError:
                pass


class ManifestJsonlStreamReader(DataSourceStreamReader):
    """Streaming flavor: the manifest is an append-only log of files;
    the offset is simply HOW MANY manifest entries have been
    consumed. Each micro-batch covers entries [start, end) — one
    InputPartition per new file, read on EXECUTORS — so a producer
    appends a file + manifest entry and the running query picks it
    up at the next trigger. Offsets are replayable: the same
    [start, end) always denotes the same files (append-only
    contract), which is exactly what checkpoint recovery replays.
    The driver's only work per trigger is one manifest read."""

    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.dir = options["path"]

    def _manifest(self) -> dict:
        with open(os.path.join(self.dir, MANIFEST_NAME)) as fh:
            return json.load(fh)

    def initialOffset(self) -> dict:
        return {"entries": 0}

    def latestOffset(self) -> dict:
        return {"entries": len(self._manifest()["files"])}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        files = self._manifest()["files"]
        return [
            _JsonlPartition(os.path.join(self.dir, f["path"]))
            for f in files[start["entries"] : end["entries"]]
        ]

    def read(self, partition: _JsonlPartition) -> Iterator[tuple]:
        names = [f.name for f in self.schema.fields]
        with open(partition.path) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    rec = json.loads(line)
                    yield tuple(rec.get(n) for n in names)

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up — files are the durable log


def read_manifest_files(path: str) -> set[str]:
    """The file names the manifest currently claims — what a reader
    will actually see (anything else on disk is uncommitted)."""
    with open(os.path.join(path, MANIFEST_NAME)) as fh:
        return {f["path"] for f in json.load(fh)["files"]}


def append_jsonl_batch(path: str, rows: list[dict]) -> None:
    """Producer side of the streaming contract: write the new file
    FIRST, then append its manifest entry (readers key off the
    manifest, so a half-written file is never visible)."""
    m_path = os.path.join(path, MANIFEST_NAME)
    with open(m_path) as fh:
        manifest = json.load(fh)
    name = f"part-{len(manifest['files'])}.jsonl"
    with open(os.path.join(path, name), "w") as fh:
        for r in rows:
            fh.write(json.dumps(r, sort_keys=True) + "\n")
    manifest["files"].append({"path": name, "rows": len(rows)})
    tmp = m_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    os.replace(tmp, m_path)


def register_jsonl_source(spark: SparkSession) -> None:
    spark.dataSource.register(ManifestJsonlDataSource)


def write_jsonl_dataset(path: str, schema: dict, batches: list[list[dict]]) -> dict:
    """Test/demo helper: lay out JSONL files + manifest in the format
    the source reads. One file per batch; returns the manifest."""
    os.makedirs(path, exist_ok=True)
    files = []
    for i, rows in enumerate(batches):
        name = f"part-{i}.jsonl"
        with open(os.path.join(path, name), "w") as fh:
            for r in rows:
                fh.write(json.dumps(r, sort_keys=True) + "\n")
        files.append({"path": name, "rows": len(rows)})
    manifest = {"schema": schema, "files": files}
    with open(os.path.join(path, MANIFEST_NAME), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    return manifest
