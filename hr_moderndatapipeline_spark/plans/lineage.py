"""Column-level lineage from the analyzed logical plan.

``column_lineage(df)`` answers "which physical source columns feed
each output column?" — the question behind impact analysis ("what
breaks if I drop o_totalprice?"), GDPR data mapping, and selective
backfills. The reference tracks lineage nowhere; dbt gives table
level only. Spark's analyzed plan already contains the full
expression graph, so this is a driver-side walk of
``queryExecution().analyzed().toJSON()`` — no data touched, no JVM
helper jar.

Mechanics: Catalyst serializes each expression tree as a FLATTENED
pre-order list of nodes. Every ``Alias`` therefore sits at the head
of a list whose remaining ``AttributeReference`` entries are exactly
the attributes its expression consumes — so one pass builds
alias-id → {referenced ids}, ``LogicalRelation``/``DataSourceV2``
outputs pin ids to physical table columns, and output resolution is
a transitive expansion with cycle guard.

Scope (stated, not silent): positional operators (UNION/INTERSECT/
EXCEPT) and recursive CTEs rename columns positionally rather than
through aliases; plans containing them raise ``UnsupportedPlanError``
instead of returning wrong lineage."""

from __future__ import annotations

import json
import os
import re
from urllib.parse import urlparse

from pyspark.sql import DataFrame


class UnsupportedPlanError(ValueError):
    pass


_POSITIONAL = re.compile(r"\.(Union|Intersect|Except|UnionLoop|CTERelationRef)$")


def _is_cls(d, suffix: str) -> bool:
    return isinstance(d, dict) and str(d.get("class", "")).endswith(suffix)


def _expr_id(d) -> int | None:
    e = d.get("exprId")
    return e.get("id") if isinstance(e, dict) else None


def _relation_attrs(df: DataFrame) -> dict[int, str]:
    """exprId → ``table.column`` for every leaf relation, read from
    the JVM plan (the JSON serialization nulls the relation object
    out). Table name = file stem of the relation's first root path;
    non-file relations label as ``source``."""
    out: dict[int, str] = {}
    leaves = df._jdf.queryExecution().analyzed().collectLeaves()
    for k in range(leaves.size()):
        leaf = leaves.apply(k)
        table = "source"
        try:
            paths = leaf.relation().location().rootPaths()
            p = urlparse(paths.apply(0).toString()).path
            table = os.path.basename(p)
            for suffix in (".parquet", ".json", ".csv", ".orc"):
                if table.endswith(suffix):
                    table = table[: -len(suffix)]
        except Exception:  # noqa: BLE001 — non-FS relation (JDBC, view, stream)
            pass
        try:
            attrs = leaf.output()
            for i in range(attrs.size()):
                a = attrs.apply(i)
                out[a.exprId().id()] = f"{table}.{a.name()}"
        except Exception:  # noqa: BLE001
            pass
    return out


def _walk(value, alias_map: dict):
    """Recursive sweep collecting Alias → referenced-attribute ids
    from every flattened expression tree in the JSON."""
    if isinstance(value, list):
        dicts = [v for v in value if isinstance(v, dict) and "class" in v]
        if dicts and len(dicts) == len(value):
            head = value[0]
            if _is_cls(head, ".Alias"):
                hid = _expr_id(head)
                refs = {
                    _expr_id(d)
                    for d in value[1:]
                    if _is_cls(d, ".AttributeReference")
                }
                refs.discard(None)
                if hid is not None:
                    alias_map.setdefault(hid, set()).update(refs)
            for d in value:
                _walk({k: v for k, v in d.items() if k != "class"}, alias_map)
            return
        for v in value:
            _walk(v, alias_map)
    elif isinstance(value, dict):
        for v in value.values():
            _walk(v, alias_map)


def column_lineage(df: DataFrame) -> dict[str, set[str]]:
    """Map each output column name to the set of ``table.column``
    physical sources it derives from (empty set = literal-only)."""
    nodes = json.loads(df._jdf.queryExecution().analyzed().toJSON())
    for node in nodes:
        if _POSITIONAL.search(str(node.get("class", ""))):
            raise UnsupportedPlanError(
                f"positional operator in plan: {node['class']} — "
                "column lineage through positional set-ops is not supported"
            )
    alias_map: dict[int, set[int]] = {}
    rel_attrs = _relation_attrs(df)
    for node in nodes:
        _walk({k: v for k, v in node.items() if k != "class"}, alias_map)

    def expand(i: int, seen: frozenset) -> set[str]:
        if i in rel_attrs:
            return {rel_attrs[i]}
        if i in seen:
            return set()
        out: set[str] = set()
        for j in alias_map.get(i, ()):  # unknown id -> literal-only
            out |= expand(j, seen | {i})
        return out

    result: dict[str, set[str]] = {}
    output = df._jdf.queryExecution().analyzed().output()
    for k in range(output.size()):
        attr = output.apply(k)
        result[attr.name()] = expand(attr.exprId().id(), frozenset())
    return result


def lineage_report(df: DataFrame) -> str:
    """Human-readable one-line-per-column rendering."""
    lin = column_lineage(df)
    lines = []
    for col in df.columns:
        srcs = sorted(lin.get(col, set()))
        lines.append(f"{col} <- {', '.join(srcs) if srcs else '(literal)'}")
    return "\n".join(lines)
