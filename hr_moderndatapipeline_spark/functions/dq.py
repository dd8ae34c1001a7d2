"""YAML-driven data-quality rules engine with quarantine (SURVEY.md §2.12).

The reference evaluates ``not_null`` / ``unique`` / ``between`` /
``foreign_key`` rules per table in pandas, accumulates violators and
writes a quarantine table (data-quality/dq_checks.py:63-124 driven by
data-quality/dq_rules.yaml:1-37). It materializes every table into
driver memory — the opposite of scale — and has two latent bugs
(non-interpolated path f-string at dq_checks.py:29; undefined
``bronze_base`` at :54). The engine recompiles the same rule language
into distributed Spark predicates evaluated in (near) one scan:

- ``not_null`` / ``between``  → a ``Column`` predicate, zero extra scans.
- ``unique``                   → window count per key (one shuffle).
- ``foreign_key``              → left join against the distinct
  reference keys with a match marker (broadcast when the reference
  dimension is small — in the HR schema all of them are).

Every rule tags its violators with ``rule_id``; the quarantine
DataFrame is the union of tagged violators (K10), the clean set is
the rows violating nothing. ``valid ∪ quarantine ⊇ input`` with
equality on row identity (a row violating k rules appears k times in
the violation list, once in ``quarantined``).
"""

from __future__ import annotations

import re
from collections.abc import Mapping, Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

try:  # optional — rules can also be given as dicts
    import yaml
except ImportError:  # pragma: no cover
    yaml = None


@dataclass
class Rule:
    rule_id: str
    kind: str                     # not_null | unique | between | foreign_key | accepted_values
    column: str
    table: str | None = None
    min: float | None = None
    max: float | None = None
    ref_table: str | None = None
    ref_column: str | None = None
    values: Sequence[str] = field(default_factory=tuple)


def load_rules(spec: str | Mapping, table: str | None = None) -> list[Rule]:
    """Parse a rules spec (YAML path/string or dict) shaped like the
    reference's dq_rules.yaml: ``{table: {rules: [{type, column, ...}]}}``.
    Returns rules with generated ids, each carrying its ``table`` —
    pass ``table=`` to select one table's rules (applying a flat
    multi-table list to a single frame would run other tables' rules
    against it: missing-column AnalysisExceptions at best, wrong
    same-named constraints silently at worst)."""
    if isinstance(spec, str):
        if yaml is None:
            raise RuntimeError("pyyaml not available; pass a dict spec")
        with open(spec) as f:
            spec = yaml.safe_load(f)
    rules: list[Rule] = []
    for tname, tdef in spec.items():
        if table is not None and tname != table:
            continue
        for i, r in enumerate(tdef.get("rules", [])):
            rules.append(
                Rule(
                    rule_id=f"{tname}.{r['type']}.{r.get('column', '*')}.{i}",
                    kind=r["type"],
                    column=r.get("column"),
                    table=tname,
                    min=r.get("min"),
                    max=r.get("max"),
                    ref_table=r.get("ref_table"),
                    ref_column=r.get("ref_column"),
                    values=tuple(r.get("values", ())),
                )
            )
    return rules


def _safe(name: str) -> str:
    """Helper-column-safe identifier (dots would parse as struct access)."""
    return re.sub(r"[^A-Za-z0-9_]", "_", name)


def _violation_flag(df: DataFrame, rule: Rule, refs: Mapping[str, DataFrame]) -> tuple[DataFrame, Column]:
    """Return (df possibly augmented with helper cols, boolean Column
    that is True where the rule is VIOLATED)."""
    c = F.col(rule.column)
    if rule.kind == "not_null":
        return df, c.isNull()
    if rule.kind == "between":
        lo = F.lit(rule.min)
        hi = F.lit(rule.max)
        return df, c.isNull() | (c < lo) | (c > hi)
    if rule.kind == "accepted_values":
        return df, ~c.isin(list(rule.values))
    if rule.kind == "unique":
        w = Window.partitionBy(rule.column)
        flag_col = f"_dq_dup_{_safe(rule.rule_id)}"
        df = df.withColumn(flag_col, F.count(F.lit(1)).over(w) > 1)
        return df, F.col(flag_col)
    if rule.kind == "foreign_key":
        ref = refs[rule.ref_table]
        marker = f"_dq_fk_{_safe(rule.rule_id)}"
        ref_keys = (
            F.broadcast(ref.select(F.col(rule.ref_column).alias(rule.column)).distinct())
            .withColumn(marker, F.lit(True))
        )
        df = df.join(ref_keys, on=rule.column, how="left")
        # NULL FKs are handled by not_null rules, not FK rules.
        return df, c.isNotNull() & F.col(marker).isNull()
    raise ValueError(f"unknown rule kind: {rule.kind}")


def apply_rules(
    df: DataFrame,
    rules: Sequence[Rule],
    refs: Mapping[str, DataFrame] | None = None,
    id_cols: Sequence[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Evaluate all rules over ``df`` in one composed plan.

    Returns ``(valid, violations)`` where ``violations`` =
    ``id_cols`` (default: all input columns) + ``rule_id``, one row
    per (row, violated rule); ``valid`` = input rows violating no
    rule, original schema.
    """
    refs = refs or {}
    in_cols = list(df.columns)
    id_cols = list(id_cols) if id_cols else in_cols

    work = df
    flags: list[tuple[str, Column]] = []
    for r in rules:
        work, flag = _violation_flag(work, r, refs)
        flags.append((r.rule_id, flag))

    # One pass: array of violated rule ids per row.
    viol_arr = F.array_compact(
        F.array(*[F.when(flag, F.lit(rid)) for rid, flag in flags])
    )
    tagged = work.withColumn("_dq_violations", viol_arr)

    valid = tagged.filter(F.size("_dq_violations") == 0).select(*in_cols)
    violations = (
        tagged.filter(F.size("_dq_violations") > 0)
        .select(*id_cols, F.explode("_dq_violations").alias("rule_id"))
    )
    return valid, violations
