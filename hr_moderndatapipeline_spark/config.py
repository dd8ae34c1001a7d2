"""Environment-resolved YAML configuration (reference
config/config.py:6-24, config/config.yaml): config values like
``${PGUSER}`` resolve from the process environment at load time, so
one config file serves every deployment.

Engine upgrades over the reference:
- ``${VAR}`` may appear anywhere inside a string (the reference only
  resolves values that are exactly one placeholder), with
  ``${VAR:-default}`` fallback syntax;
- unresolved variables raise by default instead of silently becoming
  ``""`` (a missing password should fail loudly at load, not at the
  first connection attempt 20 minutes into a backfill) — pass
  ``strict=False`` for the reference's permissive behavior.
"""

from __future__ import annotations

import os
import re
from typing import Any

_PLACEHOLDER = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)(?::-([^}]*))?\}")


def resolve_placeholders(value: str, strict: bool = True) -> str:
    def _sub(m: re.Match) -> str:
        var, default = m.group(1), m.group(2)
        got = os.environ.get(var)
        # Shell semantics, exactly (ADVICE r5): ':-' treats unset and
        # EMPTY alike (a blank CI secret falls back to the default),
        # but a plain ${VAR} distinguishes them — a legitimately
        # exported-empty variable resolves to '' and must not raise in
        # strict mode; only a genuinely UNSET variable does.
        if got:
            return got
        if default is not None:
            return default
        if got is not None:  # set but empty, no ':-' default
            return ""
        if strict:
            raise KeyError(f"config references unset environment variable ${{{var}}}")
        return ""

    return _PLACEHOLDER.sub(_sub, value)


def _walk(node: Any, strict: bool) -> Any:
    if isinstance(node, dict):
        return {k: _walk(v, strict) for k, v in node.items()}
    if isinstance(node, list):
        return [_walk(x, strict) for x in node]
    if isinstance(node, str):
        return resolve_placeholders(node, strict)
    return node


def load_config(path: str, strict: bool = True) -> dict:
    """Parse a YAML config file and resolve ``${VAR}`` /
    ``${VAR:-default}`` placeholders from the environment."""
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f)
    return _walk(raw, strict)
