"""Spark SQL literal / identifier quoting for ``F.expr`` fragments.

Operators that inject DATA-derived strings into Spark SQL expression
text (the BPE fold's learned symbols, funnel step names) must quote
for SPARK's default parser, which — unlike the ANSI dialect DuckDB
speaks — treats backslash as an escape character and CONCATENATES
adjacent string literals. Two corpus-driven corruption modes follow
(ADVICE r7):

* a symbol containing a backslash (ubiquitous in code/web training
  data) emitted with only quote-doubling produces ``'\'`` — the
  backslash eats the closing quote and the expression either throws
  ``ParseException`` or silently mis-merges;
* ANSI quote-doubling ``'it''s'`` parses as the two adjacent
  literals ``'it'`` ``'s'`` → ``"its"`` — the step name silently
  never matches.

So: escape backslash FIRST, then single quotes, both with
backslashes.  Column names interpolated into expression text are
backtick-quoted (doubling embedded backticks), never spliced raw.
"""

from __future__ import annotations


def sql_str_lit(s: str) -> str:
    """``s`` as a single-quoted Spark SQL string literal, safe for
    any content (backslashes, quotes, doubled quotes)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def sql_ident(name: str) -> str:
    """``name`` as a backtick-quoted Spark SQL identifier."""
    return "`" + name.replace("`", "``") + "`"
