"""Python UDTF surface (SURVEY.md §2.10 — the T in UDF/UDAF/UDTF).

Spark 4's arrow-optimized Python UDTFs are the extension point for
one-row-to-many-rows logic that genuinely can't be expressed as
``explode`` over JVM arrays (stateful parsers, external tokenizers,
model-backed segmenters). The production chunker stays JVM-side
(``operators.text.doc_chunks`` — explode over generated sequences,
no Python); this module exists so a user extending the engine has
the registered-UDTF pattern with a worked, tested example.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, chunk_text string, n_words int")
class ChunkWords:
    """Word-budget chunker as a UDTF: one (text, max_words) input
    row → one row per chunk. Mirrors ``doc_chunks`` semantics
    (same chunk indices/boundaries) so tests can cross-check the
    Python path against the JVM path."""

    def eval(self, text: str, max_words: int):  # noqa: D102
        # NULL inputs produce no rows (matching the JVM path's
        # null-propagation); an EMPTY string splits to [''] and emits
        # one empty chunk, exactly like doc_chunks.
        if text is None or max_words is None or max_words <= 0:
            return
        words = text.split(" ")
        for i in range(0, (len(words) - 1) // max_words + 1):
            piece = words[i * max_words : (i + 1) * max_words]
            yield i, " ".join(piece), len(piece)


def register_udtfs(spark: SparkSession) -> None:
    """Register the UDTF surface for SQL (``LATERAL`` joins):
    ``SELECT d.doc_id, c.* FROM docs d, LATERAL chunk_words(d.text, 32) c``."""
    spark.udtf.register("chunk_words", ChunkWords)
