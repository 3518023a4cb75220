"""Python UDTFs (table functions, Spark 4): the one UDF family the rest of
the engine doesn't exercise — one input row fans out to N output rows with
arbitrary Python logic, consumed via ``LATERAL`` / ``DataFrame.lateralJoin``.

``useArrow=True`` keeps the worker transfer Arrow-batched
(ArrowEvalPythonUDTF): rows still pass through ``eval`` one at a time —
that's the UDTF contract — but input columns and the fanned-out output
cross the JVM/Python boundary as Arrow batches instead of pickled rows,
the same serialization win pandas UDFs get.  The plan audit
(tools/explain_audit.py) fails any BatchEvalPython node, so a UDTF that
silently fell back to pickling would be caught.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="sentence_idx int, sentence string, n_tokens int", useArrow=True)
class SentenceSplit:
    """Sentence segmentation stand-in: split on '. ', strip, drop empties.
    ``sentence_idx`` is the ORIGINAL part index (before empties drop) so an
    order-insensitive oracle can reproduce it."""

    def eval(self, text: str):  # noqa: D102  (UDTF contract method)
        if text is None:
            return
        for i, part in enumerate(text.split(". ")):
            s = part.strip()
            if s:
                yield i, s, len(s.split(" "))


def register_udtfs(spark) -> None:
    """Register every engine UDTF in the session catalog for SQL LATERAL use."""
    spark.udtf.register("sentence_split", SentenceSplit)
