"""Python UDTFs (table functions, Spark 4): the one UDF family the rest of
the engine doesn't exercise — one input row fans out to N output rows with
arbitrary Python logic, consumed via ``LATERAL`` / ``DataFrame.lateralJoin``.

Use sparingly at scale: a UDTF runs row-at-a-time in a Python worker (no
Arrow batching like pandas UDFs) — right for modest fan-out logic too fiddly
for ``explode(transform(...))``, wrong for hot numeric paths.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="sentence_idx int, sentence string, n_tokens int")
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
