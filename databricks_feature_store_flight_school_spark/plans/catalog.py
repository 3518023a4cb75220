"""Query catalog: the single registry behind ``__spark_entry__.py``.

Each entry pairs a Spark implementation (``fn(spark, sf_dir) -> DataFrame``)
with its ANSI-SQL oracle twin (run by the driver under DuckDB at sf=0.01).
Column names are aliased identically on both sides — the driver's compare
sorts columns by name before value-hashing.

Queries whose semantics are Spark-only (Murmur3 hash bucketing, LSH, stateful
streaming) register ``oracle=None`` and get the driver's weaker rows-only
check, exactly as SURVEY.md §5(1) declares.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB, or None => rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    #: for rows-only queries (oracle=None): the pytest test(s) that pin the
    #: semantics with a STRONGER check than the driver's rows-only gate —
    #: parity vs an exact twin, a recall floor, a sketch error bound.  The
    #: inventory (QUERIES.md) surfaces these, and a catalog test asserts
    #: every rows-only query names at least one existing test.
    pinned_by: tuple[str, ...] = field(default_factory=tuple)


#: name -> QuerySpec, populated by @register at import time
QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None, *tags: str, pinned_by: str | tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the catalog.

    >>> @register("q_filter", "SELECT ... FROM lineitem ...", "filter")
    ... def q_filter(spark, sf_dir): ...

    Rows-only queries (``oracle=None``) must pass ``pinned_by=`` naming the
    pytest test(s) that carry their stronger-than-rows-only evidence.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        pins = (pinned_by,) if isinstance(pinned_by, str) else tuple(pinned_by)
        QUERIES[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tuple(tags), pinned_by=pins
        )
        return fn

    return deco


def _load_all() -> None:
    """Import every query module so registration side effects run."""
    from . import (  # noqa: F401
        queries_events,
        queries_featurestore,
        queries_multimodal,
        queries_relational,
        queries_relational2,
        queries_relational3,
        queries_relational4,
        queries_relational5,
        queries_relational6,
        queries_relational7,
        queries_text,
        queries_vectors,
    )


def query_map() -> dict[str, QueryFn]:
    _load_all()
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_map() -> dict[str, str]:
    _load_all()
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }
