"""MapReduce programming-model compatibility layer (SURVEY.md §2.11,
§3.1).

The reference is a pure-Python MapReduce framework: a user writes
``mapper(key, value) -> iter[(k, v)]`` and ``reducer(key, values) ->
iter[(k, v)]`` (optionally a combiner) and chains jobs. This module
runs that exact programming model on Spark so reference jobs port
with their mapper/reducer functions UNCHANGED.

Execution mapping (SURVEY.md §1.2):

- map phase      → ``rdd.flatMap`` over (key, value) pairs
- combiner       → per-partition local group + combine via
  ``mapPartitions`` (the map-side combine the reference would do
  before its shuffle)
- shuffle+reduce → ``groupByKey(num_partitions)`` + ``flatMap``

This is the engine's ONE deliberate RDD surface: arbitrary Python
objects as keys/values are exactly what DataFrames can't type. Jobs
expressible relationally should use the DataFrame operators instead
(every ``queries()`` entry is one); this layer exists for ports and
for genuinely dynamic jobs.

Scale: ``groupByKey`` materializes each key's values on one executor
— correct for the MR contract (reducer sees the full value iterator),
and the combiner keeps shuffle volume down, but a reducer that is
actually an aggregation should graduate to ``reduceByKey`` via
``run_job(..., associative_reduce=fn)`` or to a DataFrame groupBy.
"""

from __future__ import annotations

from collections import defaultdict
from collections.abc import Callable, Iterable, Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession

KV = tuple[Any, Any]
Mapper = Callable[[Any, Any], Iterable[KV]]
Reducer = Callable[[Any, Iterable[Any]], Iterable[KV]]


class MRJob:
    """Subclass-style job spec (the shape MR frameworks expose).

    Override ``mapper`` / ``reducer`` (and optionally ``combiner``);
    run with :func:`run_job` or chain with :func:`run_pipeline`.
    """

    def mapper(self, key: Any, value: Any) -> Iterable[KV]:
        yield (key, value)

    def combiner(self, key: Any, values: Iterable[Any]) -> Iterable[KV]:
        # default: identity pass-through (no local combine)
        for v in values:
            yield (key, v)

    combiner_defined = False  # subclasses setting a real combiner flip this

    def reducer(self, key: Any, values: Iterable[Any]) -> Iterable[KV]:
        yield (key, list(values))


def _combine_partition(
    combiner: Callable[[Any, Iterable[Any]], Iterable[KV]],
) -> Callable[[Iterator[KV]], Iterator[KV]]:
    def apply(part: Iterator[KV]) -> Iterator[KV]:
        groups: dict[Any, list[Any]] = defaultdict(list)
        for k, v in part:
            groups[k].append(v)
        for k, vs in groups.items():
            yield from combiner(k, vs)

    return apply


def run_job(
    spark: SparkSession,
    records: Iterable[KV] | "DataFrame",
    mapper: Mapper,
    reducer: Reducer,
    combiner: Callable[[Any, Iterable[Any]], Iterable[KV]] | None = None,
    num_partitions: int | None = None,
    associative_reduce: Callable[[Any, Any], Any] | None = None,
):
    """Run one MapReduce job; returns an RDD of output (k, v) pairs.

    ``records``: an iterable of (key, value) pairs, or a DataFrame
    (each row becomes ``(None, Row)`` — the common "value-only input"
    convention).

    ``associative_reduce``: fast path — when the reduction is an
    associative binary op, uses ``reduceByKey`` (map-side partial
    merge, shuffle carries one value per key per partition) instead
    of ``groupByKey``.
    """
    sc = spark.sparkContext
    if isinstance(records, DataFrame):
        rdd = records.rdd.map(lambda row: (None, row))
    elif hasattr(records, "flatMap"):  # already an RDD
        rdd = records
    else:
        rdd = sc.parallelize(list(records), num_partitions or sc.defaultParallelism)

    mapped = rdd.flatMap(lambda kv: mapper(kv[0], kv[1]))
    if associative_reduce is not None:
        return mapped.reduceByKey(associative_reduce, numPartitions=num_partitions)
    if combiner is not None:
        mapped = mapped.mapPartitions(_combine_partition(combiner))
    grouped = mapped.groupByKey(numPartitions=num_partitions)
    return grouped.flatMap(lambda kv: reducer(kv[0], kv[1]))


def run_mrjob(spark: SparkSession, job: MRJob, records, **kw):
    """Run a subclass-style :class:`MRJob`."""
    combiner = job.combiner if job.combiner_defined else None
    return run_job(
        spark, records, job.mapper, job.reducer, combiner=combiner, **kw
    )


def run_pipeline(spark: SparkSession, records, *jobs: MRJob, **kw):
    """Chain jobs: output pairs of job N feed job N+1 (the reference's
    manual-DAG chaining, SURVEY.md §3.1)."""
    out = records
    for job in jobs:
        out = run_mrjob(spark, job, out, **kw)
    return out
