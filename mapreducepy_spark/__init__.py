"""mapreducepy_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the query and
data-processing capabilities of the ``darrenzhangcn/mapreducepy``
reference (a pure-Python MapReduce framework; see SURVEY.md §0 —
the reference checkout is empty in this environment, so the operator
contract is SURVEY.md §2, grounded in the driver's acceptance
harness).

Design (SURVEY.md §1.2, §3.2):

- **DataFrame-first.** Every operator is declared with the
  DataFrame/SQL API so Catalyst + AQE + whole-stage codegen do the
  physical planning. No custom IR — Catalyst *is* the IR.
- **RDD / Python UDFs only as escape hatches** — the MapReduce
  programming-model compatibility layer lives in ``mr.py`` and the
  UDF demonstrations in ``udf.py``; nothing on the oracle-checked
  hot path uses them.
- **Scale notes per operator.** Each query builder documents its
  shuffle/partitioning behavior at 100 TB in its docstring.

Layout:

- ``session``  — tuned SparkSession builder (AQE, shuffle sizing).
- ``io``       — parquet table loader over ``{sf_dir}/{name}.parquet``.
- ``registry`` — query catalog: name → (builder, oracle SQL, tags).
- ``operators/`` — relational operators (scan/filter/join/agg/window/
  sort/set/temporal).
- ``functions/`` — scalar function showcases (string/date/math/array/
  conditional/json).
- ``llm/``     — LLM-data-pipeline operators (dedup, similarity,
  text analysis, multimodal).
- ``streaming/`` — Structured Streaming twins of the temporal ops.
- ``mr``       — MapReduce-style (mapper/combiner/reducer) API.
"""

__version__ = "0.1.0"
