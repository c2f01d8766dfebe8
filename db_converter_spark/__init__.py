"""db_converter_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of O2eg/db_converter, rebuilt Spark-first.

Layout (see SURVEY.md for the blueprint):

- ``session``    — tuned SparkSession factory.
- ``catalog``    — testdata table registry (parquet → temp views).
- ``functions``  — PG-compat scalar shims, text/hash/vector helpers.
- ``operators``  — the query library: relational inventory (SURVEY §2.3-2.9)
                   plus training-data-pipeline ops (dedup, similarity, text).
- ``plans``      — the engine layer: packet/step/action model, generator
                   fan-out, idempotency ledger, runner, formatter, export
                   (SURVEY §2.1 E1-E35).
- ``sources``    — source/sink registry (parquet/csv/json/orc/jdbc).
- ``streaming``  — Structured Streaming analogs (chunked/incremental work).
"""

__version__ = "0.1.0"
