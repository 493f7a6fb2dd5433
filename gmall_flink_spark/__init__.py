"""gmall_flink_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference real-time e-commerce warehouse
(HelloPain/gmall-flink, a Flink 1.17 DataStream/SQL codebase).

This is NOT a port of the Flink runtime: every capability is re-expressed as
declarative DataFrame / Spark SQL plans so Catalyst + Tungsten pick the
physical strategy (predicate pushdown, broadcast joins, whole-stage codegen,
AQE). See SURVEY.md at the repo root for the full operator inventory this
package implements.

Layout:
  session.py    SparkSession factory (timezone, AQE, shuffle sizing)
  schemas.py    envelope / page-log / config StructTypes  (SURVEY §1)
  sources/      batch + streaming readers, CDC-envelope synthesizer (§2.1)
  sinks/        kafka-style / upsert / parquet writers (§2.2)
  operators/    cdc predicates, dedup suite, join suite, window aggs (§2.3-2.8)
  functions/    scalar/table functions: tokenizer, dates, text metrics (§2.9-2.10)
  queries/      the oracle-checked query catalog (driver contract)
  streaming/    Structured Streaming lifts of the 17 pipelines (§2.11)
  llm/          LLM-data-pipeline extras: dedup, similarity, multimodal
"""

__version__ = "0.1.0"
