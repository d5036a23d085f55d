"""voter_file_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference ETL client
(thegoodparty/Voter-file-ETL, surveyed in /root/repo/SURVEY.md),
extended with the LLM-data-pipeline operator suite (dedup,
similarity search, text analysis, multimodal plumbing) and designed
for 100 TB scale:

- Everything is declarative DataFrame/SQL so Catalyst handles column
  pruning, predicate pushdown, join selection and AQE re-planning.
- No Python row UDFs in any hot path: geohash, minhash, simhash and
  vector math are closed-form Column expressions (JVM-side,
  whole-stage-codegen'd) or Arrow-vectorized pandas UDFs.
- Small dimensions broadcast; large-large joins shuffle on their keys
  with AQE skew handling; per-state routing from the reference
  collapses into a single partitioned dataset.

Layout:
  session.py    SparkSession factory with scale-tuned defaults
  registry.py   query-key registry (queries() + DuckDB oracle SQL)
  tables.py     testdata table loaders
  schema.py     voter schema registry (ported from the reference's
                prisma template — see SURVEY.md §1)
  sources/      readers/writers: TSV/CSV with projection+cast, parquet,
                manifest bookkeeping
  functions/    scalar/vector function library (geohash, text, vectors)
  operators/    relational + LLM-pipeline operators (dedup, similarity,
                text analysis, multimodal, ETL pipeline)
  plans/        the declared query surface (SURVEY.md §2 inventory)
  streaming/    Structured Streaming operators (tumbling windows, ...)
"""

__version__ = "0.1.0"
