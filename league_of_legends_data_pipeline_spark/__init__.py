"""PySpark-native analytics engine with the data-processing capabilities of
the reference game-analytics ETL pipeline (see SURVEY.md), rebuilt Spark-first.

Layout:
    session     SparkSession factory (AQE, Arrow, UTC, sane shuffle partitions)
    schemas     explicit StructTypes for the domain documents (match/timeline/ranks)
    plans/      schema-driven column-expression planners (flatten, pivot, splat)
    sources/    bronze readers (JSON envelope unwrap, routing) + simulated API source
    operators/  relational + LLM-data-pipeline operators (dedup, similarity,
                text analysis, as-of/range joins, multimodal plumbing)
    functions/  scalar column helpers (epoch normalize, date parts, prefix strip)
    sinks       partitioned Parquet writers + schema-evolving table writer
    state       ingestion bookmark window + run-state machine
    streaming/  Structured Streaming variant of the load pipeline
    etl         silver-table builders (player_data / timeline_data / player_ranks)
"""

__version__ = "0.1.0"
