"""Declared oracle queries (SURVEY.md §2.11).

Each module exposes ``QUERIES: dict[str, Callable[[SparkSession, str],
DataFrame]]`` and ``ORACLES: dict[str, str]`` (DuckDB ANSI SQL over the
pre-registered parquet views).  ``__spark_entry__.py`` merges them.
"""
