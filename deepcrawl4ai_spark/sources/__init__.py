from deepcrawl4ai_spark.sources.tables import load_table, load_tables, TABLES  # noqa: F401
