"""KSQL-compatible SQL surface over Spark SQL (entry point 2, SURVEY.md §3)."""
