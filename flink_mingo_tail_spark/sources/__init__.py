"""Custom PySpark data sources (SURVEY.md §7.2 M6)."""
