"""Custom operators composed from DataFrame primitives (SURVEY.md §4.4:
no custom Catalyst rules needed — everything lands on public APIs)."""
