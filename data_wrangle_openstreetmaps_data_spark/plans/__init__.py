"""Query plans: the registry mapping SURVEY.md §2 operator names to
(Spark callable, DuckDB oracle SQL) pairs, plus the end-to-end pipeline."""
