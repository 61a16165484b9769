"""Query surface: operator inventory exposed as (Spark plan, DuckDB
oracle SQL) pairs for the correctness gate."""
