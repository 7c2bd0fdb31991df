"""Sources & sinks (SURVEY.md section 2.1)."""

from .parquet import TABLES, load_table, load_tables, register_views  # noqa: F401
