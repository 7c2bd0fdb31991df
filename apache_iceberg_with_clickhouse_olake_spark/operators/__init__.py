"""Operator library: every SURVEY.md §2 operator as a registered query.

Modules register themselves with :mod:`.registry` via the ``@query``
decorator; ``registry.all_queries()`` / ``registry.all_oracles()`` are the
driver-facing surface (consumed by ``__spark_entry__``).
"""
