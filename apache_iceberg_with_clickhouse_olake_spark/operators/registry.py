"""Central query/operator registry.

Every operator from SURVEY.md section 2 registers itself here as a named
query: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are ANSI-SQL-expressible) a DuckDB oracle SQL string the driver
runs side-by-side for the correctness gate.

Column-name contract: Spark aliases and oracle SQL aliases MUST match --
the driver sorts columns by name before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB SQL; None => rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a query operator."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=(fn.__doc__ or "")
        )
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {
        name: spec.oracle
        for name, spec in REGISTRY.items()
        if spec.oracle is not None
    }


# Candidate operator modules; imported lazily so the registry degrades
# gracefully while modules land incrementally.
_MODULES = (
    "analytics",
    "cdc",
    "curation",
    "datagen_queries",
    "dedup",
    "evolution",
    "medallion",
    "multimodal",
    "sessions",
    "similarity",
    "text",
    "windows",
)

_loaded = False


def _load_all() -> None:
    """Import every operator module so decorators run.

    A missing module is skipped (it hasn't been built yet); an ImportError
    *inside* an existing module is a real bug and propagates.
    """
    global _loaded
    if _loaded:
        return
    import importlib

    for mod in _MODULES:
        try:
            importlib.import_module(f".{mod}", __package__)
        except ModuleNotFoundError as exc:
            if exc.name != f"{__package__}.{mod}":
                raise
    _loaded = True
