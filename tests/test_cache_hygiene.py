"""The persist-leak class (r12 verdict finding 1) fails in-repo.

Two guards:

1. Static AST scan: every ``.persist(`` call in ``plans/`` must live
   in a function that also releases it — an ``unpersist`` call or a
   ``checkpoint_release`` wrap (operators/cache.py) — or carry an
   explicit whitelist entry with a documented exemption. Operators
   under ``operators/`` own their retention contracts individually
   (rank.py and dedup.py document theirs) and are not scanned.
2. Runtime delta: running each formerly-leaky key leaves ZERO new
   cache-registry-pinned RDDs behind. Locally-checkpointed blocks
   are excluded from the accounting — they are lineage-owned and
   ContextCleaner-freed once the result frame is dropped, unlike
   persist blocks which pin until unpersist (CLAUDE.md
   cache-accounting note: deltas, never absolutes, in the shared
   session).
"""

from __future__ import annotations

import ast
import pathlib

import pytest

from tests.conftest import SF_SMOKE

_PLANS_DIR = (
    pathlib.Path(__file__).resolve().parents[1]
    / "stock_data_project_spark"
    / "plans"
)

# (file, function) pairs allowed to persist without an in-function
# release. Keep empty unless a documented exemption exists.
_WHITELIST: set[tuple[str, str]] = set()

# Keys the r12 verdict named as the leak class (plus the two
# distributed_ntile consumers that leaked through the operator's
# ranged-frame contract). Each must now run clean.
_FIXED_KEYS = [
    "segment_dedup",
    "exact_substring_spans",
    "tfidf_retrieval",
    "rfm_segmentation",
    "basket_lift",
    "entity_resolution",
    "ntile_deciles",
    "triangle_count",
]


def _fn_nodes(tree: ast.AST):
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            yield node


def _calls(fn: ast.AST, pred) -> bool:
    return any(
        isinstance(n, ast.Call) and pred(n.func) for n in ast.walk(fn)
    )


def test_every_plans_persist_is_released():
    offenders = []
    for py in sorted(_PLANS_DIR.glob("*.py")):
        tree = ast.parse(py.read_text())
        for fn in _fn_nodes(tree):
            persists = _calls(
                fn,
                lambda f: isinstance(f, ast.Attribute) and f.attr == "persist",
            )
            if not persists:
                continue
            releases = _calls(
                fn,
                lambda f: (
                    isinstance(f, ast.Attribute) and f.attr == "unpersist"
                )
                or (isinstance(f, ast.Name) and f.id == "checkpoint_release"),
            )
            if not releases and (py.name, fn.name) not in _WHITELIST:
                offenders.append(f"{py.name}:{fn.name}")
    assert not offenders, (
        f"plans/ functions persist without a paired release "
        f"(unpersist / checkpoint_release) — the r12 persist-leak "
        f"class: {offenders}"
    )


def _pinned_rdd_ids(spark) -> set[int]:
    """IDs of cache-registry-pinned (non-locally-checkpointed)
    persistent RDDs."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    ids: set[int] = set()
    it = jmap.entrySet().iterator()
    while it.hasNext():
        e = it.next()
        if not e.getValue().rdd().isLocallyCheckpointed():
            ids.add(e.getKey())
    return ids


@pytest.mark.parametrize("key", _FIXED_KEYS)
def test_key_leaves_no_pinned_cache(spark, key):
    from stock_data_project_spark import plans

    fn = plans.all_queries()[key]
    before = _pinned_rdd_ids(spark)
    assert fn(spark, SF_SMOKE).count() > 0
    leaked = _pinned_rdd_ids(spark) - before
    assert not leaked, (
        f"{key} left {len(leaked)} cache-registry-pinned RDD(s) "
        f"behind (ids {sorted(leaked)}) — the r12 persist-leak class"
    )
