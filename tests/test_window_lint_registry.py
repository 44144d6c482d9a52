"""Registry-wide plan lint: NO query may run an UNBOUNDED
single-partition window (VERDICT r8 task 1 — kill the class, not the
instances).

``Window.orderBy(...)`` with no partition key drags its whole input
through ONE task. That is correct-but-wrong-at-100-TB whenever the
input is corpus- or user-sized; it is fine when the input is provably
bounded. This lint walks every registered query's PHYSICAL plan and
classifies each zero-partition WindowExec:

  * auto-OK — a limit node (TakeOrderedAndProject / Global/LocalLimit /
    CollectLimit / WindowGroupLimit) sits on the window's unary input
    chain: the window consumes at most K (or K-per-partition) rows.
    This is the sanctioned TakeOrdered-then-rank idiom (sample_dsir).
  * auto-OK — the window orders by a spark_partition_id-derived column
    over an aggregate (the ``distributed_cumsum`` offsets table:
    <= partition-count rows by construction).
  * otherwise it must be covered by an explicit ``uwin`` annotation on
    the QuerySpec — one justification string per sanctioned window
    (grid / group-domain / island-spine tables whose boundedness the
    plan cannot prove). More unaccounted windows than annotations
    fails the build.

The walk descends through cardinality-preserving-or-shrinking unary
nodes only; joins, unions and generators (which can re-expand a
bounded input) stop the descent, so a limit BELOW a join never
launders an unbounded window.
"""

from __future__ import annotations

import re

import pytest

from conftest import registry_sweep_params

from supabase_etl_spark.queries import load_all

SF = "/root/testdata/sf0.001"

_REGISTRY = load_all()

WINDOW_CLASSES = {"WindowExec", "WindowInPandasExec"}
LIMIT_NODES = (
    "TakeOrderedAndProjectExec",
    "GlobalLimitExec",
    "LocalLimitExec",
    "CollectLimitExec",
    "WindowGroupLimitExec",
)
# unary nodes safe to walk through looking for a limit (cardinality can
# only stay or shrink); anything NOT here stops the descent
WALK_THROUGH_PREFIXES = (
    "Project",
    "Filter",
    "Sort",
    "Exchange",
    "ShuffleExchange",
    "Coalesce",
    "Window",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "SerializeFromObject",
    "DeserializeToObject",
    "InputAdapter",
    "WholeStageCodegen",
    "AQEShuffleRead",
)

_PID_ORDER = re.compile(r"\b(__pfx_pid|_pid|pid)#")


def _children(node):
    ch = node.children()
    return [ch.apply(i) for i in range(ch.length())]


def _chain_has_limit(node) -> bool:
    """True if a limit node sits on the unary descent from ``node``."""
    seen = 0
    while node is not None and seen < 64:
        seen += 1
        cls = node.getClass().getSimpleName()
        if cls in LIMIT_NODES:
            return True
        if not cls.startswith(WALK_THROUGH_PREFIXES):
            return False
        kids = _children(node)
        if len(kids) != 1:
            return False
        node = kids[0]
    return False


def unaccounted_windows(df) -> list[str]:
    """Descriptions of every zero-partition window the auto-rules can't
    prove bounded."""
    out: list[str] = []

    def walk(node, depth=0):
        if depth > 400:
            return
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            walk(node.inputPlan(), depth + 1)
            return
        if cls in WINDOW_CLASSES:
            try:
                empty = node.partitionSpec().isEmpty()
            except Exception:
                empty = False
            if empty:
                kids = _children(node)
                child = kids[0] if kids else None
                order = ""
                try:
                    order = node.orderSpec().toString()
                except Exception:
                    pass
                limit_ok = child is not None and _chain_has_limit(child)
                pid_ok = (
                    child is not None
                    and child.getClass().getSimpleName().startswith(
                        ("HashAggregate", "ObjectHashAggregate", "SortAggregate")
                    )
                    and bool(_PID_ORDER.search(order))
                )
                if not (limit_ok or pid_ok):
                    out.append(f"{cls} orderBy={order[:120]}")
        for kid in _children(node):
            walk(kid, depth + 1)

    walk(df._jdf.queryExecution().executedPlan())
    return out


@pytest.mark.parametrize("name", registry_sweep_params(sorted(_REGISTRY)))
def test_no_unbounded_single_partition_windows(spark, name):
    spec = _REGISTRY[name]
    df = spec.fn(spark, SF)
    bad = unaccounted_windows(df)
    assert len(bad) <= len(spec.uwin), (
        f"{name}: {len(bad)} unpartitioned window(s) not provably bounded, "
        f"but only {len(spec.uwin)} sanctioned by uwin annotations.\n"
        "Either make the window distributed (operators.prefix."
        "distributed_rank / distributed_cumsum, or orderBy().limit() + "
        "rank-on-K-rows), or — ONLY if the input is genuinely bounded "
        "(grid / group-domain / island-spine table) — add a uwin "
        "justification to the @query decorator.\n" + "\n".join(bad)
    )
