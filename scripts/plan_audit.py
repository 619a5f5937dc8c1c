"""Audit the physical plans of every queries() entry for scale red flags.

For each query, builds the DataFrame against sf0.001 and inspects the
executed-plan string for the anti-patterns that would not survive a 100 TB
cluster:

- CartesianProduct / BroadcastNestedLoopJoin: an unbinned interval join or a
  missing equi-key (quadratic at scale).
- BatchEvalPython: a row-at-a-time Python UDF in the plan (only Arrow-batched
  ArrowEvalPython / mapInPandas boundaries are sanctioned).
- UnboundedGlobalWindow (r12, VERDICT r11 #8 — previously an eyeballed
  note): a Window node with an EMPTY partition spec whose INPUT CHAIN
  (indentation-parsed tree walk: a join/union is bounded only if ALL its
  branches are, so neither a sibling branch nor one bounded join input
  can excuse an unbounded one) bottoms out in neither a partial/final
  aggregate nor a limit-class operator (TakeOrderedAndProject /
  CollectLimit / Global-/LocalLimit / WindowGroupLimit).
  The two-phase planners' global windows sit over a
  one-row-per-bucket summary (HashAggregate beneath — bounded by
  construction) and the top-k ranks sit over TakeOrdered(k); a global
  window over a FULL relation is the single-partition sort the bucketed
  planners exist to avoid, and now fails the audit LOUDLY instead of
  riding a prose note. WindowGroupLimit nodes themselves are skipped
  (they ARE the bounded-rank pushdown). Windows partitioned only by
  (Chromosome[, Strand]) over unaggregated input remain the listed
  informational class they have been since r5 — the islands planner's
  per-chromosome running scans are sequential by contract and show up in
  the notes for eyeballing, not as failures.

Usage: python scripts/plan_audit.py [query ...]
Exit 1 if any HARD flag fires.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

HARD = ("CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython")
SF = "/root/testdata/sf0.001"

#: Aggregate physical nodes that bound a subtree's row count to its group
#: count (the two-phase planners' bucket summaries are built by these).
_AGG_RE = re.compile(r"\b(HashAggregate|SortAggregate|ObjectHashAggregate)\b")
#: Limit-class nodes that bound a subtree's row count to a constant k.
_LIMIT_RE = re.compile(
    r"\b(TakeOrderedAndProject|CollectLimit|GlobalLimit|LocalLimit|WindowGroupLimit)\b"
)
#: Window-family physical nodes (WindowGroupLimit excluded: it IS the
#: bounded-rank pushdown, not a window compute).
_WINDOW_RE = re.compile(r"\b(?:RunningWindowFunction|Window)\b(?!GroupLimit)")
#: Low-cardinality interval keys: a window partitioned ONLY by these caps
#: parallelism at #chromosomes (~25) regardless of cluster size.
_NARROW_KEYS = {"Chromosome", "Strand"}


def _node_depth(line: str) -> int:
    """Tree depth of a plan line = column of its '+- ' / ':- ' marker;
    rootish lines (no marker) are depth -1."""
    m = re.search(r"[+:]- ", line)
    return m.start() if m else -1


def _subtree_lines(lines: list[str], i: int) -> list[str]:
    """The child subtree of the node at ``lines[i]``: following lines with
    strictly greater marker depth (stops at the next sibling/uncle, so a
    join's other branch is never included)."""
    d0 = _node_depth(lines[i])
    out = []
    for ln in lines[i + 1 :]:
        d = _node_depth(ln)
        if d <= d0:
            break
        out.append(ln)
    return out


def _child_indices(lines: list[str], i: int) -> list[int]:
    """Indices of the DIRECT children of the node at ``lines[i]``: the
    minimum-depth lines inside its subtree."""
    d0 = _node_depth(lines[i])
    children: list[int] = []
    child_depth = None
    for j in range(i + 1, len(lines)):
        d = _node_depth(lines[j])
        if d <= d0:
            break
        if child_depth is None or d < child_depth:
            child_depth = d
            children = [j]
        elif d == child_depth:
            children.append(j)
    return children


_MULTI_CHILD_RE = re.compile(r"\b(Join|CartesianProduct|Union)\b")


def _input_bounded(lines: list[str], i: int) -> bool:
    """Whether the node at ``lines[i]`` produces a bounded (summary/top-k
    sized) relation: it IS an aggregate/limit, or — walking its OWN input
    chain, not just any line in the subtree — every branch of its input
    bottoms out in one. A join/union is bounded only if ALL its children
    are (r12 review: `any(agg in subtree)` let a global window over
    join(full_relation, summary) pass as bounded — the summary branch's
    aggregate excused the unbounded branch)."""
    ln = lines[i]
    if _AGG_RE.search(ln) or _LIMIT_RE.search(ln):
        return True
    children = _child_indices(lines, i)
    if not children:
        return False  # leaf scan / reused exchange: assume full relation
    if _MULTI_CHILD_RE.search(ln):
        return all(_input_bounded(lines, c) for c in children)
    return _input_bounded(lines, children[0])


def _partition_cols(window_line: str) -> list[str] | None:
    """Partition-spec column base names of a Window node line, via its
    windowspecdefinition(...) argument list: the partition columns are the
    leading entries with no ASC/DESC direction. None when no
    windowspecdefinition is printed (WindowGroupLimit etc.) — callers then
    fall back to flagging only on a missing aggregate."""
    m = re.search(r"windowspecdefinition\(([^)]*)\)", window_line)
    if not m:
        return None
    cols = []
    for entry in m.group(1).split(","):
        entry = entry.strip()
        if "specifiedwindowframe" in entry:
            break
        if " ASC" in entry or " DESC" in entry:
            break  # order spec starts; partition spec is what came before
        base = entry.split("#")[0].strip()
        if base:
            cols.append(base)
    return cols


def audit_plan(plan: str) -> tuple[list[str], list[str]]:
    """(hard_flags, notes) for one executed-plan string. Importable so the
    test suite can assert the synthetic failure cases directly."""
    flags = [h for h in HARD if h in plan]
    # A BroadcastNestedLoopJoin whose sides are keyless (scalar)
    # aggregates is a 1-row x 1-row cross (jaccard/forbes/fdr join their
    # scalar totals back) — constant-size at any scale, not a red flag.
    notes = []
    if "BroadcastNestedLoopJoin" in flags and "HashAggregate(keys=[]" in plan:
        flags.remove("BroadcastNestedLoopJoin")
        notes.append("scalar-cross ok")

    lines = plan.split("\n")
    bounded_global = 0
    narrow_full = 0
    for i, ln in enumerate(lines):
        if not _WINDOW_RE.search(ln):
            continue
        cols = _partition_cols(ln)
        is_global = cols is None or cols == []  # no spec printed == global
        is_narrow = bool(cols) and all(c in _NARROW_KEYS for c in cols)
        if not (is_global or is_narrow):
            continue  # high-cardinality partition key: scales with data
        children = _child_indices(lines, i)
        bounded = bool(children) and all(_input_bounded(lines, c) for c in children)
        if is_global and not bounded:
            flags.append("UnboundedGlobalWindow")
        elif is_global:
            bounded_global += 1  # summary/top-k relation: by construction
        else:
            narrow_full += 1  # per-chromosome scan: listed for eyeballing
    if bounded_global:
        notes.append(f"global-window-over-bounded-input x{bounded_global}")
    if narrow_full:
        notes.append(f"chromosome-partitioned-window x{narrow_full}")
    return flags, notes


def main() -> int:
    import __spark_entry__ as m
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    only = set(sys.argv[1:])
    hard_hits = []
    for name, fn in m.queries().items():
        if only and name not in only:
            continue
        try:
            plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: PLAN ERROR {type(e).__name__}: {e}")
            hard_hits.append(name)
            continue
        flags, notes = audit_plan(plan)
        status = ("FLAG " + ",".join(flags) if flags else "ok") + (
            f" ({'; '.join(notes)})" if notes else ""
        )
        print(f"{name}: {status}")
        if flags:
            hard_hits.append(name)
    spark.stop()
    print(f"\nhard flags: {hard_hits if hard_hits else 'none'}")
    return 1 if hard_hits else 0


if __name__ == "__main__":
    raise SystemExit(main())
