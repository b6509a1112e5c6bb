"""Physical-plan inspection helpers — keep the plans we shipped.

The scale contract of this engine is a set of PLAN PROPERTIES, not hopes:
  * detection queries shuffle ONCE (window + groupBy share the hash
    partitioning on keys);
  * the tail-N window limit runs map-side BEFORE that exchange
    (``WindowGroupLimit`` under the Exchange) so the shuffle carries
    O(keys · window) rows, never full history;
  * scans push predicates (``PushedFilters``) and prune columns
    (``ReadSchema``);
  * small dimension joins broadcast.

``assert_plan`` lets tests pin those properties so a refactor that silently
adds a shuffle or loses pushdown fails CI, not the cluster bill.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as a string (what .explain() prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode)


def count_exchanges(plan: str) -> int:
    """Shuffle exchanges in the plan (BroadcastExchange excluded — broadcast
    is the cheap kind and counted separately). Counts the numbered detail
    headers of the formatted explain, where each node appears exactly once
    (the ASCII tree above repeats them)."""
    return len(re.findall(r"^\(\d+\) Exchange\b", plan, re.MULTILINE))


def count_broadcasts(plan: str) -> int:
    return len(re.findall(r"^\(\d+\) BroadcastExchange\b", plan, re.MULTILINE))


def assert_plan(
    df: DataFrame,
    *,
    max_exchanges: int | None = None,
    min_broadcasts: int | None = None,
    requires: tuple[str, ...] = (),
    forbids: tuple[str, ...] = (),
) -> str:
    """Assert structural properties of a DataFrame's physical plan.

    Returns the plan string (for further custom checks / debugging).
    """
    plan = explain_str(df)
    problems = []
    if max_exchanges is not None:
        n = count_exchanges(plan)
        if n > max_exchanges:
            problems.append(f"{n} shuffle exchanges (max {max_exchanges})")
    if min_broadcasts is not None and count_broadcasts(plan) < min_broadcasts:
        problems.append(
            f"{count_broadcasts(plan)} broadcasts (min {min_broadcasts})")
    for token in requires:
        if token not in plan:
            problems.append(f"missing required plan node/text: {token!r}")
    for token in forbids:
        if token in plan:
            problems.append(f"forbidden plan node/text present: {token!r}")
    if problems:
        raise AssertionError("; ".join(problems) + "\n--- plan ---\n" + plan)
    return plan
