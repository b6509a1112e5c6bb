"""Changelog application — turn a CDC/event stream of row versions into
a current snapshot (latest-wins upsert + deletes) or a type-2 history.

The incremental complement to ``dedup.snapshot_diff``: diff answers
"what changed between two snapshots I already have"; ``apply_changes``
answers "give me the new snapshot from the old one plus a changelog" —
the standard lakehouse MERGE / ``APPLY CHANGES INTO`` semantics
(Delta/Iceberg upsert), expressed as plain DataFrame ops so it runs on
bare parquet.

Scale shape (100 TB snapshot, bounded changelog — the common case):

* the changelog collapses to ONE ROW PER KEY with a single ``max_by``
  aggregate (partial map-side combine; the only changelog exchange);
* untouched snapshot rows never shuffle: the changed-key frame is
  bounded by the changelog, so removal is a BROADCAST left-anti join
  and the survivors keep their input partitioning;
* the union with the upserts is free (no exchange).

For a changelog too big to broadcast its key set, pass
``broadcast_keys=False`` — the anti join shuffles both sides on the
keys instead (the same fallback contract as
``decontam.contamination(broadcast_eval=False)``).

Determinism contract: ``(keys, sequence_col, *tiebreak_cols)`` must
totally order each key's changes (a CDC feed's log offset / LSN always
does); ties beyond that make the surviving row engine-arbitrary, same
as any MERGE. DuckDB value parity in tests/test_changelog.py.

No reference analogue (the reference is a univariate stats library).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["latest_changes", "apply_changes", "scd2_history"]


def _is_delete(op_col: str | None, delete_values: Sequence[str]):
    if op_col is None:
        return F.lit(False)
    return F.lower(F.col(op_col)).isin([v.lower() for v in delete_values])


def latest_changes(
    changes_df: DataFrame,
    keys: Sequence[str],
    sequence_col: str,
    *,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """One row per key: the change with the greatest
    ``(sequence_col, *tiebreak_cols)``. Columns pass through unchanged.

    One ``max_by(struct(payload), struct(ordering))`` aggregate — a
    single exchange on the keys with map-side partial combine, so a
    billion-row changelog folds to its key cardinality before the
    shuffle. (A ``row_number`` window would sort every key group and
    carry all rows through the exchange.)"""
    if not keys:
        raise ValueError("keys must be non-empty")
    ordering = F.struct(F.col(sequence_col),
                        *[F.col(c) for c in tiebreak_cols])
    payload = F.struct(*[F.col(c) for c in changes_df.columns])
    return (
        changes_df.groupBy(*[F.col(k) for k in keys])
        .agg(F.max_by(payload, ordering).alias("_r"))
        .select("_r.*")
    )


def apply_changes(
    snapshot_df: DataFrame,
    changes_df: DataFrame,
    keys: Sequence[str],
    sequence_col: str,
    *,
    op_col: str | None = None,
    delete_values: Sequence[str] = ("delete", "d"),
    tiebreak_cols: Sequence[str] = (),
    broadcast_keys: bool = True,
) -> DataFrame:
    """The new snapshot: ``snapshot_df`` with the changelog applied —
    per key, the LATEST change wins; a latest-is-delete key is removed;
    keys absent from the changelog pass through untouched (and never
    shuffle when ``broadcast_keys``). Output schema == snapshot schema.

    ``changes_df`` must carry every snapshot column plus
    ``sequence_col`` (and ``op_col`` if deletes exist — without it the
    changelog is upsert-only). Earlier versions of a key in the same
    changelog are superseded entirely (full-row replace semantics, not
    column patching): an insert→update→delete key ends deleted, a
    delete→reinsert key ends present — exactly one ``max_by`` decides.
    """
    missing = [c for c in snapshot_df.columns if c not in changes_df.columns]
    if missing:
        raise ValueError(
            f"changes_df lacks snapshot columns {missing}; apply_changes "
            "replaces whole rows — provide every snapshot column")
    lat = latest_changes(changes_df, keys, sequence_col,
                         tiebreak_cols=tiebreak_cols)
    changed_keys = lat.select(*keys)
    if broadcast_keys:
        changed_keys = F.broadcast(changed_keys)
    untouched = snapshot_df.join(changed_keys, list(keys), "left_anti")
    upserts = (
        lat.where(~_is_delete(op_col, delete_values))
        .select(*snapshot_df.columns)
    )
    return untouched.unionByName(upserts)


def scd2_history(
    changes_df: DataFrame,
    keys: Sequence[str],
    sequence_col: str,
    *,
    op_col: str | None = None,
    delete_values: Sequence[str] = ("delete", "d"),
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Type-2 slowly-changing history: every non-delete change becomes a
    VERSION row valid over ``[valid_from, valid_to)`` in sequence units —
    ``valid_from`` its own sequence value, ``valid_to`` the next change's
    (NULL = still open), ``is_current`` true on open versions. A delete
    closes the preceding version (its sequence becomes that version's
    ``valid_to``) and emits no row of its own.

    One window per key (``lead`` over the per-key sequence order) — the
    partitionBy carries the same keys as any downstream per-key join, so
    the exchange is shared; no global sort, no driver state. History for
    a key grows with its change count only."""
    if not keys:
        raise ValueError("keys must be non-empty")
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        F.col(sequence_col).asc(),
        *[F.col(c).asc() for c in tiebreak_cols])
    out = (
        changes_df
        .withColumn("valid_from", F.col(sequence_col))
        .withColumn("valid_to", F.lead(sequence_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull()
                    & ~_is_delete(op_col, delete_values))
    )
    return out.where(~_is_delete(op_col, delete_values))
