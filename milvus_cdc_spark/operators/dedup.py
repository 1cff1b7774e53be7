"""Last-writer-wins dedup over the event sequence — the semantic core.

Replaces three reference mechanisms at once (SURVEY.md §2.4):

- intra-pack sort with Delete-before-Insert tie break
  (``core/reader/replicate_channel_manager.go:1451-1454``),
- per-target-channel serialized apply
  (``core/writer/replicate_message_manager.go:84-109``),
- ts-monotonicity rewrite (``:1846-1913``) — impossible to need here
  because ``event_seq`` is a total order per key by log construction.

One window, one shuffle on the merge key (which the downstream MERGE
join reuses — AQE sees matching partitioning). ``row_number`` (not
``rank``) because seq ties are impossible by construction; if a source
ever emitted ties, the ``delete_first`` ordering reproduces the
reference's Delete-before-Insert tie break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lww_dedup(
    events: DataFrame,
    key_cols: list[str],
    seq_col: str = "event_seq",
    type_col: str = "event_type",
    delete_type: str = "delete",
    delete_first_on_tie: bool = True,
) -> DataFrame:
    """Keep the winning (max-seq) event per key; adds ``__deleted``.

    Output has exactly one row per key — the contract
    :meth:`IceboxTable.merge` requires.
    """
    order = [F.col(seq_col).desc()]
    if delete_first_on_tie:
        # at equal seq, delete loses to a later-applied insert in the
        # reference's sort (delete sorts FIRST, so insert applies after
        # and wins) — mirror that: prefer the non-delete on ties.
        order.append(F.when(F.col(type_col) == delete_type, 1).otherwise(0).asc())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .withColumn("__deleted", F.col(type_col) == delete_type)
    )
