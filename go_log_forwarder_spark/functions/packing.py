"""Training-data sequence packing (GPT-style concat-and-chunk placement).

Sequences are concatenated per group in a deterministic order and sliced
into fixed ``ctx``-token context windows; the operator emits each
sequence's byte-exact placement (start offset, first/last window, boundary
crossing) WITHOUT materializing the packed windows — the map is what a
packing writer needs, and it is joinable back to the token arrays.

Scale shape (VERDICT r2 item 3): a two-level distributed prefix sum. The
order key is cut into ``block``-wide blocks (floor(ord/B) is monotone in
the order, so block order == sequence order); level 1 cumsums WITHIN
(group, block) — the window key is high-cardinality, every task bounded by
~B rows; level 2 cumsums the per-block subtotals per group — a window over
the AGGREGATED relation (rows/B), broadcast-joined back. A single window
partitioned by the (low-cardinality) group alone would serialize each
group's full row set through ONE task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_concat_map(
    df: DataFrame,
    ctx: int,
    ord_col: Column,
    group_col: str = "source",
    len_col: str = "n_tok",
    block: int = 65536,
) -> DataFrame:
    """Placement map for concat-and-chunk packing.

    ``ord_col`` must be a NUMERIC column strictly increasing in the
    desired concatenation order within each group (e.g. a doc-id suffix).
    Returns ``df``'s columns plus (start_off, win_first, win_last,
    crosses_boundary). Output equals the naive
    ``sum(len) over (partition by group order by ord)`` cumsum exactly.
    """
    toks = df.withColumn("_ord", ord_col).withColumn(
        "_blk", F.floor(F.col("_ord") / block).cast("bigint")
    )
    w_intra = (
        Window.partitionBy(group_col, "_blk")
        .orderBy("_ord")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    intra = toks.withColumn("_iend", F.sum(len_col).over(w_intra))
    w_blk = (
        Window.partitionBy(group_col)
        .orderBy("_blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boff = (
        toks.groupBy(group_col, "_blk")
        .agg(F.sum(len_col).alias("_btot"))
        .withColumn("_boff", F.coalesce(F.sum("_btot").over(w_blk), F.lit(0)))
        .select(group_col, "_blk", "_boff")
    )
    joined = intra.join(F.broadcast(boff), [group_col, "_blk"])
    end = F.col("_boff") + F.col("_iend")
    win_first = F.floor((end - F.col(len_col)) / ctx).cast("bigint")
    win_last = F.floor((end - 1) / ctx).cast("bigint")
    return joined.select(
        *df.columns,
        (end - F.col(len_col)).cast("bigint").alias("start_off"),
        win_first.alias("win_first"),
        win_last.alias("win_last"),
        (win_first != win_last).alias("crosses_boundary"),
    )
