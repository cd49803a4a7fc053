"""Round-materialization hygiene for iterative operators.

Every superstep loop in the engine (connected components, pointer
doubling, frontier Bellman-Ford, label propagation) truncates its
per-round plan with an eager ``localCheckpoint``.  That alone is NOT
enough on Spark 3.4+/4.x: ``localCheckpoint`` PRESERVES the child
plan's size-in-bytes ESTIMATE on the resulting ``LogicalRDD`` (so AQE
and broadcast decisions keep working across the truncation), and
Catalyst's size-only estimator multiplies child sizes at every join.
A loop whose round plan joins the previous round's frame with itself
(pointer jumping joins it TWICE: size -> size^4) therefore compounds
the carried estimate geometrically — the BigInteger digit count grows
2-4x per round, planning time explodes once the numbers reach ~10^5
digits, and a long enough loop dies with ``ArithmeticException:
BigInteger would overflow supported range`` (hit by the round-8
contour_stitch gate run; see OPTIMIZATION_r08.md "Inherited state").

:func:`loop_checkpoint` bounds the carried statistic by PERSISTING the
round frame before checkpointing it: the round's action materializes
the cache, and from then on every plan that references the frame reads
the InMemoryRelation's REAL materialized byte size instead of the
compounded estimate — each round's checkpoint then carries a small,
accurate number, every round, forever.  The cache handle of the
previous round is unpersisted once the new round has landed (rolling
window of one), so loop memory stays bounded by two slim frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def loop_checkpoint(df: DataFrame, prev: DataFrame | None = None,
                    reset: bool = True) -> tuple[DataFrame, DataFrame]:
    """Materialize one loop round with bounded planner statistics.

    Returns ``(checkpointed, cache_handle)``.  ``checkpointed`` is the
    eager localCheckpoint (flat plan, truncated lineage) to use as the
    next round's input; pass ``cache_handle`` back as ``prev`` on the
    NEXT call so the previous round's cache is released only after the
    new round is materialized.  Any ``Observation`` attached to ``df``
    fires during this call's action (exactly as with a bare eager
    localCheckpoint).

    ``reset=False`` skips the persist and carries ``prev`` forward —
    a plain eager checkpoint.  The carried estimate's digit count
    grows a bounded factor (2-4x) per unreset round, so callers
    resetting every K rounds keep it under ~4^K x tens of digits:
    ``reset=(round % 4 == 3)`` bounds it below ~5k digits (sub-ms
    BigInt arithmetic) while paying the cache-write cost on only a
    quarter of the rounds (measured: the every-round persist cost
    ~0.17 s/round on the 100k-edge CC bench, ~28% of the round).
    The FIRST call of a loop must reset (it seeds the bound).
    """
    if not reset:
        return df.localCheckpoint(eager=True), prev
    cache = df.persist()
    out = cache.localCheckpoint(eager=True)
    if prev is not None:
        prev.unpersist()
    return out, cache
