"""Trajectory / mobility analytics on the cell lattice.

The standard movement-data workloads (origin-destination matrices,
dwell-time maps — the ArcGIS GeoAnalytics "Reconstruct Tracks" /
mobility-OD family): entities emit timestamped points; indexing them
to DGGS cells turns trajectory questions into plain relational
algebra, which is the repo's thesis applied to moving objects.

Both operators order each entity's points by a TOTAL key
(``ts_col`` then ``tiebreak_col``) — same-timestamp rows would
otherwise make lag()/lead() engine-dependent.  The per-entity window
is the sessionize shape: entities are many and individually small, so
partitions stay bounded (a pathological single-entity firehose is the
caller's skew to pre-split, as documented on sessionize).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from raster2dggs_spark.operators.joins import index_points


def od_matrix(points: DataFrame, entity_col: str, ts_col: str,
              res: int, dggs: str = "geohash",
              lon_col: str = "lon", lat_col: str = "lat",
              tiebreak_col: str | None = None,
              include_self: bool = False) -> DataFrame:
    """Origin-destination matrix: count of consecutive-point
    transitions between cells, over all entities.  ``include_self``
    keeps same-cell steps (default: only actual zone changes).
    Output: (from_cell, to_cell, n_trips)."""
    idx = index_points(points, res=res, dggs=dggs, lon_col=lon_col,
                       lat_col=lat_col)
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)]
                               if tiebreak_col else [])
    w = Window.partitionBy(entity_col).orderBy(*order)
    t = (idx.withColumn("from_cell", F.lag("cell").over(w))
         .where(F.col("from_cell").isNotNull()))
    if not include_self:
        t = t.where(F.col("from_cell") != F.col("cell"))
    return (t.groupBy("from_cell", F.col("cell").alias("to_cell"))
            .agg(F.count(F.lit(1)).alias("n_trips")))


def cell_dwell(points: DataFrame, entity_col: str, ts_col: str,
               res: int, dggs: str = "geohash",
               lon_col: str = "lon", lat_col: str = "lat",
               tiebreak_col: str | None = None) -> DataFrame:
    """Dwell-time map: per (entity, cell), the total time attributed
    to the cell — each point owns the interval up to the entity's NEXT
    point (last points own nothing; the usual open-ended convention).
    Output: (entity, cell, dwell_s double, n_points)."""
    idx = index_points(points, res=res, dggs=dggs, lon_col=lon_col,
                       lat_col=lat_col)
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)]
                               if tiebreak_col else [])
    w = Window.partitionBy(entity_col).orderBy(*order)
    # NTZ timestamps cannot cast to double directly; routing through
    # timestamp is difference-safe (a constant tz offset cancels in dt)
    sec = F.col(ts_col).cast("timestamp").cast("double")
    t = idx.withColumn(
        "dt", F.coalesce(F.lead(sec).over(w) - sec, F.lit(0.0)))
    return (t.groupBy(F.col(entity_col).alias("entity"), "cell")
            .agg(F.round(F.sum("dt"), 4).alias("dwell_s"),
                 F.count(F.lit(1)).alias("n_points")))


def event_transitions(events: DataFrame, entity_col: str = "user_id",
                      ts_col: str = "ts",
                      type_col: str = "event_type",
                      tiebreak: str | None = None) -> DataFrame:
    """First-order Markov transition matrix of an event stream (the
    clickstream / page-path staple): per entity, consecutive events
    ordered by ``(ts, tiebreak)`` form (from_type, to_type) pairs;
    output per pair the count and the row-normalized probability
    ``P(to | from)``.

    The order must be TOTAL for cross-engine determinism — pass
    ``tiebreak`` (e.g. an event id) when equal timestamps per entity
    can exist; without it, equal-instant neighbours make the pairing
    engine-dependent.

    Scale shape: one window over the ENTITY key (many small groups,
    never global), two map-side-combinable counts, one equi-join on
    the from-type marginal.  Like :func:`od_matrix` with event types
    in place of cells.
    """
    order = [F.col(ts_col).asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(entity_col).orderBy(*order)
    pairs = (events
             .withColumn("__next", F.lead(type_col).over(w))
             .where(F.col("__next").isNotNull())
             .groupBy(F.col(type_col).alias("from_type"),
                      F.col("__next").alias("to_type"))
             .agg(F.count(F.lit(1)).alias("n")))
    marg = pairs.groupBy("from_type").agg(F.sum("n").alias("__tot"))
    return (pairs.join(marg, "from_type")
            .select("from_type", "to_type",
                    F.col("n").cast("long").alias("n"),
                    F.round(F.col("n") / F.col("__tot"), 6)
                    .alias("prob")))
