package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The shared broadcast-merge step of the signed-weight IVM family
  * ([[IncrementalAgg]], [[IncrementalDistinct]], [[IncrementalJoin]]):
  * fold a |Δ|-sized aggregated delta into a base-sized state table
  * WITHOUT shuffling the state.
  *
  * The naive fold — union the delta under the state and re-aggregate —
  * re-shuffles the ENTIRE state every commit (the union erases its
  * partitioning), so maintenance costs as much network as recomputing
  * the view. A join-based fold that hopes to reuse the state's hash
  * partitioning is fragile: once the state has been lineage-cut
  * (localCheckpoint / checkpoint, mandatory for plan-growth control
  * across commits), the LogicalRDD reports unknown partitioning under
  * AQE and the planner re-shuffles anyway — measured, not theorized,
  * in `graft.IvmProbe`.
  *
  * The merge instead decomposes by which side a key appears on:
  *
  *   updated = state LEFT JOIN broadcast(delta)   — every state row,
  *             counters summed where the delta touched it; a
  *             broadcast-hash probe, state streams in place;
  *   fresh   = delta keys absent from state — bounded by |Δ|:
  *             `hit` = state LEFT SEMI broadcast(delta) (≤ |Δ| rows,
  *             again a broadcast probe), then delta LEFT ANTI
  *             broadcast(hit) — tiny × tiny;
  *   result  = updated ∪ fresh.
  *
  * Total shuffle per fold: the delta's own pre-aggregate. Everything
  * else is a broadcast build of |Δ| rows plus one streaming pass over
  * the cached state — at 100 TB the state never crosses the network.
  * Contract: the delta must be micro-batch sized (it is collected to
  * the driver for the broadcast); for a giant backfill window, rebuild
  * the view from scratch instead — that is the cheaper plan anyway.
  *
  * Callers filter the liveness predicate (m > 0 / n > 0) AFTER the
  * merge — the merge itself is sign-agnostic.
  *
  * @param keys     join key column names (present in both inputs)
  * @param counters (stateCol, deltaCol) pairs summed as
  *                 coalesce(state, 0) + coalesce(delta, 0); the output
  *                 keeps the state-side names
  */
object IvmFold {
  def mergeCounts(state: DataFrame, delta: DataFrame, keys: Seq[String],
      counters: Seq[(String, String)]): DataFrame = {
    val keyCols = keys.map(col)
    val summed = counters.map { case (s, d) =>
      (coalesce(col(s), lit(0L)) + coalesce(col(d), lit(0L))).as(s)
    }
    val updated = state.join(broadcast(delta), keys, "left")
      .select(keyCols ++ summed: _*)
    val hit = state.join(broadcast(delta), keys, "left_semi")
      .select(keyCols: _*)
    val fresh = delta.join(broadcast(hit), keys, "left_anti")
      .select(keyCols ++ counters.map { case (s, d) => col(d).as(s) }: _*)
    updated.unionByName(fresh)
  }
}
