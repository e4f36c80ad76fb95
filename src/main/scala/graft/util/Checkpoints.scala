package graft.util

import org.apache.spark.sql.Dataset

/** Lineage cuts for iterative operators — with an opt-in RELIABLE mode
  * for cluster deployments.
  *
  * Every fixpoint loop in this library (components, star contraction,
  * PageRank, k-core peeling, BFS, greedy coverage, the SCD2/aggregate
  * folds) must cut its logical plan every round or the plan grows without
  * bound (linearly at best, exponentially where a round references its
  * frame more than once — the q118 OOM lesson). The default cut is an
  * eager `localCheckpoint`: blocks live in executor storage, no
  * distributed-FS round trip, which is the right trade on a healthy
  * cluster and the only option in local mode.
  *
  * THE CONTRACT, stated plainly: a local checkpoint is NON-RELIABLE —
  * its blocks are not replicated to stable storage, so losing ANY
  * executor that holds one aborts the whole job (Spark cannot recompute
  * a truncated lineage). On a 1000-executor, multi-hour 100 TB run,
  * executor loss is an operational certainty, not a tail risk (round-7
  * verdict #2). For those runs, opt in to reliable checkpoints:
  *
  * {{{
  *   spark.sparkContext.setCheckpointDir("hdfs:///ckpt/graft")   // or s3a://
  *   spark.conf.set(Checkpoints.Flag, "true")
  * }}}
  *
  * [[cut]] then writes each round's frame to the checkpoint dir via
  * `Dataset.checkpoint(eager = true)`: every round costs one durable
  * write, and an executor loss costs one round's recompute from the last
  * checkpoint instead of the job. Results are identical either way
  * (CheckpointsSpec pins one iterative operator under both modes).
  */
object Checkpoints {

  /** Session conf key: "true" → reliable `checkpoint()` (requires
    * `sparkContext.setCheckpointDir`); default local checkpoints. */
  val Flag = "spark.graft.reliableCheckpoints"

  /** Eagerly materialize `ds` and truncate its lineage, honoring
    * [[Flag]]. Fails fast if reliable mode is on without a checkpoint
    * dir (the silent alternative would be localCheckpoint — exactly the
    * non-durability the caller opted out of). */
  def cut[T](ds: Dataset[T]): Dataset[T] = {
    val s = ds.sparkSession
    if (s.conf.get(Flag, "false").toBoolean) {
      require(s.sparkContext.getCheckpointDir.isDefined,
        s"$Flag=true requires sparkContext.setCheckpointDir(...) first")
      ds.checkpoint(eager = true)
    } else ds.localCheckpoint(eager = true)
  }

  /** `.cutLineage()` postfix syntax for [[cut]]. */
  implicit class CutOps[T](private val ds: Dataset[T]) extends AnyVal {
    def cutLineage(): Dataset[T] = Checkpoints.cut(ds)
  }
}
