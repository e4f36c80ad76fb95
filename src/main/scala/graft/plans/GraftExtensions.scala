package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** Global registration hook: `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  * plans [[AsOfJoinNode]] in every session without touching application
  * code. `AsOf.join` also self-registers per session, so the extension is
  * only needed when plans are built some other way (e.g. deserialized). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // The whole custom-plan family: as-of, point-in-interval, overlap.
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectPlannerStrategy(_ => IntervalJoinStrategy)
    ext.injectPlannerStrategy(_ => OverlapJoinStrategy)
    // Inside the operator-optimization fixed point: the pushed filter /
    // inserted Projects immediately compose with the built-in
    // PushDownPredicates + ColumnPruning passes.
    AsOfRules.all.foreach(r => ext.injectOptimizerRule(_ => r))
    // The native scalar kernels as SQL functions (graft_parse_money,
    // graft_md5low48/64, graft_bpe_count, graft_vec_dot, graft_winnow)
    // — the same Expressions the Column API builds, codegen included.
    graft.functions.GraftFunctions.injectable.foreach(ext.injectFunction)
  }
}
