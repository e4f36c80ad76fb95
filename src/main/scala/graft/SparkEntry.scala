package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator's entry from the module
  * objects; `oracleSql` carries the DuckDB-equivalent SQL for each key that
  * is SQL-expressible (keys without SQL get a weaker rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q1-shaped grouped aggregation with decimal-exact sums.
    */
  def entry(spark: SparkSession): DataFrame =
    warehouse.RelationalQueries.queries("q01_agg_group")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    warehouse.RelationalQueries.queries ++
      warehouse.WindowQueries.queries ++
      warehouse.EventQueries.queries ++
      warehouse.ScalarQueries.queries ++
      warehouse.SetAggQueries.queries ++
      warehouse.ExtrasQueries.queries ++
      warehouse.TpchQueries.queries ++
      warehouse.TpchMoreQueries.queries ++
      warehouse.GraphQueries.queries ++
      warehouse.QualityQueries.queries ++
      warehouse.StatsQueries.queries ++
      warehouse.StatsQueries.moreQueries ++
      warehouse.SketchQueries.queries ++
      warehouse.ScaleQueries.queries ++
      cdc.CdcQueries.queries ++
      text.TextQueries.queries ++
      text.CorpusQueries.queries ++
      text.LmQueries.queries ++
      text.SamplingQueries.queries ++
      ann.AnnQueries.queries ++
      multimodal.MultimodalQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    warehouse.RelationalQueries.oracleSql ++
      warehouse.WindowQueries.oracleSql ++
      warehouse.EventQueries.oracleSql ++
      warehouse.ScalarQueries.oracleSql ++
      warehouse.SetAggQueries.oracleSql ++
      warehouse.ExtrasQueries.oracleSql ++
      warehouse.TpchQueries.oracleSql ++
      warehouse.TpchMoreQueries.oracleSql ++
      warehouse.GraphQueries.oracleSql ++
      warehouse.QualityQueries.oracleSql ++
      warehouse.StatsQueries.oracleSql ++
      warehouse.SketchQueries.oracleSql ++
      warehouse.ScaleQueries.oracleSql ++
      cdc.CdcQueries.oracleSql ++
      text.TextQueries.oracleSql ++
      text.CorpusQueries.oracleSql ++
      text.LmQueries.oracleSql ++
      text.SamplingQueries.oracleSql ++
      ann.AnnQueries.oracleSql ++
      multimodal.MultimodalQueries.oracleSql
}
