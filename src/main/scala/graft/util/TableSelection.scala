package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** DMS-style include/exclude table selection (SURVEY.md §2.2 P5).
  *
  * The reference selects replicated tables with wildcard rules —
  * `{"schema-name": "%", "table-name": "<pattern>", "rule-action":
  * "include"}` (`cdk_infrastructure/__init__.py:264-280`). This is the
  * same selector over the engine's table catalog: SQL-LIKE wildcards
  * (`%` any run, `_` one char), include rules minus exclude rules,
  * resolved against [[Tables]] loaders.
  *
  * Selection happens at plan time on names only — no data is touched for
  * excluded tables, so at 100 TB an exclude rule prunes entire datasets
  * before a single file listing.
  */
object TableSelection {

  /** The engine's table catalog (TESTDATA.md). */
  val catalog: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** SQL-LIKE wildcard match: `%` = any run (incl. empty), `_` = exactly
    * one char; everything else literal. */
  def likeMatches(pattern: String, name: String): Boolean = {
    val regex = pattern.flatMap {
      case '%' => ".*"
      case '_' => "."
      case c if "\\.[]{}()*+?^$|".contains(c) => "\\" + c
      case c => c.toString
    }
    name.matches("^" + regex + "$")
  }

  /** Table names selected by include patterns minus exclude patterns,
    * in catalog order. */
  def selectNames(
      includes: Seq[String],
      excludes: Seq[String] = Nil): Seq[String] =
    catalog.filter(n =>
      includes.exists(likeMatches(_, n)) && !excludes.exists(likeMatches(_, n)))

  /** Selected tables as loaded DataFrames (lazy plans — nothing is read
    * until a selected table is consumed). */
  def select(
      spark: SparkSession, sfDir: String,
      includes: Seq[String],
      excludes: Seq[String] = Nil): Map[String, DataFrame] =
    selectNames(includes, excludes).map { n =>
      n -> (if (n == "events") Tables.events(spark, sfDir)
            else Tables.load(spark, sfDir, n))
    }.toMap
}
