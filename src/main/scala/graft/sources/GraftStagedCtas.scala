package graft.sources

import java.util.{Map => JMap, Set => JSet, UUID}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog.{StagedTable, SupportsWrite, TableCapability}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType
import org.apache.hadoop.fs.{Path => HPath}

import graft.cdc.Apply

/** ATOMIC `CREATE TABLE … AS SELECT` (round 15, verdict r14 #3): the
  * [[GraftCatalog]] is a `StagingTableCatalog`, so Spark plans CTAS as
  * `AtomicCreateTableAsSelectExec` — it writes the query through THIS
  * staged table first and only then calls [[commitStagedChanges]];
  * any failure (query error, fold-axis NULLs, a concurrent CREATE
  * winning the lease) calls [[abortStagedChanges]] instead.
  *
  * The round-14 CTAS was Spark's non-atomic fallback: create an empty
  * table, then INSERT — with a window where a reader observes the
  * empty created table, and a failure path that had to mop up via
  * `dropEmptyTable`. Here NOTHING about the table exists until the
  * commit: the query's rows land as plain parquet under the table's
  * own `_staging/ctas-<uuid>/` (task-side, cluster-visible — the same
  * staging discipline as the row-level face), and
  * [[Apply.ctasCommit]] folds them so the FIRST manifest the table
  * ever gets (commit 1) already points at the data — creation and
  * first load in ONE pointer move. Abort just deletes the staging
  * dir; there is no created table to drop.
  *
  * The write face is the V1 fallback (an [[InsertableRelation]]
  * writing the staged parquet) — the same idiom as the merge table's
  * INSERT path, and all the staged write needs: envelope conversion,
  * validation and the fold happen once, at commit, under the lease. */
private[sources] sealed abstract class GraftStagedWriteTable(
    spark: SparkSession, dir: String, tableSchema: StructType,
    kind: String)
  extends StagedTable with SupportsWrite {

  protected val stage =
    s"$dir/${Apply.StagingDirName}/$kind-${UUID.randomUUID}"

  override def name(): String = s"graft:$kind-staged:$dir"
  override def schema(): StructType = tableSchema
  override def partitioning(): Array[Transform] = Array.empty
  override def properties(): JMap[String, String] =
    java.util.Collections.emptyMap()

  // TRUNCATE: REPLACE TABLE … AS SELECT plans its staged write as
  // OverwriteByExpression(true) — the capability (and the truncate()
  // builder face below) admit it. For a STAGED table truncation is
  // vacuous: the staging dir is born empty, and the replace semantics
  // live in the commit verb, not the write mode.
  override def capabilities(): JSet[TableCapability] =
    Set(TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder
      with org.apache.spark.sql.connector.write.SupportsTruncate {
      override def truncate(): WriteBuilder = this
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame,
                overwrite: Boolean): Unit = {
              data.write.mode("overwrite").parquet(s"$stage/in")
            }
          }
      }
    }

  /** Commit the staged rows at `stagedIn` — the only variance between
    * CTAS and REPLACE. */
  protected def commitStaged(stagedIn: String): Unit

  override def commitStagedChanges(): Unit = {
    val hc = graft.util.Hfs.conf(spark)
    try commitStaged(s"$stage/in")
    finally graft.util.Hfs.delete(new HPath(stage), hc)
  }

  override def abortStagedChanges(): Unit = {
    val hc = graft.util.Hfs.conf(spark)
    graft.util.Hfs.delete(new HPath(stage), hc)
    // if nothing else ever landed under the would-be table root, clear
    // the (now empty) staging parent too — a failed CTAS leaves no
    // trace of the table that never was
    val staging = new HPath(s"$dir/${Apply.StagingDirName}")
    if (graft.util.Hfs.list(staging, hc).isEmpty)
      graft.util.Hfs.delete(staging, hc)
  }
}

private[sources] final class GraftStagedCtasTable(
    spark: SparkSession, dir: String, tableSchema: StructType,
    keyCol: String, nBuckets: Int)
  extends GraftStagedWriteTable(spark, dir, tableSchema, "ctas") {
  override protected def commitStaged(stagedIn: String): Unit =
    Apply.ctasCommit(spark, dir, stagedIn, tableSchema, keyCol, nBuckets)
}

/** ATOMIC `REPLACE TABLE … AS SELECT` / `CREATE OR REPLACE TABLE`
  * (round 16, verdict r15 #1): the same staged-write discipline as the
  * CTAS above — the replacing query's rows land under the table's own
  * `_staging/replace-<uuid>/` while every reader keeps seeing the OLD
  * table; the commit is [[Apply.replaceCommit]]'s declaration-reset
  * overwrite fold (stored keys absent from the query → REMOVEs at
  * stored versions, query rows → MODIFYs, new declaration archived at
  * the fold's commit), so a reader racing the statement sees either
  * the old state or the fully-replaced one — never empty or partial.
  * A failed or aborted replace deletes the staging dir and leaves the
  * table byte-identical. Strict REPLACE on a missing table surfaces
  * Spark's `CannotReplaceMissingTableException` (typed at the verb,
  * translated here where the Identifier lives). */
private[sources] final class GraftStagedReplaceTable(
    spark: SparkSession, dir: String, tableSchema: StructType,
    keyCol: String, nBuckets: Int, orCreate: Boolean,
    ident: org.apache.spark.sql.connector.catalog.Identifier)
  extends GraftStagedWriteTable(spark, dir, tableSchema, "replace") {
  override protected def commitStaged(stagedIn: String): Unit =
    try Apply.replaceCommit(spark, dir, stagedIn, tableSchema, keyCol,
      nBuckets, orCreate)
    catch {
      case _: graft.cdc.MergeTableMissingException =>
        throw new org.apache.spark.sql.catalyst.analysis
          .CannotReplaceMissingTableException(ident)
    }
}
