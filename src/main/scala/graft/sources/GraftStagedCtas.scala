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
private[sources] final class GraftStagedCtasTable(
    spark: SparkSession, dir: String, tableSchema: StructType,
    keyCol: String, nBuckets: Int)
  extends StagedTable with SupportsWrite {

  private val stage =
    s"$dir/${Apply.StagingDirName}/ctas-${UUID.randomUUID}"

  override def name(): String = s"graft:ctas-staged:$dir"
  override def schema(): StructType = tableSchema
  override def partitioning(): Array[Transform] = Array.empty
  override def properties(): JMap[String, String] =
    java.util.Collections.emptyMap()

  override def capabilities(): JSet[TableCapability] =
    Set(TableCapability.V1_BATCH_WRITE).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
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

  override def commitStagedChanges(): Unit = {
    val hc = graft.util.Hfs.conf(spark)
    try Apply.ctasCommit(spark, dir, s"$stage/in", tableSchema,
      keyCol, nBuckets)
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
