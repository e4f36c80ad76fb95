package graft

// Round-17 optimization probe (not part of the engine surface): decomposes
// the q285/q287 cascade substrate chain — the two most expensive paths in
// Verify at sf0.01 (83 s + 109 s, VERDICT r16 item 1) — into its stages so
// the optimization targets the measured cost, not the suspected one
// (guide §1.1). Each stage is timed on first build; memoized stages report
// ~0 on re-entry, which is itself informative (what share is shared).
// Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt "runMain graft.R17Probe"
import org.apache.spark.sql.SparkSession

object R17Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskTimeMs = 0L
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          jobs += 1
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages += 1
          tasks += e.stageInfo.numTasks
          taskTimeMs += e.stageInfo.taskMetrics.executorRunTime
        }
      })
    def time[T](name: String)(f: => T): T = {
      val (j0, s0, k0, t0m) = (jobs, stages, tasks, taskTimeMs)
      val t0 = System.nanoTime()
      val r = f
      val w = (System.nanoTime() - t0) / 1e9
      Thread.sleep(120) // listener settle (probe-only)
      println(f"PROBE $name%-44s $w%8.2f s  jobs=${jobs - j0}%4d " +
        f"stages=${stages - s0}%4d tasks=${tasks - k0}%5d " +
        f"task_s=${(taskTimeMs - t0m) / 1e3}%7.1f")
      r
    }
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val mergeDir = time("cascadeMergeDir (merge table: seed+refresh)") {
      s"${graft.ann.AnnQueries.cascadeMergeDir(spark, sfDir)}/table"
    }
    // sub-breakdown of semCascadeDir's two halves (separate temp dir so
    // the real memo still builds afresh below)
    if (args.contains("sem-detail")) {
      import org.apache.spark.sql.functions.col
      val e = graft.util.Tables.embeddings(spark, sfDir)
        .filter(col("vec_id") =!= 0)
      val base = java.nio.file.Files
        .createTempDirectory("r17semdetail").toString
      val dir = s"$base/ledger"
      time("  sem maintainBatch (seed fold)") {
        graft.dedup.SemLedgerStore.maintainBatch(
          e, col("vec_id"), col("embedding"), dir)
      }
      time("  sem followMergeTable (refresh window)") {
        val q = graft.dedup.SemLedgerStore.followMergeTable(spark, mergeDir,
          dir, s"$base/ck", embedOf = col("embedding"), sinceCommit = 1L)
        q.processAllAvailable(); q.stop()
      }
    }
    // direct upsertVecs (no streaming harness): same refresh window as
    // the follow, applied straight to a fresh seed — separates the
    // verb's cost from the feed/checkpoint machinery
    if (args.contains("sem-direct")) {
      import org.apache.spark.sql.functions.col
      val e = graft.util.Tables.embeddings(spark, sfDir)
        .filter(col("vec_id") =!= 0)
      val base = java.nio.file.Files
        .createTempDirectory("r17semdirect").toString
      val dir = s"$base/ledger"
      time("  semdirect maintainBatch (seed fold)") {
        graft.dedup.SemLedgerStore.maintainBatch(
          e, col("vec_id"), col("embedding"), dir)
      }
      val (updated, added, removes) = graft.ann.AnnQueries.refreshDelta(e)
      val ups = updated.select(col("vec_id").as("id"),
          col("embedding").as("v"))
        .unionByName(added.select(col("vec_id").as("id"),
          col("embedding").as("v")))
      val jobLog =
        new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, String)]()
      val starts =
        new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      val jl = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val site = e.stageInfos.lastOption.map(_.details.linesIterator
            .take(1).mkString).getOrElse("?")
          starts.put(e.jobId, (System.nanoTime(), site))
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val s = starts.remove(e.jobId)
          if (s != null)
            jobLog.add((e.jobId.toLong, System.nanoTime() - s._1, s._2))
        }
      }
      spark.sparkContext.addSparkListener(jl)
      time("  semdirect upsertVecs (refresh window)") {
        graft.dedup.SemLedgerStore.upsertVecs(ups, col("id"), col("v"),
          removes.select(col("vec_id").as("id")), dir, batchId = 0L)
      }
      spark.sparkContext.removeSparkListener(jl)
      import scala.jdk.CollectionConverters._
      val bysite = jobLog.asScala.toSeq.groupBy(_._3)
        .map { case (k, v) => (k, v.size, v.map(_._2).sum / 1e9) }
        .toSeq.sortBy(-_._3)
      bysite.take(30).foreach { case (k, n, s) =>
        println(f"JOBSITE ${k.take(70)}%-70s n=$n%4d  sum=$s%7.2f s")
      }
    }
    time("semCascadeDir (sem seed fold + follow)") {
      graft.ann.AnnQueries.semCascadeDir(spark, sfDir)
    }
    time("ivfCascadeDir (ivf build + follow)") {
      graft.ann.AnnQueries.ivfCascadeDir(spark, sfDir)
    }
    time("cascadeSetDir (q285 substrate)") {
      graft.ann.AnnQueries.cascadeSetDir(spark, sfDir)
    }
    // sub-breakdown of cascadeSetAllDir's phases (separate temp dir)
    if (args.contains("all-detail")) {
      import org.apache.spark.sql.functions.{col, explode}
      val e = graft.util.Tables.embeddings(spark, sfDir)
        .filter(col("vec_id") =!= 0)
      val base = java.nio.file.Files
        .createTempDirectory("r17alldetail").toString
      val hc = graft.util.Hfs.conf(spark)
      time("  all: copy sem + index dirs") {
        graft.util.Hfs.copyDir(
          new org.apache.hadoop.fs.Path(
            graft.ann.AnnQueries.semCascadeDir(spark, sfDir)),
          new org.apache.hadoop.fs.Path(s"$base/sem"), hc)
        graft.util.Hfs.copyDir(
          new org.apache.hadoop.fs.Path(
            graft.ann.AnnQueries.ivfCascadeDir(spark, sfDir)),
          new org.apache.hadoop.fs.Path(s"$base/index"), hc)
      }
      time("  all: seed ivfPq") {
        graft.ann.IndexStore.ivfPqMaintainBatch(e, col("vec_id"),
          col("embedding"), s"$base/pq", nCells = 8, m = 16, ksub = 64)
      }
      time("  all: seed text ledger") {
        graft.dedup.LedgerStore.maintainBatch(
          e.select(col("vec_id").as("doc_id"),
            graft.ann.AnnQueries.cascadeTextOf.as("text")),
          col("doc_id"), col("text"), s"$base/ledger")
      }
      time("  all: seed postings") {
        graft.text.PostingsStore.maintainBatch(
          e.select(col("vec_id").as("id"),
            graft.ann.AnnQueries.cascadeTextOf.as("text")),
          col("id"), col("text"), s"$base/postings")
      }
      time("  all: seed graph") {
        graft.warehouse.GraphStore.maintainBatch(
          e.select(col("vec_id").as("ord"),
            explode(graft.ann.AnnQueries.cascadeItemsOf).as("item")),
          col("ord"), col("item"), s"$base/graph")
      }
      time("  all: followMergeTableAll (6 folds)") {
        val q = graft.util.Cascade.followMergeTableAll(spark, mergeDir,
          s"$base/set", s"$base/ck", Seq(
            graft.util.Cascade.semFollower("sem", s"$base/sem",
              col("embedding")),
            graft.util.Cascade.ivfFollower("index", s"$base/index",
              col("embedding")),
            graft.util.Cascade.ivfPqFollower("pq", s"$base/pq",
              col("embedding")),
            graft.util.Cascade.ledgerFollower("ledger", s"$base/ledger",
              graft.ann.AnnQueries.cascadeTextOf),
            graft.util.Cascade.postingsFollower("postings",
              s"$base/postings", graft.ann.AnnQueries.cascadeTextOf),
            graft.util.Cascade.graphFollower("graph", s"$base/graph",
              graft.ann.AnnQueries.cascadeItemsOf)),
          sinceCommit = 1L)
        q.processAllAvailable(); q.stop()
      }
    }
    time("cascadeSetAllDir (q287 substrate)") {
      graft.ann.AnnQueries.cascadeSetAllDir(spark, sfDir)
    }
    time("q285 query (substrate memoized)") {
      SparkEntry.queries("q285_cascade_set")(spark, sfDir).count()
    }
    time("q287 query (substrate memoized)") {
      SparkEntry.queries("q287_cascade_set_all")(spark, sfDir).count()
    }
    spark.stop()
  }
}
