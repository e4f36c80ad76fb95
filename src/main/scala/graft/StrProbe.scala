package graft
// scratch probe (removed before round close)
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object StrProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    def build() = {
      val e = graft.util.Tables.embeddings(spark, sf).filter(col("vec_id") =!= 0)
      graft.dedup.Dedup.lshNearDups(e, col("vec_id"), col("embedding"),
        nBands = 4, planesPerBand = 4, dim = 64, threshold = 0.25)
    }
    def phase(tag: String): Unit = {
      val qe = build().queryExecution
      var t0 = System.nanoTime(); qe.analyzed
      val ta = (System.nanoTime()-t0)/1e6
      t0 = System.nanoTime(); qe.optimizedPlan
      val to = (System.nanoTime()-t0)/1e6
      t0 = System.nanoTime(); qe.sparkPlan
      val tp = (System.nanoTime()-t0)/1e6
      t0 = System.nanoTime(); qe.executedPlan
      val te = (System.nanoTime()-t0)/1e6
      t0 = System.nanoTime()
      qe.explainString(org.apache.spark.sql.execution.FormattedMode)
      val ts = (System.nanoTime()-t0)/1e6
      println(f"PROBE $tag%-28s analyze=$ta%7.1f opt=$to%7.1f plan=$tp%6.1f exec=$te%6.1f explain=$ts%7.1f ms")
    }
    phase("warm-1")
    phase("warm-2")
    phase("warm-3")
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    phase("noconstraint-1")
    phase("noconstraint-2")
    spark.conf.set("spark.sql.constraintPropagation.enabled", "true")
    phase("back-on")
    spark.stop()
  }
}
