package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Size sweep for the iterative graph operators (the AbProbe/StressProbe
  * pattern): deterministic ring-lattice communities with single bridge
  * edges, at |V| ∈ {10k, 100k, 1M} — no RNG, so every run times the same
  * graph. Pins by data that per-round cost is linear in E (labels/ranks
  * shuffle, edges never re-shuffle) and that rounds do not grow with
  * size. Results are committed as a table in SURVEY §8.21.
  *
  * Structure: communities of m=100 vertices; inside a community, vertex
  * v links to v+1 and v+2 (ring-lattice degree ≈4, E ≈ 2V); each
  * community's last vertex bridges to the next community's first, so
  * the whole graph is ONE component (stars must return 1). LPA's label
  * count here is Θ(V): labels move at most one hop per synchronous
  * round, so a sparse ring lattice stays fragmented after 3 rounds —
  * the known LPA regime; what this probe times is the per-round COST
  * curve, while the dense-community semantics are GraphSpec's clique
  * tests.
  *
  * Components deliberately runs the SMALL/LARGE-STAR variant: the
  * bridge chain gives this graph Θ(V) diameter, and min-label
  * propagation is diameter-bound — the first probe run pinned that the
  * chain stalls `Dedup.components` (thousands of rounds) while
  * `componentsStars` closes it in O(log V) rounds. That contrast IS the
  * scale lesson: ledger corpora (near-clique components) suit
  * min-label; long-chain graphs need the stars algorithm the repo
  * provides for exactly this regime.
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val m = 100L
    println(f"${"V"}%9s ${"E"}%9s ${"algo"}%8s ${"out"}%9s ${"sec"}%7s")
    for (v <- Seq(10000L, 100000L, 1000000L)) {
      val ids = spark.range(v).toDF("u")
      def intra(k: Long) = ids
        .filter(col("u") % m < m - k) // stay inside the community
        .select(col("u"), (col("u") + k).as("v"))
      val bridges = ids.filter(col("u") % m === m - 1 && col("u") + 1 < v)
        .select(col("u"), (col("u") + 1).as("v"))
      val edges = intra(1).unionByName(intra(2)).unionByName(bridges)
        .localCheckpoint(true)
      val e = edges.count()
      def run(algo: String)(out: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = out
        println(f"$v%9d $e%9d $algo%8s $n%9d ${(System.nanoTime() - t0) / 1e9}%7.1f")
      }
      run("lpa") {
        graft.warehouse.GraphQueries.labelPropagation(edges)
          .select(col("community")).distinct().count()
      }
      run("stars") {
        graft.dedup.Dedup.componentsStars(edges, col("u"), col("v"))
          .select(col("comp")).distinct().count()
      }
      run("assort") {
        graft.warehouse.GraphQueries.degreeAssortativity(edges).count()
      }
    }
    spark.stop()
  }
}
