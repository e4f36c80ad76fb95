package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale utilities (SURVEY.md §4, builder contract "Partitioning &
  * shuffle"): bucketed co-located joins and skew salting.
  *
  * These are the levers that keep the 100 TB plan healthy:
  *  - bucketing pre-shuffles both join sides once at write time, so every
  *    subsequent join/aggregation on the bucket key runs exchange-free;
  *  - salting spreads one hot key over `salts` sub-partitions, trading a
  *    bounded replication of the other side for the death of the
  *    quadratic straggler task (AQE's skew-join split handles moderate
  *    skew automatically; salting is the explicit tool for extreme keys).
  */
object Scale {

  /** Write `df` as a bucketed, bucket-sorted table. Joins and groupBys on
    * `key` between tables bucketed the same way need no Exchange. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode(SaveMode.Overwrite)
      .saveAsTable(table)

  /** Deterministic salted inner equi-join: the skewed side gets a salt
    * derived from its whole row (no RNG — reruns give identical plans);
    * the other side is replicated `salts` ways. Correct for any key
    * distribution; worth it when one key dominates a partition. */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String, salts: Int): DataFrame = {
    val saltedL = skewed.withColumn("_salt",
      pmod(hash(struct(skewed.columns.map(col).toIndexedSeq: _*)), lit(salts)))
    val saltedR = other.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedL.join(saltedR, Seq(key, "_salt")).drop("_salt")
  }
}
