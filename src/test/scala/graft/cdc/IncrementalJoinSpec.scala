package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class IncrementalJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def aDf(rows: (String, Long)*): DataFrame =
    rows.toDF("k", "av")
  private def chg(rows: (String, Long, String)*): DataFrame =
    rows.toDF("k", "v", "_change_type")

  /** From-scratch multiplicity join of two live bags — the invariant. */
  private def recompute(a: Seq[(String, Long)], b: Seq[(String, Long)]) = {
    val am = a.groupBy(identity).view.mapValues(_.size.toLong)
    val bm = b.groupBy(identity).view.mapValues(_.size.toLong)
    (for {
      ((ka, av), ma) <- am.toSeq
      ((kb, bv), mb) <- bm.toSeq if ka == kb
    } yield (ka, av, bv, ma * mb)).toSet
  }

  private def collectJoined(st: IncrementalJoin.State) =
    st.joined.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("incremental join maintenance equals from-scratch recompute across commits with deletes and updates") {
    // seed: duplicate (key, value) rows exercise multiplicities > 1
    var liveA = Seq(("k1", 10L), ("k1", 10L), ("k2", 20L), ("k3", 30L))
    var liveB = Seq(("k1", 100L), ("k2", 200L), ("k2", 201L))
    var st = IncrementalJoin.seed(
      aDf(liveA: _*), col("k"), col("av"),
      aDf(liveB: _*), col("k"), col("av"), // bag() renames per side
    )
    assert(collectJoined(st) == recompute(liveA, liveB))

    // commit 2: insert on A (new key + another k1 dup), delete one B row
    val a2 = chg(("k4", 40L, "insert"), ("k1", 10L, "insert"))
    val b2 = chg(("k2", 201L, "delete"))
    liveA = liveA ++ Seq(("k4", 40L), ("k1", 10L))
    liveB = liveB.diff(Seq(("k2", 201L)))
    st = IncrementalJoin.applyDelta(st, a2, b2,
      col("k"), col("v"), col("k"), col("v"))
    assert(collectJoined(st) == recompute(liveA, liveB))

    // commit 3: an UPDATE on B (delete+insert pair), matching insert on
    // A's same key in the SAME window — exercises the ΔA ⋈ ΔB corner
    val a3 = chg(("k2", 21L, "insert"))
    val b3 = chg(("k2", 200L, "delete"), ("k2", 202L, "insert"))
    liveA = liveA :+ (("k2", 21L))
    liveB = liveB.diff(Seq(("k2", 200L))) :+ (("k2", 202L))
    st = IncrementalJoin.applyDelta(st, a3, b3,
      col("k"), col("v"), col("k"), col("v"))
    assert(collectJoined(st) == recompute(liveA, liveB))

    // commit 4: delete ALL of k1 on A — k1 rows must vanish from the view
    val a4 = chg(("k1", 10L, "delete"), ("k1", 10L, "delete"),
      ("k1", 10L, "delete"))
    liveA = liveA.filterNot(_._1 == "k1")
    st = IncrementalJoin.applyDelta(st, a4, chg(),
      col("k"), col("v"), col("k"), col("v"))
    assert(collectJoined(st) == recompute(liveA, liveB))
    assert(!collectJoined(st).exists(_._1 == "k1"))
    // and the state stays tight: no zero-multiplicity residue
    assert(st.a.filter(col("m") <= 0).isEmpty &&
      st.joined.filter(col("m") <= 0).isEmpty)
  }
}
