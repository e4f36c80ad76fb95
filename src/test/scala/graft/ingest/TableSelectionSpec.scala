package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.util.TableSelection

class TableSelectionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("P5: % matches everything, like the reference's schema=% rule") {
    assert(TableSelection.selectNames(Seq("%")) == TableSelection.catalog)
  }

  test("P5: prefix/suffix/underscore wildcards") {
    assert(TableSelection.selectNames(Seq("e%")) == Seq("events", "embeddings"))
    assert(TableSelection.selectNames(Seq("%ion")) == Seq("region", "nation"))
    assert(TableSelection.selectNames(Seq("_art")) == Seq("part"))
    assert(TableSelection.selectNames(Seq("part", "orders")) == Seq("part", "orders"))
  }

  test("P5: excludes subtract from includes") {
    assert(TableSelection.selectNames(Seq("%"), excludes = Seq("e%", "%ion")) ==
      Seq("customer", "supplier", "part", "orders", "lineitem", "documents"))
  }

  test("P5: literal regex metacharacters don't escape the pattern") {
    assert(TableSelection.selectNames(Seq("part.*")).isEmpty) // '.' is literal
    assert(TableSelection.selectNames(Seq("p(art")).isEmpty)
  }

  test("P5: selected tables load and read") {
    val sel = TableSelection.select(spark, sf, Seq("nation", "events"))
    assert(sel.keySet == Set("nation", "events"))
    assert(sel("nation").count() == 25)
    assert(sel("events").columns.contains("ts"))
  }
}
