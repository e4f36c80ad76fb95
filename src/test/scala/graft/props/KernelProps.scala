package graft.props

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.{MoneyParseUtil, WinnowUtil}

/** Property-based checks over the pure expression kernels (SURVEY.md §5):
  * these run at full ScalaCheck sample counts because no Spark job is
  * involved — the kernels are exactly what the codegen'd expressions call.
  */
object KernelProps extends Properties("kernels") {

  private def fmt(cents: Long): String = {
    val sign = if (cents < 0) "-" else ""
    val abs = math.abs(cents)
    val units = abs / 100
    val frac = abs % 100
    // thousands separators + the reference's padding
    val grouped = units.toString.reverse.grouped(3).mkString(",").reverse
    s"  $sign$grouped.${"%02d".format(frac)} "
  }

  property("money parse roundtrips any cents value") =
    Prop.forAll(Gen.chooseNum(-999999999999L, 999999999999L)) { cents =>
      val parsed = MoneyParseUtil.parse(UTF8String.fromString(fmt(cents)))
      parsed != null &&
        parsed.toBigDecimal.bigDecimal.movePointRight(2).longValueExact() == cents
    }

  property("money parse: whitespace/comma placement is irrelevant") =
    Prop.forAll(Gen.chooseNum(0L, 99999999L)) { cents =>
      val plain = (BigDecimal(cents) / 100).setScale(2).toString
      val a = MoneyParseUtil.parse(UTF8String.fromString(plain))
      val b = MoneyParseUtil.parse(UTF8String.fromString(fmt(cents)))
      a == b
    }

  property("money parse: alpha garbage never throws, yields null") =
    Prop.forAll(Gen.alphaStr.suchThat(_.exists(_.isLetter))) { s =>
      MoneyParseUtil.parse(UTF8String.fromString(s)) == null
    }

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val sentence = Gen.listOfN(30, word).map(_.mkString(" "))

  property("winnow: deterministic on identical input") =
    Prop.forAll(sentence) { s =>
      val u = UTF8String.fromString(s)
      WinnowUtil.fingerprints(u, 16, 8).toLongArray.toSeq ==
        WinnowUtil.fingerprints(u, 16, 8).toLongArray.toSeq
    }

  property("winnow guarantee: a shared run >= k+w-1 shares a fingerprint") =
    Prop.forAll(sentence, sentence, sentence) { (prefix, shared0, suffix) =>
      // ensure the shared run is comfortably longer than k+w-1 = 23 bytes
      val shared = (shared0 + " padding tail to exceed the winnow guarantee window").take(80)
      val a = UTF8String.fromString(prefix + " " + shared)
      val b = UTF8String.fromString(shared + " " + suffix)
      val fa = WinnowUtil.fingerprints(a, 16, 8).toLongArray.toSet
      val fb = WinnowUtil.fingerprints(b, 16, 8).toLongArray.toSet
      fa.intersect(fb).nonEmpty
    }
}
