package graft.props

import org.scalacheck.{Gen, Prop, Properties}

import graft.ann.Similarity.quantCode

/** Properties of the pure scalar-quantization kernel (the formula
  * q100's column expression compiles) — no Spark job involved, so these
  * run at full ScalaCheck sample counts.
  */
object QuantProps extends Properties("quantization") {

  private val range = for {
    mn <- Gen.chooseNum(-1e6, 1e6)
    w <- Gen.chooseNum(1e-3, 1e6)
  } yield (mn, mn + w)

  private val pointInRange = for {
    (mn, mx) <- range
    f <- Gen.chooseNum(0.0, 1.0)
  } yield (mn + f * (mx - mn), mn, mx)

  property("codes stay in 0..254 on the trained range") =
    Prop.forAll(pointInRange) { case (x, mn, mx) =>
      val c = quantCode(x, mn, mx)
      c >= 0L && c <= 254L
    }

  property("quantization is monotone") =
    Prop.forAll(for {
      (mn, mx) <- range
      f1 <- Gen.chooseNum(0.0, 1.0)
      f2 <- Gen.chooseNum(0.0, 1.0)
    } yield (mn, mx, mn + math.min(f1, f2) * (mx - mn),
      mn + math.max(f1, f2) * (mx - mn))) { case (mn, mx, lo, hi) =>
      quantCode(lo, mn, mx) <= quantCode(hi, mn, mx)
    }

  property("endpoints map to 0 and 254; constant dims to 0") =
    Prop.forAll(range) { case (mn, mx) =>
      quantCode(mn, mn, mx) == 0L && quantCode(mx, mn, mx) == 254L &&
        quantCode(mn, mn, mn) == 0L
    }

  property("reconstruction error is within half a code step") =
    Prop.forAll(pointInRange) { case (x, mn, mx) =>
      val step = (mx - mn) / 254.0
      val rebuilt = mn + quantCode(x, mn, mx) * step
      math.abs(rebuilt - x) <= step * 0.5 + 1e-9 * (mx - mn)
    }
}
