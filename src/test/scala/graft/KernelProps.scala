package graft

import graft.functions.{DotProduct, PolyHash}
import graft.sources.{LandingLog, WatermarkStore}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based checks for the pure kernels (no Spark session — these
  * run the static functions the codegen'd expressions call). */
object KernelProps extends Properties("graft.kernels") {

  property("polyHash stays in [0, P) and matches the reference fold") =
    forAll { (s: String) =>
      val h = PolyHash.hash(UTF8String.fromString(s))
      var want = 7L
      s.codePoints().forEach(cp => want = (want * 31 + cp) % PolyHash.P)
      h >= 0 && h < PolyHash.P && h == want
    }

  property("polyHash satisfies the append recurrence h(s+c) = (h(s)*31 + c) mod P") =
    forAll(Gen.asciiPrintableStr, Gen.asciiPrintableChar) { (s, c) =>
      val base = PolyHash.hash(UTF8String.fromString(s))
      val appended = PolyHash.hash(UTF8String.fromString(s + c))
      appended == (base * 31 + c.toInt) % PolyHash.P
    }

  private val floatArr = Gen.listOfN(16, Gen.chooseNum(-100f, 100f)).map(_.toArray)
  private val doubleArr = Gen.listOfN(16, Gen.chooseNum(-100.0, 100.0)).map(_.toArray)

  property("dot kernel equals plain-scala fold") =
    forAll(floatArr, floatArr) { (a, b) =>
      val got = DotProduct.dot(
        new GenericArrayData(a.map(x => x: Any)), false,
        new GenericArrayData(b.map(x => x: Any)), false)
      var want = 0.0
      var i = 0
      while (i < a.length) { want += a(i).toDouble * b(i).toDouble; i += 1 }
      java.lang.Double.doubleToLongBits(got) == java.lang.Double.doubleToLongBits(want)
    }

  property("dot kernel equals the fold with mixed float/double element widths") =
    forAll(floatArr, doubleArr) { (a, b) =>
      val got = DotProduct.dot(
        new GenericArrayData(a.map(x => x: Any)), false,
        new GenericArrayData(b.map(x => x: Any)), true)
      var want = 0.0
      var i = 0
      while (i < a.length) { want += a(i).toDouble * b(i); i += 1 }
      java.lang.Double.doubleToLongBits(got) == java.lang.Double.doubleToLongBits(want)
    }

  property("dot kernel returns null on length mismatch") =
    forAll(floatArr) { a =>
      DotProduct.dot(
        new GenericArrayData(a.map(x => x: Any)), false,
        new GenericArrayData((a ++ Array(1f)).map(x => x: Any)), false) == null
    }

  private val codesArr = Gen.listOfN(16,
    Gen.frequency(8 -> Gen.chooseNum(0L, 255L), 1 -> Gen.const(0L), 1 -> Gen.const(255L)))
    .map(_.toArray)
  private val statArr = Gen.listOfN(16,
    Gen.zip(Gen.chooseNum(-10.0, 10.0),
      Gen.frequency(6 -> Gen.chooseNum(0.001, 20.0), 1 -> Gen.const(0.0))))
    .map(_.toArray)

  property("dist2 kernel equals the HOF-order squared-difference fold, mixed element types") =
    forAll(floatArr, doubleArr) { (a, b) =>
      val got = graft.functions.Dist2.dist2(
        new GenericArrayData(a.map(x => x: Any)), false,
        new GenericArrayData(b.map(x => x: Any)), true)
      var want = 0.0
      var i = 0
      while (i < a.length) {
        val d0 = a(i).toDouble - b(i); want += d0 * d0; i += 1
      }
      java.lang.Double.doubleToLongBits(got) == java.lang.Double.doubleToLongBits(want)
    }

  // Variable length INCLUDING empty — an empty embedding folds to 0.0
  // per plane and 0.0 >= 0 sets every bit (the pinned HOF edge case).
  private val lshArr = Gen.choose(0, 32)
    .flatMap(n => Gen.listOfN(n, Gen.chooseNum(-100f, 100f))).map(_.toArray)

  property("lsh-code kernel equals the per-plane HOF projection folds") =
    forAll(lshArr) { a =>
      val got = graft.functions.LshCode.code(
        new GenericArrayData(a.map(x => x: Any)), false)
      // Replica of the HOF form: per plane, a strict left-to-right fold
      // of element::DOUBLE × LCG-weight::DOUBLE, then the sign-bit sum.
      var want = 0L
      var j = 0
      while (j < graft.functions.TextSim.lshPlanes) {
        var acc = 0.0
        var i = 0
        while (i < a.length) {
          val w = ((1103515245L * (j * 64 + i) + 12345L) % 2001L) - 1000L
          acc += a(i).toDouble * w.toDouble
          i += 1
        }
        if (acc >= 0) want += (1L << j)
        j += 1
      }
      got == want
    }

  property("inter-count kernel equals the built-in intersect size on sorted distinct arrays") =
    forAll(Gen.listOf(Gen.chooseNum(0L, 60L)), Gen.listOf(Gen.chooseNum(0L, 60L))) { (a0, b0) =>
      val a = a0.distinct.sorted.toArray
      val b = b0.distinct.sorted.toArray
      val got = graft.functions.InterCount.count(
        new GenericArrayData(a.map(x => x: Any)),
        new GenericArrayData(b.map(x => x: Any)))
      got == a.toSet.intersect(b.toSet).size.toLong
    }

  property("sq8 dot kernel equals the HOF-order dequantize-then-dot fold") =
    forAll(floatArr, codesArr, statArr) { (q, c, st) =>
      val mns = st.map(_._1); val spans = st.map(_._2)
      val got = graft.functions.Sq8.dot(
        new GenericArrayData(q.map(x => x: Any)), false,
        new GenericArrayData(c.map(x => x: Any)),
        new GenericArrayData(mns.map(x => x: Any)),
        new GenericArrayData(spans.map(x => x: Any)))
      var want = 0.0
      var i = 0
      while (i < q.length) {
        want += q(i).toDouble * (mns(i) + c(i).toDouble / 255.0 * spans(i)); i += 1
      }
      java.lang.Double.doubleToLongBits(got) == java.lang.Double.doubleToLongBits(want)
    }

  property("sq8 dot kernel accepts a double-width query, same fold") =
    forAll(doubleArr, codesArr, statArr) { (q, c, st) =>
      val mns = st.map(_._1); val spans = st.map(_._2)
      val got = graft.functions.Sq8.dot(
        new GenericArrayData(q.map(x => x: Any)), true,
        new GenericArrayData(c.map(x => x: Any)),
        new GenericArrayData(mns.map(x => x: Any)),
        new GenericArrayData(spans.map(x => x: Any)))
      var want = 0.0
      var i = 0
      while (i < q.length) {
        want += q(i) * (mns(i) + c(i).toDouble / 255.0 * spans(i)); i += 1
      }
      java.lang.Double.doubleToLongBits(got) == java.lang.Double.doubleToLongBits(want)
    }

  property("sq8 norm2 kernel equals the HOF-order dequantized self-dot") =
    forAll(codesArr, statArr) { (c, st) =>
      val mns = st.map(_._1); val spans = st.map(_._2)
      val got = graft.functions.Sq8.norm2(
        new GenericArrayData(c.map(x => x: Any)),
        new GenericArrayData(mns.map(x => x: Any)),
        new GenericArrayData(spans.map(x => x: Any)))
      var want = 0.0
      var i = 0
      while (i < c.length) {
        val dq = mns(i) + c(i).toDouble / 255.0 * spans(i); want += dq * dq; i += 1
      }
      java.lang.Double.doubleToLongBits(got) == java.lang.Double.doubleToLongBits(want)
    }

  private val tsGen: Gen[String] = for {
    y <- Gen.chooseNum(2020, 2030); mo <- Gen.chooseNum(1, 12); d <- Gen.chooseNum(1, 28)
    h <- Gen.chooseNum(0, 23); mi <- Gen.chooseNum(0, 59); s <- Gen.chooseNum(0, 59)
  } yield f"$y%04d-$mo%02d-$d%02d $h%02d:$mi%02d:$s%02d.000"

  property("landing fileKey substitution preserves lexicographic order") =
    forAll(tsGen, tsGen) { (a, b) =>
      val (fa, fb) = (LandingLog.fileKey(a), LandingLog.fileKey(b))
      Prop.propBoolean((a.compareTo(b)).signum == (fa.compareTo(fb)).signum)
    }

  property("watermark store round-trips arbitrary table maps") =
    forAll(Gen.mapOf(Gen.zip(Gen.identifier.suchThat(_.nonEmpty), tsGen))) { m =>
      val f = java.nio.file.Files.createTempFile("wm", ".json")
      try {
        val store = new WatermarkStore(f.toString)
        store.update(m)
        store.read() == m
      } finally java.nio.file.Files.deleteIfExists(f)
    }

  property("MiniJson round-trips ARBITRARY unicode keys and values exactly") =
    forAll(Gen.mapOf(Gen.zip(
      Gen.stringOf(Gen.choose[Char](0, 0xFFFF)).suchThat(_.nonEmpty),
      Gen.stringOf(Gen.choose[Char](0, 0xFFFF))))) { m =>
      graft.sources.MiniJson.parseFlat(graft.sources.MiniJson.renderFlat(m)) == m
    }
}
