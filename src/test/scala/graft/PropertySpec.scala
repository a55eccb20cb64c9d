package graft

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core.PixelCodec
import graft.streaming.EventStreams

/** Property-based checks for the pure deterministic cores — the
  * invariants the oracle gate relies on, exercised over generated
  * inputs instead of fixtures. Raw ScalaCheck (`Test.check`) rather
  * than the scalatest bridge, which is not a declared dependency.
  */
class PropertySpec extends AnyFunSuite with Matchers {

  private def check(name: String, p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), p)
    withClue(s"$name: $res\n") { res.passed shouldBe true }
  }

  test("pixel codecs round-trip every integral value in range") {
    val cases = Seq(
      PixelCodec.Bool -> Gen.choose(0, 1),
      PixelCodec.Byte8 -> Gen.choose(0, 255),
      PixelCodec.Short16 -> Gen.choose(0, 65535),
      PixelCodec.Int32 -> Gen.choose(Int.MinValue, Int.MaxValue),
      PixelCodec.Float32 -> Gen.choose(-(1 << 24), 1 << 24), // exact in f32
      PixelCodec.Double64 -> Gen.choose(Int.MinValue, Int.MaxValue),
      PixelCodec.Long64 -> Gen.choose(Int.MinValue, Int.MaxValue))
    cases.foreach { case (tpe, genV) =>
      check(s"codec $tpe", Prop.forAll(Gen.listOf(genV.map(_.toDouble))) { vs =>
        val px = vs.toArray
        PixelCodec.decode(PixelCodec.encode(px, tpe), tpe, px.length).sameElements(px)
      })
    }
  }

  test("Misra–Gries guarantee holds under any reduce/merge split tree") {
    val genStream = Gen.listOf(Gen.choose(0, 9).map(i => s"t$i"))
    val genK = Gen.choose(2, 8)
    val genSeed = Gen.choose(0L, Long.MaxValue)
    check("mg-guarantee", Prop.forAll(genStream, genK, genSeed) { (toks, k, seed) =>
      val agg = new graft.functions.MisraGriesAggregator(k)
      // random split tree: partition the stream into chunks, reduce
      // each, then merge left-to-right (what Spark's partial/final
      // aggregation does under arbitrary partitioning)
      val rng = new scala.util.Random(seed)
      val chunks = if (toks.isEmpty) Seq(Seq.empty[String])
        else toks.grouped(math.max(1, rng.nextInt(toks.length) + 1)).toSeq
      val merged = chunks.map(c => c.foldLeft(agg.zero)(agg.reduce))
        .reduce(agg.merge)
      val out = agg.finish(merged).toSet
      val n = toks.length
      val exact = toks.groupBy(identity).view.mapValues(_.length)
      exact.forall { case (t, c) => c * (k + 1) <= n || out.contains(t) }
    })
  }

  test("event-time session merge: order-invariant, gap-separated, counts preserved") {
    val genEvents = Gen.listOf(Gen.zip(Gen.choose(0L, 5000L), Gen.const(1.0)))
    val genGap = Gen.choose(1L, 1000L)
    val genSeed = Gen.choose(0L, Long.MaxValue)
    check("session-merge", Prop.forAll(genEvents, genGap, genSeed) { (evs, gap, seed) =>
      val rng = new scala.util.Random(seed)
      val oneShot = EventStreams.mergeSessions(Nil, 1L, evs, gap)
      // arbitrary batch split + per-batch shuffle must produce the
      // same open-session state
      val (b1, b2) = rng.shuffle(evs).splitAt(if (evs.isEmpty) 0 else rng.nextInt(evs.length))
      val twoStep = EventStreams.mergeSessions(
        EventStreams.mergeSessions(Nil, 1L, b1, gap), 1L, b2, gap)
      val sameState = twoStep == oneShot
      val gapSeparated = oneShot.sliding(2).forall {
        case Seq(a, b) => b.start_ms > a.last_ms + gap
        case _ => true
      }
      val countsOk = oneShot.map(_.n_events).sum == evs.length
      val boundsOk = oneShot.forall(s => s.start_ms <= s.last_ms)
      sameState && gapSeparated && countsOk && boundsOk
    })
  }

  test("top-k aggregator equals sorted take-k under any split tree") {
    val genXs = Gen.listOf(Gen.zip(Gen.choose(-100, 100).map(_ / 7.0), Gen.choose(0L, 50L)))
    val genK = Gen.choose(1, 8)
    val genSeed = Gen.choose(0L, Long.MaxValue)
    check("topk", Prop.forAll(genXs, genK, genSeed) { (xs, k, seed) =>
      val agg = new graft.functions.TopKAggregator(k)
      val rng = new scala.util.Random(seed)
      val chunks = if (xs.isEmpty) Seq(Seq.empty[(Double, Long)])
        else rng.shuffle(xs).grouped(math.max(1, rng.nextInt(xs.length) + 1)).toSeq
      val got = agg.finish(chunks.map(c => c.foldLeft(agg.zero)(agg.reduce)).reduce(agg.merge))
      // multiset-aware reference: duplicates of the same (score, id)
      // pair are kept by the aggregator too
      val expected = xs.sortBy { case (s, id) => (-s, id) }.take(k)
      got == expected
    })
  }

  test("noise kernel: dyadic offsets bounded by ±(186/32)·σ, deterministic, content-seeded") {
    import graft.core.Kernels
    val genFill = Gen.choose(0, 5000).map(_.toDouble)
    val genDims = for {
      w <- Gen.choose(1, 24); h <- Gen.choose(1, 24)
    } yield (w, h)
    check("noise-bounds", Prop.forAll(genFill, genDims) { case (f, (w, h)) =>
      val img = Kernels.constantImage(w, h, 1, f, PixelCodec.Float32)
      val noisy = Kernels.run(img, "Add Noise")
      val px = noisy.toDoubles
      val bound = 186.0 / 32.0 * 25.0 // max |Irwin–Hall sum − 186| / 32 · σ
      val bounded = px.zip(img.toDoubles).forall { case (v, o) =>
        math.abs(v - o) <= bound &&
          (v * 32.0) == math.rint(v * 32.0) // dyadic: 5 fractional bits survive Float32
      }
      // deterministic per content; different fill → different seed path
      val again = Kernels.run(img, "Add Noise")
      bounded && java.util.Arrays.equals(noisy.data, again.data)
    })
  }

  test("gram aggregator: any split tree equals the direct double loop") {
    val genVecs = Gen.listOf(Gen.listOfN(4, Gen.choose(-64, 64).map(_ / 8.0f)))
    val genSeed = Gen.choose(0L, Long.MaxValue)
    check("gram", Prop.forAll(genVecs, genSeed) { (vs, seed) =>
      val agg = new graft.functions.GramAggregator(4)
      val rng = new scala.util.Random(seed)
      val chunks = if (vs.isEmpty) Seq(Seq.empty[List[Float]])
        else rng.shuffle(vs).grouped(math.max(1, rng.nextInt(vs.length) + 1)).toSeq
      val got = chunks.map(c => c.foldLeft(agg.zero)((b, v) => agg.reduce(b, v)))
        .reduce(agg.merge).toSeq
      val d = 4
      val expected = (for { i <- 0 until d; j <- i until d } yield
        vs.map(v => math.floor(v(i).toDouble * v(j).toDouble * 10000.0).toLong).sum).toSeq
      got == expected
    })
  }
}
