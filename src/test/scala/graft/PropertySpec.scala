package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core._
import graft.functions.TopKAggregator
import graft.pipeline.Dedup

/** Property-based invariants for the pure cores: pixel codec
  * round-trips, log escaping, top-k aggregation vs a naive sort,
  * minhash monotonicity. Uses raw ScalaCheck generators with seeded
  * sampling (the scalatest bridge artifact isn't a declared dep). */
class PropertySpec extends AnyFunSuite with Matchers {

  private def check[A](gen: Gen[A], n: Int = 60)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  test("pixel codec round-trips in-range values for every integer type") {
    val cases = Seq(
      PixelCodec.Byte8 -> Gen.choose(0, 255),
      PixelCodec.Short16 -> Gen.choose(0, 65535),
      PixelCodec.Int32 -> Gen.choose(Int.MinValue, Int.MaxValue))
    cases.foreach { case (t, gen) =>
      check(Gen.listOfN(64, gen)) { vs =>
        val doubles = vs.map(_.toDouble).toArray
        PixelCodec.decode(PixelCodec.encode(doubles, t), t, doubles.length) shouldBe doubles
      }
    }
  }

  test("pixel codec round-trips arbitrary doubles for float64") {
    check(Gen.listOfN(64, Gen.chooseNum(-1e12, 1e12))) { vs =>
      val a = vs.toArray
      PixelCodec.decode(PixelCodec.encode(a, PixelCodec.Double64),
        PixelCodec.Double64, a.length) shouldBe a
    }
  }

  test("log escaping round-trips arbitrary strings through parseOps") {
    check(Gen.zip(Gen.asciiStr, Gen.asciiStr)) { case (opval, opargs) =>
      val log = ImageLog.append(ImageLog.empty, LogEntry("RUN", "SPARK", opval, opargs))
      val parsed = ImageLog.parseOps(log)
      parsed should have size 1
      parsed.head shouldBe (("RUN", opval, opargs))
    }
  }

  test("TopKAggregator equals sort-take for any input, at any merge split") {
    val agg = new TopKAggregator(5)
    val pairGen = Gen.listOf(Gen.zip(Gen.chooseNum(-1.0, 1.0), Gen.chooseNum(0L, 50L)))
    check(Gen.zip(pairGen, Gen.chooseNum(0, 10))) { case (xs, splitAt) =>
      val distinct = xs.distinctBy(_._2) // ids unique like vec_ids
      val expected = distinct.sortBy { case (s, id) => (-s, id) }.take(5)
      distinct.foldLeft(agg.zero)(agg.reduce) shouldBe expected
      val (l, r) = distinct.splitAt(math.min(splitAt, distinct.length))
      agg.merge(l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce)) shouldBe expected
    }
  }

  test("minhash signatures: order-invariant; supersets only lower slots") {
    check(Gen.nonEmptyListOf(Gen.alphaStr.suchThat(_.nonEmpty))) { words =>
      val sig = Dedup.minhashSignature(words, 16)
      Dedup.minhashSignature(words.reverse, 16) shouldBe sig
      val bigger = Dedup.minhashSignature(words :+ "extra-shingle-xyz", 16)
      bigger.zip(sig).foreach { case (b, s) => b should be <= s }
    }
  }

  test("histogram counts always sum to the pixel count") {
    check(Gen.zip(Gen.listOfN(100, Gen.chooseNum(-50.0, 50.0)), Gen.chooseNum(1, 20))) {
      case (vs, bins) =>
        val img = SparkImage(ImageMeta(), "[]", 10, 10, 1, PixelCodec.Double64,
          PixelCodec.encode(vs.toArray, PixelCodec.Double64))
        Kernels.histogram(img, -10.0, 10.0, bins).counts.sum shouldBe 100L
    }
  }

  test("cdc chunks: every chunk list reassembles the token stream; insertion keeps the tail") {
    import graft.pipeline.TextFunctions
    val tokGen = Gen.listOfN(40, Gen.oneOf((1 to 25).map(i => s"w$i")))
    check(tokGen) { toks =>
      // the chunking is a PARTITION: joining chunks back with spaces
      // (chunks are themselves space-joined) reproduces the stream's
      // join — verified via hashes of a reference re-partition
      val mask = 15L
      val boundaries = toks.map(t => (Dedup.mix64(Dedup.fnv64(t)) & mask) == 0L)
      val ref = scala.collection.mutable.ArrayBuffer.empty[List[String]]
      var cur = List.empty[String]
      toks.zip(boundaries).foreach { case (t, b) =>
        cur = cur :+ t
        if (b) { ref += cur; cur = Nil }
      }
      if (cur.nonEmpty) ref += cur
      val expected = ref.map(c => Dedup.fnv64(c.mkString(" "))).toSeq
      TextFunctions.cdcChunkHashes(toks, maskBits = 4) shouldBe expected
      // prefix insertion never changes chunks after the first boundary
      val shifted = TextFunctions.cdcChunkHashes("inserted" +: toks, maskBits = 4)
      if (expected.size > 1)
        shifted.takeRight(expected.size - 1) shouldBe expected.takeRight(expected.size - 1)
    }
  }

  test("jaccard prefix length is always a safe prefix (integer ceil never under-allocates)") {
    // p = sz − ceil(t·sz) + 1 must satisfy: suffix size (sz − p) < t·sz
    // exactly — i.e. any |A∩B| ≥ t·|A| intersects the prefix
    check(Gen.zip(Gen.chooseNum(1, 5000), Gen.chooseNum(1, 9999))) { case (sz, num) =>
      val den = 10000L
      val p = sz - (sz * num + (den - 1)) / den + 1
      val suffix = sz - p
      // suffix < t·sz  ⟺  suffix·den < sz·num
      (suffix * den) should be < (sz.toLong * num)
      p should be >= 1L
      p.toInt should be <= sz
    }
  }

  test("int8 quantization: codes within [-127, 127], dequantized error below one step") {
    check(Gen.listOfN(16, Gen.chooseNum(-10.0, 10.0).suchThat(v => !v.isNaN))) { vsList =>
      val vs = vsList.toArray
      val maxabs = vs.map(math.abs).max
      val sc = if (maxabs > 0) maxabs else 1.0
      vs.foreach { v =>
        val q = math.floor(v * 127.0 / sc).toLong
        q should be >= -128L
        q should be <= 127L
        math.abs(v - q * sc / 127.0) should be <= (sc / 127.0) + 1e-12
      }
    }
  }
}
