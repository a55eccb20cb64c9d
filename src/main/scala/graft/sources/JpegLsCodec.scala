package graft.sources

import java.io.ByteArrayOutputStream

/** JPEG-LS (ITU-T T.87 / ISO 14495-1) codec — lossless (NEAR = 0,
  * bit-exact round trips) AND near-lossless (NEAR > 0: residuals
  * quantize to 2·NEAR+1 bins with the HARD per-sample guarantee
  * |decoded − original| ≤ NEAR), 1..4 components, default preset
  * parameters, 2..16-bit precision.
  * This is the LOCO-I algorithm: gradient-quantized context modeling
  * with bias cancellation, limited-length Golomb coding of mapped
  * prediction residuals, and run mode with run-interruption sample
  * coding. The full baseline decode path is implemented (any
  * precision the frame header declares, both coding modes, the k=0
  * error-mapping special case), so third-party lossless streams
  * decode too. Multi-component streams decode in both plane form
  * (ILV=0: one scan per component, fresh modeling state per scan)
  * and line-interleaved form (ILV=1: lines round-robin across
  * components through ONE shared set of context counters — T.87
  * A.2.1). Sample interleave (ILV=2), non-default LSE presets,
  * subsampled components, and point transforms are rejected loudly,
  * never mis-decoded.
  *
  * Serves the DICOM JPEG-LS Lossless transfer syntax
  * (1.2.840.10008.1.2.4.80) in [[ImageCodecIO]] — the reference reads
  * this family through spark-scifio (reference pom.xml:60-64,
  * exercised by IjRDDTests.scala:30-99).
  *
  * Entropy-coded data uses the JPEG-LS marker-stuffing rule (T.87
  * A.1): after an 0xFF byte the next byte carries only SEVEN data
  * bits with its MSB forced to 0 — unlike classic JPEG's full 0x00
  * stuff byte.
  */
private[graft] object JpegLsCodec {

  /** T.87 A.2.1: run-length code order table. */
  private val J = Array(
    0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3,
    4, 4, 5, 5, 6, 6, 7, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  private val Reset = 64
  private val MinC = -128
  private val MaxC = 127

  /** Default preset thresholds (T.87 C.2.4.1.1.1), NEAR-dependent:
    * the CLAMP_i lower bounds chain NEAR+1 → T1 → T2 so gradients
    * inside the quantization dead zone can never cross a threshold. */
  private def defaultThresholds(maxval: Int, near: Int): (Int, Int, Int) = {
    def clamp(v: Int, lo: Int): Int =
      if (v > maxval || v < lo) lo else v
    if (maxval >= 128) {
      val f = (math.min(maxval, 4095) + 128) / 256
      val t1 = clamp(f * (3 - 2) + 2 + 3 * near, near + 1)
      val t2 = clamp(f * (7 - 3) + 3 + 5 * near, t1)
      (t1, t2, clamp(f * (21 - 4) + 4 + 7 * near, t2))
    } else {
      val f = 256 / (maxval + 1)
      val t1 = clamp(math.max(2, 3 / f + 3 * near), near + 1)
      val t2 = clamp(math.max(3, 7 / f + 5 * near), t1)
      (t1, t2, clamp(math.max(4, 21 / f + 7 * near), t2))
    }
  }

  /** Per-scan modeling state (shared by encoder and decoder — both
    * sides run the identical update recurrences, which is what makes
    * the code a bijection at NEAR = 0 and an error-bounded map at
    * NEAR > 0: every coded residual is quantized to a multiple of
    * 2·NEAR+1, so |decoded − original| ≤ NEAR per sample, EXACTLY). */
  private final class State(val precision: Int, val near: Int = 0) {
    val maxval: Int = (1 << precision) - 1
    require(near >= 0 && near <= math.min(255, maxval / 2),
      s"NEAR must be in [0, min(255, MAXVAL/2)], got $near at precision $precision")
    val range: Int =
      if (near == 0) maxval + 1 else (maxval + 2 * near) / (2 * near + 1) + 1
    val qbpp: Int = math.max(1, 32 - Integer.numberOfLeadingZeros(range - 1))
    val bpp: Int = math.max(2, precision)
    val limit: Int = 2 * (bpp + math.max(8, bpp))
    val (t1, t2, t3) = defaultThresholds(maxval, near)

    // regular contexts 0..364 (0 unused), run-interruption contexts 365/366
    val a = Array.fill(367)(math.max(2, (range + 32) / 64))
    val b = new Array[Int](365)
    val c = new Array[Int](365)
    val n = Array.fill(367)(1)
    val nn = new Array[Int](367) // negative-error counters, 365/366 used
    var runIndex = 0

    def quantize(d: Int): Int =
      if (d <= -t3) -4
      else if (d <= -t2) -3
      else if (d <= -t1) -2
      else if (d < -near) -1
      else if (d <= near) 0
      else if (d < t1) 1
      else if (d < t2) 2
      else if (d < t3) 3
      else 4

    /** A.4.4: quantize a prediction residual to its 2·NEAR+1 bin
      * (identity at NEAR = 0). */
    def quantizeErr(e: Int): Int =
      if (near == 0) e
      else if (e > 0) (e + near) / (2 * near + 1)
      else -((near - e) / (2 * near + 1))

    /** A.4.5/A.8.2: reconstruct from a (signed, dequantized) residual
      * with modulo wraparound, then clamp to the sample range. The
      * pre-clamp bound check preserves loud corruption detection —
      * a legal stream always lands in [-NEAR, MAXVAL+NEAR]. */
    def reconstruct(px: Int, signedQErr: Int, path: String): Int = {
      var rx = px + signedQErr * (2 * near + 1)
      if (rx < -near) rx += range * (2 * near + 1)
      else if (rx > maxval + near) rx -= range * (2 * near + 1)
      require(rx >= -near && rx <= maxval + near,
        s"JPEG-LS sample out of range in $path")
      if (rx < 0) 0 else if (rx > maxval) maxval else rx
    }

    def predict(ra: Int, rb: Int, rc: Int): Int =
      if (rc >= math.max(ra, rb)) math.min(ra, rb)
      else if (rc <= math.min(ra, rb)) math.max(ra, rb)
      else ra + rb - rc

    def golombK(q: Int): Int = {
      var k = 0
      while ((n(q) << k) < a(q)) k += 1
      k
    }

    /** A.6: context update after coding a regular-mode sample. In
      * near-lossless mode the bias accumulator takes the DEQUANTIZED
      * error (T.87 A.6.1: B[Q] += Errval·(2·NEAR+1)) while A keeps
      * the quantized magnitude — getting this wrong desynchronizes
      * C[q] against conformant codecs. */
    def updateRegular(q: Int, errval: Int): Unit = {
      b(q) += errval * (2 * near + 1)
      a(q) += math.abs(errval)
      if (n(q) == Reset) { a(q) >>= 1; b(q) >>= 1; n(q) >>= 1 }
      n(q) += 1
      if (b(q) <= -n(q)) {
        if (c(q) > MinC) c(q) -= 1
        b(q) += n(q)
        if (b(q) <= -n(q)) b(q) = -n(q) + 1
      } else if (b(q) > 0) {
        if (c(q) < MaxC) c(q) += 1
        b(q) -= n(q)
        if (b(q) > 0) b(q) = 0
      }
    }

    def golombKRun(riType: Int): Int = {
      val q = 365 + riType
      val temp = a(q) + ((n(q) >> 1) * riType)
      var k = 0
      var nTest = n(q)
      while (nTest < temp) { nTest <<= 1; k += 1 }
      k
    }

    /** A.7.2: run-interruption context update. */
    def updateRun(riType: Int, errval: Int, eMapped: Int): Unit = {
      val q = 365 + riType
      if (errval < 0) nn(q) += 1
      a(q) += (eMapped + 1 - riType) >> 1
      if (n(q) == Reset) { a(q) >>= 1; n(q) >>= 1; nn(q) >>= 1 }
      n(q) += 1
    }
  }

  // ======================= bit IO with JPEG-LS stuffing ============

  private final class BitWriter(bos: ByteArrayOutputStream) {
    private var acc = 0
    private var nBits = 0
    private var cap = 8 // 7 after an 0xFF byte: MSB of the next byte is 0
    def put(value: Int, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) {
        acc = (acc << 1) | ((value >>> i) & 1)
        nBits += 1
        if (nBits == cap) {
          bos.write(acc)
          cap = if (acc == 0xff) 7 else 8
          acc = 0; nBits = 0
        }
        i -= 1
      }
    }
    def putZeros(count: Int): Unit = { var i = 0; while (i < count) { put(0, 1); i += 1 } }
    /** Zero-pad the final partial byte (never produces 0xFF: the last
      * data bit of a partial byte is followed by at least one 0). */
    def flush(): Unit = if (nBits > 0) put(0, cap - nBits)
  }

  private final class BitReader(src: Array[Byte], private var pos: Int, path: String) {
    private var acc = 0
    private var nBits = 0
    private var afterFF = false
    def bit(): Int = {
      if (nBits == 0) {
        require(pos < src.length, s"truncated JPEG-LS entropy data in $path")
        val b = src(pos) & 0xff; pos += 1
        if (afterFF) {
          require((b & 0x80) == 0, s"unexpected marker inside JPEG-LS entropy data in $path")
          acc = b; nBits = 7
        } else { acc = b; nBits = 8 }
        afterFF = b == 0xff
      }
      nBits -= 1
      (acc >>> nBits) & 1
    }
    def bits(count: Int): Int = {
      var v = 0; var i = 0
      while (i < count) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Byte position after the last consumed byte — any unread bits
      * in it are the encoder's zero padding, so this is where the
      * next marker (or next scan's entropy data) begins. */
    def bytePos: Int = pos
  }

  // ======================= Golomb limited-length coding ============

  /** A.5.3: limited-length Golomb encode of a mapped non-negative
    * value: unary(value >> k) zeros + 1 + k low bits, escaping to
    * (limit - qbpp - 1) zeros + 1 + qbpp bits of (value - 1). */
  private def encodeMapped(bw: BitWriter, value: Int, k: Int, limit: Int, qbpp: Int): Unit = {
    val high = value >>> k
    if (high < limit - qbpp - 1) {
      bw.putZeros(high)
      bw.put(1, 1)
      if (k > 0) bw.put(value & ((1 << k) - 1), k)
    } else {
      bw.putZeros(limit - qbpp - 1)
      bw.put(1, 1)
      bw.put(value - 1, qbpp)
    }
  }

  private def decodeMapped(br: BitReader, k: Int, limit: Int, qbpp: Int, path: String): Int = {
    var high = 0
    while (br.bit() == 0) {
      high += 1
      require(high <= limit, s"runaway unary code in JPEG-LS stream in $path")
    }
    if (high < limit - qbpp - 1) (high << k) | (if (k > 0) br.bits(k) else 0)
    else br.bits(qbpp) + 1
  }

  // ======================= scan coding =============================

  /** Per-component line buffers: prev/cur with 2 phantom cells
    * ([0] = x-1 edge, [w+1] = x=w edge), swapped after each of the
    * component's lines. One instance per component so interleaved
    * scans keep independent neighbourhoods while SHARING the
    * statistical state (T.87 A.2.1: multi-component scans use one
    * set of context counters). */
  private final class LineBuf(w: Int) {
    var prev = new Array[Int](w + 2)
    var cur = new Array[Int](w + 2)
    def startLine(): Unit = { prev(w + 1) = prev(w); cur(0) = prev(1) }
    def endLine(): Unit = { val t = prev; prev = cur; cur = t }
  }

  /** Encode one line of one component plane through (shared or
    * per-scan) state `st`. */
  private def encodeLine(bw: BitWriter, st: State, vals: Array[Int], y: Int,
                         w: Int, lb: LineBuf): Unit = {
    lb.startLine()
    val prev = lb.prev; val cur = lb.cur
    var x = 0
    while (x < w) {
      val ra = cur(x); val rb = prev(x + 1); val rc = prev(x); val rd = prev(x + 2)
      val ix = vals(y * w + x)
      val q1 = st.quantize(rd - rb); val q2 = st.quantize(rb - rc); val q3 = st.quantize(rc - ra)
      if (q1 == 0 && q2 == 0 && q3 == 0) {
        // ---- run mode (A.7): at NEAR > 0 a sample continues the
        // run when it is within NEAR of the run value, and the
        // RECONSTRUCTION is the run value itself (the error bound) --
        var runLen = 0
        while (x + runLen < w &&
            math.abs(vals(y * w + x + runLen) - ra) <= st.near) runLen += 1
        var i = 0
        while (i < runLen) { cur(x + 1 + i) = ra; i += 1 }
        val eol = x + runLen == w
        var rem = runLen
        while (rem >= (1 << J(st.runIndex))) {
          bw.put(1, 1)
          rem -= 1 << J(st.runIndex)
          if (st.runIndex < 31) st.runIndex += 1
        }
        if (eol) {
          if (rem > 0) bw.put(1, 1)
          x += runLen
        } else {
          bw.put(rem, J(st.runIndex) + 1) // leading 0 + J bits
          // run-interruption sample (A.7.2)
          val xi = x + runLen
          val rbI = prev(xi + 1)
          val ixI = vals(y * w + xi)
          val riType = if (math.abs(ra - rbI) <= st.near) 1 else 0
          val px = if (riType == 1) ra else rbI
          var errval = ixI - px
          val flip = riType == 0 && ra > rbI
          if (flip) errval = -errval
          errval = st.quantizeErr(errval)
          // the decoder's view of this sample — context propagation
          // must see it too
          val rx = st.reconstruct(px, if (flip) -errval else errval, "encode")
          // modulo reduction (A.4.5)
          if (errval < 0) errval += st.range
          if (errval >= (st.range + 1) / 2) errval -= st.range
          val k = st.golombKRun(riType)
          val q = 365 + riType
          val map =
            (k == 0 && errval > 0 && 2 * st.nn(q) < st.n(q)) ||
            (errval < 0 && 2 * st.nn(q) >= st.n(q)) ||
            (errval < 0 && k != 0)
          val eMapped = 2 * math.abs(errval) - riType - (if (map) 1 else 0)
          encodeMapped(bw, eMapped, k, st.limit - J(st.runIndex) - 1, st.qbpp)
          st.updateRun(riType, errval, eMapped)
          if (st.runIndex > 0) st.runIndex -= 1
          cur(xi + 1) = rx
          x = xi + 1
        }
      } else {
        // ---- regular mode (A.4-A.6) ----
        var sign = 1
        var q = 81 * q1 + 9 * q2 + q3
        if (q < 0) { sign = -1; q = -q }
        var px = st.predict(ra, rb, rc) + sign * st.c(q)
        if (px < 0) px = 0 else if (px > st.maxval) px = st.maxval
        var errval = ix - px
        if (sign < 0) errval = -errval
        errval = st.quantizeErr(errval)
        // propagate the decoder's reconstruction through the contexts
        val rx = st.reconstruct(px, if (sign < 0) -errval else errval, "encode")
        if (errval < 0) errval += st.range
        if (errval >= (st.range + 1) / 2) errval -= st.range
        val k = st.golombK(q)
        // T.87 code segment A.11 gates the inverted mapping on
        // NEAR == 0 — applying it in near-lossless mode is a
        // bitstream conformance break
        val mapped =
          if (st.near == 0 && k == 0 && 2 * st.b(q) <= -st.n(q)) {
            if (errval >= 0) 2 * errval + 1 else -2 * (errval + 1)
          } else {
            if (errval >= 0) 2 * errval else -2 * errval - 1
          }
        encodeMapped(bw, mapped, k, st.limit, st.qbpp)
        st.updateRegular(q, errval)
        cur(x + 1) = rx
        x += 1
      }
    }
    lb.endLine()
  }

  /** Decode one line of one component into `out`; mirror of
    * [[encodeLine]]. */
  private def decodeLine(br: BitReader, st: State, out: Array[Int], y: Int,
                         w: Int, lb: LineBuf, path: String): Unit = {
    lb.startLine()
    val prev = lb.prev; val cur = lb.cur
    var x = 0
    while (x < w) {
      val ra = cur(x); val rb = prev(x + 1); val rc = prev(x); val rd = prev(x + 2)
      val q1 = st.quantize(rd - rb); val q2 = st.quantize(rb - rc); val q3 = st.quantize(rc - ra)
      if (q1 == 0 && q2 == 0 && q3 == 0) {
        // ---- run mode ----
        var runLen = 0
        var broken = false
        while (!broken && br.bit() == 1) {
          val step = math.min(1 << J(st.runIndex), w - x - runLen)
          runLen += step
          if (step == (1 << J(st.runIndex)) && st.runIndex < 31) st.runIndex += 1
          if (x + runLen == w) broken = true
        }
        if (x + runLen < w) { // interrupted run: remainder then sample
          if (J(st.runIndex) > 0) runLen += br.bits(J(st.runIndex))
          require(x + runLen < w, s"JPEG-LS run overruns line in $path")
        }
        var i = 0
        while (i < runLen) { out(y * w + x + i) = ra; cur(x + 1 + i) = ra; i += 1 }
        if (x + runLen == w) x += runLen
        else {
          val xi = x + runLen
          val rbI = prev(xi + 1)
          val riType = if (math.abs(ra - rbI) <= st.near) 1 else 0
          val q = 365 + riType
          val k = st.golombKRun(riType)
          val eMapped = decodeMapped(br, k, st.limit - J(st.runIndex) - 1, st.qbpp, path)
          val temp = eMapped + riType
          val map = (temp & 1) == 1
          val errAbs = (temp + (if (map) 1 else 0)) / 2
          val errval =
            if ((k != 0 || 2 * st.nn(q) >= st.n(q)) == map) -errAbs else errAbs
          st.updateRun(riType, errval, eMapped)
          if (st.runIndex > 0) st.runIndex -= 1
          val px = if (riType == 1) ra else rbI
          val signedErr = if (riType == 0 && ra > rbI) -errval else errval
          val rx = st.reconstruct(px, signedErr, path)
          out(y * w + xi) = rx
          cur(xi + 1) = rx
          x = xi + 1
        }
      } else {
        // ---- regular mode ----
        var sign = 1
        var q = 81 * q1 + 9 * q2 + q3
        if (q < 0) { sign = -1; q = -q }
        var px = st.predict(ra, rb, rc) + sign * st.c(q)
        if (px < 0) px = 0 else if (px > st.maxval) px = st.maxval
        val k = st.golombK(q)
        val mapped = decodeMapped(br, k, st.limit, st.qbpp, path)
        val errval =
          if (st.near == 0 && k == 0 && 2 * st.b(q) <= -st.n(q)) {
            if ((mapped & 1) == 1) (mapped - 1) / 2 else -(mapped / 2) - 1
          } else {
            if ((mapped & 1) == 0) mapped / 2 else -((mapped + 1) / 2)
          }
        st.updateRegular(q, errval)
        val rx = st.reconstruct(px, if (sign < 0) -errval else errval, path)
        out(y * w + x) = rx
        cur(x + 1) = rx
        x += 1
      }
    }
    lb.endLine()
  }

  /** Encode one P-bit single-component frame as a complete JPEG-LS
    * interchange stream (SOI, SOF55, SOS, entropy data, EOI). Values
    * must lie in [0, 2^precision). `near` = 0 is lossless (bit-exact
    * round trip); `near` > 0 is T.87 near-lossless with the HARD
    * per-sample guarantee |decoded − original| ≤ near — the encoder
    * propagates RECONSTRUCTED values through its own contexts, so it
    * sees exactly what the decoder will. */
  private[graft] def encode(vals: Array[Int], w: Int, h: Int, precision: Int,
                            near: Int = 0): Array[Byte] =
    encodeMulti(Array(vals), w, h, precision, near, ilv = 0)

  /** Encode a multi-component frame (1..4 equal-sized planes).
    * `ilv` = 0 writes one scan per component (plane order, each scan
    * with fresh modeling state, per T.87); `ilv` = 1 writes a single
    * line-interleaved scan (lines round-robin across components,
    * one SHARED set of context counters — A.2.1). Sample interleave
    * (ILV=2) is not implemented. Lossless at `near` = 0 either way;
    * the near-lossless bound holds per sample per component. */
  private[graft] def encodeMulti(comps: Array[Array[Int]], w: Int, h: Int,
                                 precision: Int, near: Int = 0,
                                 ilv: Int = 1): Array[Byte] = {
    require(precision >= 2 && precision <= 16, s"bad JPEG-LS precision $precision")
    require(comps.length >= 1 && comps.length <= 4,
      s"1..4 components, got ${comps.length}")
    require(comps.forall(_.length == w * h), "sample count mismatch")
    require(ilv == 0 || (ilv == 1 && comps.length > 1),
      s"ILV $ilv unsupported (0 = plane scans, 1 = line interleave with >1 component)")
    val nc = comps.length
    val bos = new ByteArrayOutputStream()
    def marker(m: Int): Unit = { bos.write(0xff); bos.write(m) }
    def u16(v: Int): Unit = { bos.write((v >> 8) & 0xff); bos.write(v & 0xff) }
    marker(0xd8) // SOI
    marker(0xf7) // SOF55
    u16(8 + 3 * nc); bos.write(precision); u16(h); u16(w); bos.write(nc)
    for (c <- 0 until nc) { bos.write(c + 1); bos.write(0x11); bos.write(0) }
    def sos(ids: Seq[Int], ilvByte: Int): Unit = {
      marker(0xda)
      u16(6 + 2 * ids.length); bos.write(ids.length)
      ids.foreach { id => bos.write(id); bos.write(0) }
      bos.write(near); bos.write(ilvByte); bos.write(0)
    }
    if (ilv == 0) {
      for (c <- 0 until nc) {
        sos(Seq(c + 1), 0)
        val st = new State(precision, near) // fresh per scan
        val bw = new BitWriter(bos)
        val lb = new LineBuf(w)
        var y = 0
        while (y < h) { encodeLine(bw, st, comps(c), y, w, lb); y += 1 }
        bw.flush()
      }
    } else {
      sos((1 to nc), 1)
      val st = new State(precision, near) // ONE state across components
      val bw = new BitWriter(bos)
      val lbs = Array.fill(nc)(new LineBuf(w))
      var y = 0
      while (y < h) {
        var c = 0
        while (c < nc) { encodeLine(bw, st, comps(c), y, w, lbs(c)); c += 1 }
        y += 1
      }
      bw.flush()
    }
    marker(0xd9) // EOI
    bos.toByteArray
  }

  /** Decode a single-component JPEG-LS stream; a color stream rejects
    * here — use [[decodeFull]]. Returns (width, height, precision,
    * samples). */
  private[graft] def decode(frag: Array[Byte], path: String): (Int, Int, Int, Array[Int]) = {
    val (w, h, precision, planes) = decodeFull(frag, path)
    require(planes.length == 1,
      s"expected single-component JPEG-LS, got ${planes.length} components in $path")
    (w, h, precision, planes(0))
  }

  /** Decode any stream of this profile: 1..4 components, plane scans
    * (ILV=0, one scan per component) or a line-interleaved scan
    * (ILV=1, shared context counters). Accepts any declared precision
    * 2..16, both coding modes, and any legal NEAR (equal across
    * scans); rejects loudly what this profile does not cover (sample
    * interleave, point transforms, non-default LSE presets, restart
    * intervals, mixed per-scan NEAR). Returns (width, height,
    * precision, component planes). */
  private[graft] def decodeFull(frag: Array[Byte], path: String): (Int, Int, Int, Array[Array[Int]]) = {
    require(frag.length >= 4 && (frag(0) & 0xff) == 0xff && (frag(1) & 0xff) == 0xd8,
      s"missing JPEG-LS SOI marker in $path")
    def u16(p: Int): Int = ((frag(p) & 0xff) << 8) | (frag(p + 1) & 0xff)
    var pos = 2
    var w = 0; var h = 0; var precision = 0; var nc = 0
    var compIds: Array[Int] = null
    var near = -1 // first scan sets it; later scans must match
    var declaredLse: Option[(Int, Int, Int, Int, Int)] = None
    var planes: Array[Array[Int]] = null
    val seen = new Array[Boolean](4)
    var scansDone = 0
    var interleavedDone = false
    var atEnd = false
    while (!atEnd) {
      require(pos + 2 <= frag.length && (frag(pos) & 0xff) == 0xff,
        s"malformed JPEG-LS marker stream in $path")
      // T.81 B.1.1.2 (inherited by T.87): markers may be preceded by
      // 0xFF fill bytes — skip them or the marker byte reads as length
      while (pos + 2 <= frag.length && (frag(pos + 1) & 0xff) == 0xff) pos += 1
      val m = frag(pos + 1) & 0xff
      if (m == 0xd9) { // EOI
        require(planes != null && (interleavedDone || (nc > 0 && scansDone == nc)),
          s"JPEG-LS stream ends before all components decoded in $path")
        atEnd = true
      } else {
        require(pos + 4 <= frag.length, s"truncated JPEG-LS segment in $path")
        val len = u16(pos + 2)
        require(pos + 2 + len <= frag.length, s"truncated JPEG-LS segment in $path")
        m match {
          case 0xf7 => // SOF55
            precision = frag(pos + 4) & 0xff
            h = u16(pos + 5); w = u16(pos + 7)
            nc = frag(pos + 9) & 0xff
            require(nc >= 1 && nc <= 4,
              s"unsupported JPEG-LS component count $nc in $path")
            require(len == 8 + 3 * nc, s"bad SOF55 length in $path")
            require(precision >= 2 && precision <= 16,
              s"bad JPEG-LS precision $precision in $path")
            compIds = Array.tabulate(nc) { c =>
              val id = frag(pos + 10 + 3 * c) & 0xff
              require((frag(pos + 11 + 3 * c) & 0xff) == 0x11,
                s"subsampled JPEG-LS components unsupported in $path")
              id
            }
            require(compIds.distinct.length == nc, s"duplicate component ids in $path")
            require(w > 0 && h > 0, s"bad JPEG-LS geometry in $path")
            planes = Array.fill(nc)(new Array[Int](w * h))
            pos += 2 + len
          case 0xf8 => // LSE: only the default preset restatement is accepted
            require((frag(pos + 4) & 0xff) == 1,
              s"non-preset JPEG-LS LSE segment unsupported in $path")
            require(precision > 0, s"JPEG-LS LSE before SOF55 in $path")
            // the default thresholds depend on NEAR, which the SOS has
            // not declared yet — record and validate at the SOS
            declaredLse = Some((u16(pos + 5), u16(pos + 7), u16(pos + 9),
              u16(pos + 11), u16(pos + 13)))
            pos += 2 + len
          case sof if sof >= 0xc0 && sof <= 0xcf && sof != 0xc4 && sof != 0xc8 && sof != 0xcc =>
            throw new IllegalArgumentException(
              f"non-JPEG-LS frame (SOF marker 0xFF$sof%02X) in $path — SOF55 only")
          case 0xdd =>
            require(u16(pos + 4) == 0, s"JPEG-LS restart intervals unsupported in $path")
            pos += 2 + len
          case 0xda => // SOS
            require(planes != null, s"JPEG-LS SOS before SOF55 in $path")
            require(!interleavedDone && scansDone < nc,
              s"unexpected extra JPEG-LS scan in $path")
            val ns = frag(pos + 4) & 0xff
            // the NEAR/ILV/Al bytes are read at pos + 5 + 2*ns — a
            // segment length inconsistent with Ns would put them in
            // entropy data (or out of bounds); the generic
            // truncated-segment require above only bounds `len`
            require(ns >= 1 && ns <= nc && len == 6 + 2 * ns,
              s"malformed JPEG-LS SOS (Ns=$ns, length $len) in $path")
            val scanNear = frag(pos + 5 + 2 * ns) & 0xff
            val ilvByte = frag(pos + 6 + 2 * ns) & 0xff
            require((frag(pos + 7 + 2 * ns) & 0x0f) == 0,
              s"JPEG-LS point transform unsupported in $path")
            require(scanNear <= math.min(255, ((1 << precision) - 1) / 2),
              s"JPEG-LS NEAR $scanNear out of range at precision $precision in $path")
            if (near < 0) near = scanNear
            else require(near == scanNear,
              s"mixed per-scan NEAR values unsupported in $path")
            val stProbe = new State(precision, near)
            declaredLse.foreach { d =>
              require(d == ((stProbe.maxval, stProbe.t1, stProbe.t2, stProbe.t3, Reset)),
                s"non-default JPEG-LS preset parameters $d unsupported in $path")
            }
            def compIdx(id: Int): Int = {
              val i = compIds.indexOf(id)
              require(i >= 0, s"JPEG-LS scan references unknown component $id in $path")
              i
            }
            val scanStart = pos + 2 + len
            if (ilvByte == 0) {
              require(ns == 1,
                s"multi-component plane scan (Ns=$ns, ILV=0) is malformed in $path")
              val c = compIdx(frag(pos + 5) & 0xff)
              require(!seen(c), s"component coded twice in $path")
              seen(c) = true
              val br = new BitReader(frag, scanStart, path)
              val lb = new LineBuf(w)
              var y = 0
              while (y < h) { decodeLine(br, stProbe, planes(c), y, w, lb, path); y += 1 }
              scansDone += 1
              pos = br.bytePos
            } else if (ilvByte == 1) {
              require(ns == nc && nc > 1,
                s"line-interleaved scan must carry all $nc components in $path")
              val order = Array.tabulate(ns)(i => compIdx(frag(pos + 5 + 2 * i) & 0xff))
              val br = new BitReader(frag, scanStart, path)
              val lbs = Array.fill(nc)(new LineBuf(w))
              var y = 0
              while (y < h) {
                var i = 0
                while (i < ns) {
                  val c = order(i)
                  decodeLine(br, stProbe, planes(c), y, w, lbs(c), path)
                  i += 1
                }
                y += 1
              }
              interleavedDone = true
              pos = br.bytePos
            } else throw new IllegalArgumentException(
              s"sample-interleaved JPEG-LS (ILV=$ilvByte) unsupported in $path")
          case _ => pos += 2 + len // APPn / COM: skip
        }
      }
    }
    require(w > 0 && h > 0, s"missing JPEG-LS SOF55 frame header in $path")
    (w, h, precision, planes)
  }
}
