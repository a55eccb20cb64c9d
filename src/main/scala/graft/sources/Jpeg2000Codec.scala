package graft.sources

import java.io.ByteArrayOutputStream
import scala.collection.mutable.ArrayBuffer

/** Native JPEG 2000 Part-1 codec (ITU-T T.800 / ISO 15444-1) for the
  * DICOM JPEG 2000 Lossless transfer syntax (1.2.840.10008.1.2.4.90)
  * — the last compressed syntax the reference stack reads (via
  * spark-scifio, /root/reference/pom.xml:60-64, exercised by
  * IjRDDTests.scala:30-99) that this engine previously rejected.
  *
  * Profile implemented, end to end and bit-exact:
  *   - raw JPEG 2000 codestream (SOC..EOC — DICOM encapsulates the
  *     codestream, not the JP2 container),
  *   - tile grids at origin (0,0) — one tile-part per tile, any
  *     Isot order, interior tile dims a multiple of cb·2^levels so
  *     lifting parity and code-block anchoring stay tile-local (the
  *     power-of-two layouts real encoders emit); plus the
  *     degenerate whole-image single tile,
  *   - 1-component grayscale and 3-component color, unsigned
  *     samples up to 16 bit, DC level shift per E.3; color with or
  *     without the reversible color transform (G.2 RCT — the DICOM
  *     YBR_RCT shape of .90 color),
  *   - REVERSIBLE 5/3 integer wavelet (Annex F lifting, symmetric
  *     extension), any number of decomposition levels incl. 0,
  *   - no quantization (Sqcd style 0, derived Mb = G + eps − 1),
  *   - EBCOT Tier-1 (Annex D): three coding passes per bit plane,
  *     zero/sign/magnitude-refinement context modelling, run-length
  *     mode, MQ arithmetic coder (Annex C) with the 47-state table,
  *   - Tier-2 (Annex B): LRCP progression, one layer, one precinct
  *     (PPx=PPy=15), tag-tree coded inclusion + zero-bit-planes,
  *     bit-stuffed packet headers, Lblock length signalling,
  *   - configurable code-block size (reader honours whatever COD
  *     declares, writer defaults to 64x64), so multi-code-block
  *     subbands and third-party stream shapes decode.
  *
  * The IRREVERSIBLE 9/7 path (Annex F float lifting, scalar-
  * expounded deadzone quantization per E.1.1, midpoint
  * reconstruction) is also implemented — the lossy stream shape of
  * DICOM's JPEG 2000 syntax (.91) — with a hard quantizer-bounded
  * error instead of bit-exactness.
  *
  * Not implemented (rejected loudly at parse time, never
  * mis-decoded): unaligned tile grids, multiple tile-parts per
  * tile, >4 components, subsampled/mixed-precision components,
  * the irreversible color transform (ICT), derived-style
  * quantization, precinct partitions, SOP/EPH, selective arithmetic
  * bypass / vertically-causal / termination cblk styles, ROI
  * shifts, multiple layers, non-LRCP progressions, and per-tile
  * COD/COC/QCD/QCC/POC/PPT overrides.
  */
object Jpeg2000Codec {

  // ----------------------------------------------------------------
  // MQ arithmetic coder (T.800 Annex C): the 47-state Qe table.
  // ----------------------------------------------------------------
  private val QeTab = Array(
    0x5601, 0x3401, 0x1801, 0x0AC1, 0x0521, 0x0221, 0x5601, 0x5401,
    0x4801, 0x3801, 0x3001, 0x2401, 0x1C01, 0x1601, 0x5601, 0x5401,
    0x5101, 0x4801, 0x3801, 0x3401, 0x3001, 0x2801, 0x2401, 0x2201,
    0x1C01, 0x1801, 0x1601, 0x1401, 0x1201, 0x1101, 0x0AC1, 0x09C1,
    0x08A1, 0x0521, 0x0441, 0x02A1, 0x0221, 0x0141, 0x0111, 0x0085,
    0x0049, 0x0025, 0x0015, 0x0009, 0x0005, 0x0001, 0x5601)
  private val NmpsTab = Array(
    1, 2, 3, 4, 5, 38, 7, 8, 9, 10, 11, 12, 13, 29, 15, 16,
    17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32,
    33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 45, 46)
  private val NlpsTab = Array(
    1, 6, 9, 12, 29, 33, 6, 14, 14, 14, 17, 18, 20, 21, 14, 14,
    15, 16, 17, 18, 19, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29,
    30, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 46)
  private val SwitchTab = Array(
    1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 1, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)

  /** Tier-1 context count and numbering: 0-8 zero coding, 9-13 sign
    * coding, 14-16 magnitude refinement, 17 run-length, 18 uniform. */
  private val NCtx = 19
  private val CtxRl = 17
  private val CtxUni = 18

  private def initStates(idx: Array[Int], mps: Array[Int]): Unit = {
    java.util.Arrays.fill(idx, 0); java.util.Arrays.fill(mps, 0)
    idx(0) = 4; idx(CtxRl) = 3; idx(CtxUni) = 46 // Table D.7
  }

  private final class MqEncoder {
    private val buf = ArrayBuffer[Byte](0) // buf(0): carry catcher before the stream
    private var bp = 0
    private var a = 0x8000
    private var c = 0
    private var ct = 12
    val idx = new Array[Int](NCtx); val mps = new Array[Int](NCtx)
    initStates(idx, mps)

    private def byteOut(): Unit = {
      if ((buf(bp) & 0xff) == 0xff) {
        bp += 1; if (bp == buf.length) buf += 0
        buf(bp) = ((c >> 20) & 0xff).toByte; c &= 0xfffff; ct = 7
      } else {
        if (c >= 0x8000000) { // carry into the previous byte
          buf(bp) = (buf(bp) + 1).toByte; c &= 0x7ffffff
          if ((buf(bp) & 0xff) == 0xff) {
            bp += 1; if (bp == buf.length) buf += 0
            buf(bp) = ((c >> 20) & 0xff).toByte; c &= 0xfffff; ct = 7
            return
          }
        }
        bp += 1; if (bp == buf.length) buf += 0
        buf(bp) = ((c >> 19) & 0xff).toByte; c &= 0x7ffff; ct = 8
      }
    }

    private def renorm(): Unit = {
      while (a < 0x8000) {
        a <<= 1; c <<= 1; ct -= 1
        if (ct == 0) byteOut()
      }
    }

    def encode(cx: Int, d: Int): Unit = {
      val qe = QeTab(idx(cx))
      if (d == mps(cx)) {
        a -= qe
        if (a >= 0x8000) c += qe
        else {
          if (a < qe) a = qe else c += qe
          idx(cx) = NmpsTab(idx(cx)); renorm()
        }
      } else {
        a -= qe
        if (a < qe) c += qe else a = qe
        if (SwitchTab(idx(cx)) == 1) mps(cx) = 1 - mps(cx)
        idx(cx) = NlpsTab(idx(cx)); renorm()
      }
    }

    /** FLUSH (C.2.9) and return the codeword segment. */
    def finish(): Array[Byte] = {
      val tempc = c + a
      c |= 0xffff
      if (c >= tempc) c -= 0x8000
      c <<= ct; byteOut()
      c <<= ct; byteOut()
      if ((buf(bp) & 0xff) != 0xff) bp += 1
      require((buf(0) & 0xff) == 0,
        "MQ flush carried past the stream start") // unreachable by C + A invariant
      buf.slice(1, math.max(1, bp)).toArray
    }
  }

  private final class MqDecoder(data: Array[Byte]) {
    private var bp = 0
    private var c = 0
    private var a = 0
    private var ct = 0
    val idx = new Array[Int](NCtx); val mps = new Array[Int](NCtx)
    initStates(idx, mps)
    // INITDEC (C.3.5)
    c = (byteAt(0) & 0xff) << 16
    byteIn()
    c <<= 7; ct -= 7; a = 0x8000

    private def byteAt(i: Int): Int = if (i < data.length) data(i) & 0xff else 0xff

    private def byteIn(): Unit = {
      if (byteAt(bp) == 0xff) {
        if (byteAt(bp + 1) > 0x8f) { c += 0xff00; ct = 8 }
        else { bp += 1; c += byteAt(bp) << 9; ct = 7 }
      } else { bp += 1; c += byteAt(bp) << 8; ct = 8 }
    }

    def decode(cx: Int): Int = {
      val qe = QeTab(idx(cx))
      a -= qe
      var d = 0
      if (((c >>> 16) & 0xffff) < qe) {
        // LPS exchange path
        if (a < qe) { d = mps(cx); idx(cx) = NmpsTab(idx(cx)) }
        else {
          d = 1 - mps(cx)
          if (SwitchTab(idx(cx)) == 1) mps(cx) = 1 - mps(cx)
          idx(cx) = NlpsTab(idx(cx))
        }
        a = qe
        renorm()
      } else {
        c -= qe << 16
        if ((a & 0x8000) == 0) {
          if (a < qe) {
            d = 1 - mps(cx)
            if (SwitchTab(idx(cx)) == 1) mps(cx) = 1 - mps(cx)
            idx(cx) = NlpsTab(idx(cx))
          } else { d = mps(cx); idx(cx) = NmpsTab(idx(cx)) }
          renorm()
        } else d = mps(cx)
      }
      d
    }

    private def renorm(): Unit = {
      while ((a & 0x8000) == 0) {
        if (ct == 0) byteIn()
        a <<= 1; c <<= 1; ct -= 1
      }
    }
  }

  // ----------------------------------------------------------------
  // Packet-header bit IO with the B.10.1 stuffing rule: after an
  // emitted 0xFF byte the next byte carries only 7 bits.
  // ----------------------------------------------------------------
  private final class BitWriter {
    private val out = new ByteArrayOutputStream()
    private var acc = 0
    private var n = 0
    private var lastWasFF = false

    private def cap: Int = if (lastWasFF) 7 else 8 // post-0xFF bytes carry 7 bits
    def bit(b: Int): Unit = {
      acc = (acc << 1) | (b & 1); n += 1
      if (n == cap) { out.write(acc); lastWasFF = acc == 0xff; acc = 0; n = 0 }
    }
    def bits(v: Int, nb: Int): Unit = { var i = nb - 1; while (i >= 0) { bit((v >>> i) & 1); i -= 1 } }
    /** Pad to a byte boundary; a trailing 0xFF gets its stuffed 0x00. */
    def finish(): Array[Byte] = {
      if (n > 0) {
        while (n < cap) { acc <<= 1; n += 1 }
        out.write(acc); lastWasFF = acc == 0xff; acc = 0; n = 0
      }
      if (lastWasFF) out.write(0)
      val b = out.toByteArray
      require(b.isEmpty || (b.last & 0xff) != 0xff, "packet header may not end in 0xFF")
      b
    }
  }

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var have = 0
    private var lastByte = 0

    def bit(): Int = {
      if (have == 0) {
        val nbits = if (lastByte == 0xff) 7 else 8
        require(pos < data.length, "packet header truncated")
        lastByte = data(pos) & 0xff; pos += 1
        acc = lastByte; have = nbits
        if (nbits == 7) require((acc & 0x80) == 0, "missing stuffed zero after 0xFF in packet header")
      }
      have -= 1
      (acc >>> have) & 1
    }
    def bits(n: Int): Int = { var v = 0; var i = 0; while (i < n) { v = (v << 1) | bit(); i += 1 }; v }
    /** Align to the next byte boundary (end of packet header). */
    def align(): Int = {
      have = 0
      if (lastByte == 0xff) { // stuffed byte after a trailing 0xFF
        require(pos < data.length && (data(pos) & 0xff) != 0xff, "bad stuffing at header end")
        pos += 1
      }
      lastByte = 0
      pos
    }
  }

  // ----------------------------------------------------------------
  // Tag trees (B.10.2) over the code-block grid of one subband.
  // ----------------------------------------------------------------
  private final class TagTree(val w: Int, val h: Int) {
    // level 0 = leaves; halve (ceil) until 1x1
    private val dims = {
      val b = ArrayBuffer((w, h))
      while (b.last._1 > 1 || b.last._2 > 1)
        b += (((b.last._1 + 1) / 2, (b.last._2 + 1) / 2))
      b.toArray
    }
    private val off = dims.scanLeft(0)((acc, d) => acc + d._1 * d._2)
    val value = new Array[Int](off.last)
    private val low = new Array[Int](off.last)
    private val known = new Array[Boolean](off.last)

    private def node(level: Int, x: Int, y: Int): Int = off(level) + y * dims(level)._1 + x
    private def path(leaf: Int): Array[Int] = {
      var x = leaf % w; var y = leaf / w
      val p = new Array[Int](dims.length)
      var l = 0
      while (l < dims.length) { p(dims.length - 1 - l) = node(l, x, y); x /= 2; y /= 2; l += 1 }
      p
    }
    /** Leaf values are set directly; internal nodes become min of children. */
    def build(): Unit = {
      var l = 1
      while (l < dims.length) {
        val (pw, ph) = dims(l); val (cw, ch) = dims(l - 1)
        var y = 0
        while (y < ph) {
          var x = 0
          while (x < pw) {
            var m = Int.MaxValue
            var dy = 0
            while (dy < 2) {
              var dx = 0
              while (dx < 2) {
                val cx = 2 * x + dx; val cy = 2 * y + dy
                if (cx < cw && cy < ch) m = math.min(m, value(node(l - 1, cx, cy)))
                dx += 1
              }
              dy += 1
            }
            value(node(l, x, y)) = m
            x += 1
          }
          y += 1
        }
        l += 1
      }
    }
    def encode(bw: BitWriter, leaf: Int, threshold: Int): Unit = {
      var lo = 0
      for (n <- path(leaf)) {
        if (low(n) < lo) low(n) = lo else lo = low(n)
        var break = false
        while (!break && lo < threshold) {
          if (lo >= value(n)) {
            if (!known(n)) { bw.bit(1); known(n) = true }
            break = true
          } else { bw.bit(0); lo += 1 }
        }
        low(n) = lo
      }
    }
    /** Returns true iff the leaf's value is < threshold (then `valueOf` is final). */
    def decode(br: BitReader, leaf: Int, threshold: Int): Boolean = {
      var lo = 0
      for (n <- path(leaf)) {
        if (low(n) < lo) low(n) = lo else lo = low(n)
        while (lo < threshold && !known(n)) {
          if (br.bit() == 1) { known(n) = true; value(n) = lo }
          else lo += 1
        }
        low(n) = lo
      }
      val n = path(leaf).last
      known(n) && value(n) < threshold
    }
    /** Decode a leaf completely (raise the threshold until known). */
    def decodeValue(br: BitReader, leaf: Int): Int = {
      var t = 1
      while (!decode(br, leaf, t)) t += 1
      value(path(leaf).last)
    }
  }

  // ----------------------------------------------------------------
  // Reversible 5/3 DWT (Annex F lifting, symmetric extension),
  // even-origin signals (tile and all subbands start at 0).
  // ----------------------------------------------------------------
  private def fwd53(x: Array[Int], n: Int, stride: Int, base: Int, tmp: Array[Int]): Unit = {
    if (n <= 1) return
    var i = 0
    while (i < n) { tmp(i) = x(base + i * stride); i += 1 }
    val y = new Array[Int](n)
    i = 1
    while (i < n) { // high (odd) samples first
      val r = if (i + 1 < n) tmp(i + 1) else tmp(i - 1)
      y(i) = tmp(i) - ((tmp(i - 1) + r) >> 1)
      i += 2
    }
    i = 0
    while (i < n) { // then low (even) samples
      val l = if (i - 1 >= 0) y(i - 1) else y(1)
      val r = if (i + 1 < n) y(i + 1) else y(i - 1)
      y(i) = tmp(i) + ((l + r + 2) >> 2)
      i += 2
    }
    // deinterleave: low half then high half
    val nl = (n + 1) / 2
    i = 0
    while (i < n) { val d = if (i % 2 == 0) i / 2 else nl + i / 2; x(base + d * stride) = y(i); i += 1 }
  }

  private def inv53(x: Array[Int], n: Int, stride: Int, base: Int, tmp: Array[Int]): Unit = {
    if (n <= 1) return
    val nl = (n + 1) / 2
    val y = new Array[Int](n)
    var i = 0
    while (i < n) { val s = if (i % 2 == 0) i / 2 else nl + i / 2; y(i) = x(base + s * stride); i += 1 }
    i = 0
    while (i < n) { // even (low) samples first
      val l = if (i - 1 >= 0) y(i - 1) else y(1)
      val r = if (i + 1 < n) y(i + 1) else y(i - 1)
      tmp(i) = y(i) - ((l + r + 2) >> 2)
      i += 2
    }
    i = 1
    while (i < n) { // then odd (high) samples
      val r = if (i + 1 < n) tmp(i + 1) else tmp(i - 1)
      tmp(i) = y(i) + ((tmp(i - 1) + r) >> 1)
      i += 2
    }
    i = 0
    while (i < n) { x(base + i * stride) = tmp(i); i += 1 }
  }

  /** In-place multi-level forward transform of the w x h image held
    * row-major in `img`; after the call the canonical subband layout
    * (LL top-left, HL top-right, LH bottom-left, HH bottom-right,
    * recursively) occupies the array. Rows are lifted before columns
    * each level; the inverse mirrors that. */
  private def fdwt(img: Array[Int], w: Int, h: Int, levels: Int): Unit = {
    val tmp = new Array[Int](math.max(w, h))
    var lw = w; var lh = h
    var l = 0
    while (l < levels) {
      var y = 0
      while (y < lh) { fwd53(img, lw, 1, y * w, tmp); y += 1 }
      var x = 0
      while (x < lw) { fwd53(img, lh, w, x, tmp); x += 1 }
      lw = (lw + 1) / 2; lh = (lh + 1) / 2
      l += 1
    }
  }

  private def idwt(img: Array[Int], w: Int, h: Int, levels: Int): Unit = {
    val tmp = new Array[Int](math.max(w, h))
    var l = levels - 1
    while (l >= 0) {
      val lw = sizeAt(w, l); val lh = sizeAt(h, l)
      var x = 0
      while (x < lw) { inv53(img, lh, w, x, tmp); x += 1 }
      var y = 0
      while (y < lh) { inv53(img, lw, 1, y * w, tmp); y += 1 }
      l -= 1
    }
  }

  /** Low-band size of dimension n after `l` halvings (ceil each). */
  private def sizeAt(n: Int, l: Int): Int = {
    var v = n; var i = 0
    while (i < l) { v = (v + 1) / 2; i += 1 }
    v
  }

  // ----------------------------------------------------------------
  // Irreversible 9/7 DWT (Annex F, Table F.4 lifting constants) with
  // whole-sample symmetric extension. Normalized so a constant signal
  // maps to an identical LL band and exactly-zero detail bands (the
  // scaling below yields DC gain (1+2β)(1+2δ+…)/K = 1 per level),
  // matching the interchange convention conformant codecs use.
  // ----------------------------------------------------------------
  private val A97 = -1.586134342059924
  private val B97 = -0.052980118572961
  private val G97 = 0.882911075530934
  private val D97 = 0.443506852043971
  private val K97 = 1.230174104914001

  /** One lifting pass: y(i) += f·(y(i−1) + y(i+1)) for i of the given
    * parity, with whole-sample symmetric mirroring at both ends. */
  private def lift97(y: Array[Double], n: Int, parity: Int, f: Double): Unit = {
    var i = parity
    while (i < n) {
      val l = if (i - 1 >= 0) y(i - 1) else y(1)
      val r = if (i + 1 < n) y(i + 1) else y(n - 2)
      y(i) += f * (l + r)
      i += 2
    }
  }

  private def fwd97(x: Array[Double], n: Int, stride: Int, base: Int, tmp: Array[Double]): Unit = {
    if (n <= 1) return
    var i = 0
    while (i < n) { tmp(i) = x(base + i * stride); i += 1 }
    lift97(tmp, n, 1, A97)
    lift97(tmp, n, 0, B97)
    lift97(tmp, n, 1, G97)
    lift97(tmp, n, 0, D97)
    val nl = (n + 1) / 2
    i = 0
    while (i < n) {
      val v = if (i % 2 == 0) tmp(i) / K97 else tmp(i) * (K97 / 2)
      val d = if (i % 2 == 0) i / 2 else nl + i / 2
      x(base + d * stride) = v
      i += 1
    }
  }

  private def inv97(x: Array[Double], n: Int, stride: Int, base: Int, tmp: Array[Double]): Unit = {
    if (n <= 1) return
    val nl = (n + 1) / 2
    var i = 0
    while (i < n) {
      val s = if (i % 2 == 0) i / 2 else nl + i / 2
      val v = x(base + s * stride)
      tmp(i) = if (i % 2 == 0) v * K97 else v * (2.0 / K97)
      i += 1
    }
    lift97(tmp, n, 0, -D97)
    lift97(tmp, n, 1, -G97)
    lift97(tmp, n, 0, -B97)
    lift97(tmp, n, 1, -A97)
    i = 0
    while (i < n) { x(base + i * stride) = tmp(i); i += 1 }
  }

  private def fdwt97(img: Array[Double], w: Int, h: Int, levels: Int): Unit = {
    val tmp = new Array[Double](math.max(w, h))
    var lw = w; var lh = h
    var l = 0
    while (l < levels) {
      var y = 0
      while (y < lh) { fwd97(img, lw, 1, y * w, tmp); y += 1 }
      var x = 0
      while (x < lw) { fwd97(img, lh, w, x, tmp); x += 1 }
      lw = (lw + 1) / 2; lh = (lh + 1) / 2
      l += 1
    }
  }

  private def idwt97(img: Array[Double], w: Int, h: Int, levels: Int): Unit = {
    val tmp = new Array[Double](math.max(w, h))
    var l = levels - 1
    while (l >= 0) {
      val lw = sizeAt(w, l); val lh = sizeAt(h, l)
      var x = 0
      while (x < lw) { inv97(img, lh, w, x, tmp); x += 1 }
      var y = 0
      while (y < lh) { inv97(img, lw, 1, y * w, tmp); y += 1 }
      l -= 1
    }
  }

  // ----------------------------------------------------------------
  // Tier-1 (Annex D): one engine drives both directions so encoder
  // and decoder are symmetric by construction.
  // ----------------------------------------------------------------
  /** Orientations: 0 = LL, 1 = HL (h/v swapped in zero coding),
    * 2 = LH, 3 = HH (Table D.1). */
  private def zcContext(orient: Int, h0: Int, v0: Int, d: Int): Int = {
    val (h, v) = if (orient == 1) (v0, h0) else (h0, v0)
    if (orient == 3) {
      val hv = h + v
      if (d >= 3) 8
      else if (d == 2) { if (hv >= 1) 7 else 6 }
      else if (d == 1) { if (hv >= 2) 5 else if (hv == 1) 4 else 3 }
      else { if (hv >= 2) 2 else if (hv == 1) 1 else 0 }
    } else {
      if (h == 2) 8
      else if (h == 1) { if (v >= 1) 7 else if (d >= 1) 6 else 5 }
      else { if (v == 2) 4 else if (v == 1) 3 else if (d >= 2) 2 else if (d == 1) 1 else 0 }
    }
  }

  /** Sign-coding context and XOR bit from clamped neighbour sums
    * (Table D.3): returns (ctx, xorBit). */
  private def scContext(hc: Int, vc: Int): (Int, Int) = (hc, vc) match {
    case (1, 1)   => (13, 0)
    case (1, 0)   => (12, 0)
    case (1, -1)  => (11, 0)
    case (0, 1)   => (10, 0)
    case (0, 0)   => (9, 0)
    case (0, -1)  => (10, 1)
    case (-1, 1)  => (11, 1)
    case (-1, 0)  => (12, 1)
    case (-1, -1) => (13, 1)
    case _        => throw new IllegalStateException("unclamped sign contribution")
  }

  /** One code block's coefficient state during Tier-1 coding. */
  private final class T1Block(val w: Int, val h: Int, val orient: Int) {
    val mag = new Array[Int](w * h)
    val sgn = new Array[Int](w * h) // 0 positive, 1 negative
    val sig = new Array[Boolean](w * h)
    val visited = new Array[Boolean](w * h)
    val refined = new Array[Boolean](w * h)

    @inline def at(x: Int, y: Int): Int = y * w + x
    @inline private def s(x: Int, y: Int): Boolean =
      x >= 0 && x < w && y >= 0 && y < h && sig(at(x, y))

    def counts(x: Int, y: Int): (Int, Int, Int) = {
      val hh = (if (s(x - 1, y)) 1 else 0) + (if (s(x + 1, y)) 1 else 0)
      val vv = (if (s(x, y - 1)) 1 else 0) + (if (s(x, y + 1)) 1 else 0)
      val dd = (if (s(x - 1, y - 1)) 1 else 0) + (if (s(x + 1, y - 1)) 1 else 0) +
        (if (s(x - 1, y + 1)) 1 else 0) + (if (s(x + 1, y + 1)) 1 else 0)
      (hh, vv, dd)
    }
    def anyNeighbourSig(x: Int, y: Int): Boolean = {
      val (a, b, c) = counts(x, y); a + b + c > 0
    }
    private def contrib(x: Int, y: Int): Int =
      if (!s(x, y)) 0 else if (sgn(at(x, y)) == 0) 1 else -1
    def signCtx(x: Int, y: Int): (Int, Int) = {
      val hc = math.max(-1, math.min(1, contrib(x - 1, y) + contrib(x + 1, y)))
      val vc = math.max(-1, math.min(1, contrib(x, y - 1) + contrib(x, y + 1)))
      scContext(hc, vc)
    }
  }

  /** Direction-agnostic MQ face: the encoder codes the bit the
    * by-name argument computes; the decoder ignores it and returns
    * the decoded bit. */
  private sealed trait MqIo { def bit(cx: Int, encBit: => Int): Int; def decoding: Boolean }
  private final class EncIo(enc: MqEncoder) extends MqIo {
    def bit(cx: Int, encBit: => Int): Int = { val b = encBit; enc.encode(cx, b); b }
    def decoding = false
  }
  private final class DecIo(dec: MqDecoder) extends MqIo {
    def bit(cx: Int, encBit: => Int): Int = dec.decode(cx)
    def decoding = true
  }

  /** Code the sign of (x,y) and mark it significant at plane p. */
  private def codeSign(t: T1Block, io: MqIo, x: Int, y: Int, p: Int): Unit = {
    val i = t.at(x, y)
    if (io.decoding) t.mag(i) |= 1 << p
    val (cx, xor) = t.signCtx(x, y)
    val b = io.bit(cx, t.sgn(i) ^ xor)
    if (io.decoding) t.sgn(i) = b ^ xor
    t.sig(i) = true
  }

  /** Significance-propagation pass (D.3.1). */
  private def pass1(t: T1Block, io: MqIo, p: Int): Unit = {
    var y0 = 0
    while (y0 < t.h) {
      var x = 0
      while (x < t.w) {
        var y = y0
        while (y < math.min(y0 + 4, t.h)) {
          val i = t.at(x, y)
          if (!t.sig(i)) {
            val (hh, vv, dd) = t.counts(x, y)
            if (hh + vv + dd > 0) {
              val cx = zcContext(t.orient, hh, vv, dd)
              val b = io.bit(cx, (t.mag(i) >>> p) & 1)
              t.visited(i) = true
              if (b == 1) codeSign(t, io, x, y, p)
            }
          }
          y += 1
        }
        x += 1
      }
      y0 += 4
    }
  }

  /** Magnitude-refinement pass (D.3.3). */
  private def pass2(t: T1Block, io: MqIo, p: Int): Unit = {
    var y0 = 0
    while (y0 < t.h) {
      var x = 0
      while (x < t.w) {
        var y = y0
        while (y < math.min(y0 + 4, t.h)) {
          val i = t.at(x, y)
          if (t.sig(i) && !t.visited(i)) {
            val cx = if (!t.refined(i)) { if (t.anyNeighbourSig(x, y)) 15 else 14 } else 16
            val b = io.bit(cx, (t.mag(i) >>> p) & 1)
            if (io.decoding) t.mag(i) |= b << p
            t.refined(i) = true
          }
          y += 1
        }
        x += 1
      }
      y0 += 4
    }
  }

  /** Clean-up pass with run-length mode (D.3.4). */
  private def pass3(t: T1Block, io: MqIo, p: Int): Unit = {
    var y0 = 0
    while (y0 < t.h) {
      var x = 0
      while (x < t.w) {
        var y = y0
        // run-length mode: full stripe column, all four insignificant,
        // unvisited, with entirely insignificant neighbourhoods
        val full = y0 + 4 <= t.h
        var rl = full
        if (full) {
          var k = y0
          while (rl && k < y0 + 4) {
            val i = t.at(x, k)
            if (t.sig(i) || t.visited(i)) rl = false
            else {
              val (hh, vv, dd) = t.counts(x, k)
              if (hh + vv + dd > 0) rl = false
            }
            k += 1
          }
        }
        if (rl) {
          val any = io.bit(CtxRl, {
            var a = 0; var k = y0
            while (k < y0 + 4) { if (((t.mag(t.at(x, k)) >>> p) & 1) == 1) a = 1; k += 1 }
            a
          })
          if (any == 0) y = y0 + 4 // whole column confirmed zero
          else {
            val r = {
              val hi = io.bit(CtxUni, {
                var k = y0
                while (((t.mag(t.at(x, k)) >>> p) & 1) == 0) k += 1
                ((k - y0) >> 1) & 1
              })
              val lo = io.bit(CtxUni, {
                var k = y0
                while (((t.mag(t.at(x, k)) >>> p) & 1) == 0) k += 1
                (k - y0) & 1
              })
              (hi << 1) | lo
            }
            codeSign(t, io, x, y0 + r, p)
            y = y0 + r + 1
          }
        }
        while (y < math.min(y0 + 4, t.h)) {
          val i = t.at(x, y)
          if (!t.sig(i) && !t.visited(i)) {
            val (hh, vv, dd) = t.counts(x, y)
            val cx = zcContext(t.orient, hh, vv, dd)
            val b = io.bit(cx, (t.mag(i) >>> p) & 1)
            if (b == 1) codeSign(t, io, x, y, p)
          }
          y += 1
        }
        x += 1
      }
      y0 += 4
    }
    java.util.Arrays.fill(t.visited, false)
  }

  /** Run `nPasses` coding passes starting from the MSB plane
    * `planes - 1` (first plane: clean-up only). */
  private def tier1(t: T1Block, io: MqIo, planes: Int, nPasses: Int): Unit = {
    var done = 0
    var p = planes - 1
    while (p >= 0 && done < nPasses) {
      if (p < planes - 1) {
        if (done < nPasses) { pass1(t, io, p); done += 1 }
        if (done < nPasses) { pass2(t, io, p); done += 1 }
      }
      if (done < nPasses) { pass3(t, io, p); done += 1 }
      p -= 1
    }
  }

  // ----------------------------------------------------------------
  // Geometry: subbands and code blocks.
  // ----------------------------------------------------------------
  /** One subband: orientation, top-left position in the coefficient
    * plane, and dimensions. Resolution r of NL levels carries LL at
    * r=0 and (HL, LH, HH) of decomposition level NL-r+1 for r>=1. */
  private final case class Band(orient: Int, x0: Int, y0: Int, w: Int, h: Int, gain: Int)

  private def bandsFor(w: Int, h: Int, levels: Int): Array[Array[Band]] = {
    val res = new Array[Array[Band]](levels + 1)
    res(0) = Array(Band(0, 0, 0, sizeAt(w, levels), sizeAt(h, levels), 0))
    var r = 1
    while (r <= levels) {
      val l = levels - r + 1 // decomposition level of these bands
      val pw = sizeAt(w, l - 1); val ph = sizeAt(h, l - 1)
      val lw = (pw + 1) / 2; val lh = (ph + 1) / 2
      val hw = pw / 2; val hh = ph / 2
      res(r) = Array(
        Band(1, lw, 0, hw, lh, 1), // HL: horizontally high-pass
        Band(2, 0, lh, lw, hh, 1), // LH
        Band(3, lw, lh, hw, hh, 2)) // HH
      r += 1
    }
    res
  }

  private final case class Cblk(bx: Int, by: Int, x0: Int, y0: Int, w: Int, h: Int)

  private def cblksFor(b: Band, cbw: Int, cbh: Int): Array[Cblk] = {
    if (b.w == 0 || b.h == 0) return Array.empty
    val nx = (b.w + cbw - 1) / cbw; val ny = (b.h + cbh - 1) / cbh
    val out = new Array[Cblk](nx * ny)
    var j = 0
    var by = 0
    while (by < ny) {
      var bx = 0
      while (bx < nx) {
        val x0 = bx * cbw; val y0 = by * cbh
        out(j) = Cblk(bx, by, x0, y0, math.min(cbw, b.w - x0), math.min(cbh, b.h - y0))
        j += 1; bx += 1
      }
      by += 1
    }
    out
  }

  private val GuardBits = 2
  private def mbFor(bits: Int, gain: Int): Int = GuardBits + (bits + gain) - 1

  // ----------------------------------------------------------------
  // Number-of-passes codeword (B.10.6) and Lblock lengths (B.10.7).
  // ----------------------------------------------------------------
  private def writeNumPasses(bw: BitWriter, n: Int): Unit = {
    require(n >= 1 && n <= 164, s"coding passes out of range: $n")
    if (n == 1) bw.bit(0)
    else if (n == 2) { bw.bit(1); bw.bit(0) }
    else if (n <= 5) { bw.bits(3, 2); bw.bits(n - 3, 2) }
    else if (n <= 36) { bw.bits(0xf, 4); bw.bits(n - 6, 5) }
    else { bw.bits(0x1ff, 9); bw.bits(n - 37, 7) }
  }
  private def readNumPasses(br: BitReader): Int = {
    if (br.bit() == 0) 1
    else if (br.bit() == 0) 2
    else {
      val t = br.bits(2)
      if (t < 3) 3 + t
      else {
        val u = br.bits(5)
        if (u < 31) 6 + u
        else 37 + br.bits(7)
      }
    }
  }
  private def log2floor(n: Int): Int = 31 - Integer.numberOfLeadingZeros(n)

  // ----------------------------------------------------------------
  // Reversible multi-component transform (T.800 G.2): RCT, the
  // integer YCbCr analog that pairs with the 5/3 filter. Forward maps
  // level-shifted (R, G, B) planes in place to (Y, Cb, Cr); chroma
  // gains one bit of dynamic range (the QCD base accounts for it).
  // Both directions are exact integer maps, so RCT color streams
  // round-trip bit-exactly like grayscale.
  // ----------------------------------------------------------------
  private def fwdRct(p0: Array[Int], p1: Array[Int], p2: Array[Int]): Unit = {
    var i = 0
    while (i < p0.length) {
      val r = p0(i); val g = p1(i); val b = p2(i)
      p0(i) = (r + 2 * g + b) >> 2 // Y (arithmetic shift = floor, G.2)
      p1(i) = b - g // Cb
      p2(i) = r - g // Cr
      i += 1
    }
  }
  private def invRct(p0: Array[Int], p1: Array[Int], p2: Array[Int]): Unit = {
    var i = 0
    while (i < p0.length) {
      val y = p0(i); val cb = p1(i); val cr = p2(i)
      val g = y - ((cb + cr) >> 2)
      p0(i) = cr + g // R
      p1(i) = g
      p2(i) = cb + g // B
      i += 1
    }
  }

  // ----------------------------------------------------------------
  // Tier-2 packets over one tile-component.
  // ----------------------------------------------------------------
  /** Encode one LRCP packet: the `bands` of one resolution of a
    * tile-component whose DWT coefficient plane is `plane`
    * (`pw`-stride, canonical subband layout). `mbOf` gives each
    * band's bit-plane count Mb (derived from the QCD the caller
    * writes: bits+gain for the reversible path, the quantizer
    * exponent for the irreversible one). */
  private def encodePacket(plane: Array[Int], pw: Int, bands: Array[Band],
                           cbw: Int, cbh: Int, mbOf: Band => Int): Array[Byte] = {
    val bw = new BitWriter
    bw.bit(1) // non-empty packet
    val bodies = new ArrayBuffer[Array[Byte]]
    for (band <- bands; if band.w > 0 && band.h > 0) {
      val mb = mbOf(band)
      val blocks = cblksFor(band, cbw, cbh)
      val nx = (band.w + cbw - 1) / cbw; val ny = (band.h + cbh - 1) / cbh
      val incl = new TagTree(nx, ny); val zbp = new TagTree(nx, ny)
      val coded = blocks.map { cb =>
        val t = new T1Block(cb.w, cb.h, band.orient)
        var maxMag = 0
        var y = 0
        while (y < cb.h) {
          var x = 0
          while (x < cb.w) {
            val v = plane((band.y0 + cb.y0 + y) * pw + (band.x0 + cb.x0 + x))
            val m = math.abs(v)
            t.mag(t.at(x, y)) = m
            t.sgn(t.at(x, y)) = if (v < 0) 1 else 0
            if (m > maxMag) maxMag = m
            x += 1
          }
          y += 1
        }
        require(maxMag < (1 << mb), s"coefficient magnitude $maxMag overflows Mb=$mb")
        if (maxMag == 0) None
        else {
          val planes = log2floor(maxMag) + 1
          val nPasses = 3 * planes - 2
          val enc = new MqEncoder
          tier1(t, new EncIo(enc), planes, nPasses)
          Some((enc.finish(), nPasses, mb - planes))
        }
      }
      var j = 0
      while (j < blocks.length) {
        incl.value(j) = if (coded(j).isDefined) 0 else 1
        zbp.value(j) = coded(j).map(_._3).getOrElse(mb)
        j += 1
      }
      incl.build(); zbp.build()
      j = 0
      while (j < blocks.length) {
        incl.encode(bw, j, 1)
        coded(j) match {
          case None => ()
          case Some((data, nPasses, missing)) =>
            zbp.encode(bw, j, missing + 1)
            writeNumPasses(bw, nPasses)
            // Lblock signalling: one codeword segment
            var lblock = 3
            val lenBitsAvail = () => lblock + log2floor(nPasses)
            val need = if (data.length == 0) 1 else log2floor(data.length) + 1
            var extra = 0
            while (lenBitsAvail() < need) { lblock += 1; extra += 1 }
            var k = 0
            while (k < extra) { bw.bit(1); k += 1 }
            bw.bit(0)
            bw.bits(data.length, lenBitsAvail())
            bodies += data
        }
        j += 1
      }
    }
    val header = bw.finish()
    val pk = new ByteArrayOutputStream()
    pk.write(header, 0, header.length)
    bodies.foreach(b => pk.write(b, 0, b.length))
    pk.toByteArray
  }

  /** Decode one LRCP packet at `p0` into `plane` (`pw`-stride
    * canonical subband layout); `mbAt` gives Mb per band index within
    * the resolution. Returns the position after the packet's
    * code-block bodies. */
  private def decodePacket(data: Array[Byte], p0: Int, bands: Array[Band],
                           plane: Array[Int], pw: Int, cbw: Int, cbh: Int,
                           mbAt: Int => Int, path: String): Int = {
    val br = new BitReader(data, p0)
    val nonEmpty = br.bit()
    if (nonEmpty == 0) return br.align()
    val toDecode = new ArrayBuffer[(Band, Cblk, Int, Int, Int)] // band, cblk, planes, passes, length
    for ((band, bandIdx) <- bands.zipWithIndex; if band.w > 0 && band.h > 0) {
      val mb = mbAt(bandIdx)
      val blocks = cblksFor(band, cbw, cbh)
      val nx = (band.w + cbw - 1) / cbw; val ny = (band.h + cbh - 1) / cbh
      val incl = new TagTree(nx, ny); val zbp = new TagTree(nx, ny)
      var j = 0
      while (j < blocks.length) {
        val included = incl.decode(br, j, 1)
        if (included) {
          val missing = zbp.decodeValue(br, j)
          require(missing <= mb, s"zero-bit-planes $missing exceeds Mb=$mb in $path")
          val nPasses = readNumPasses(br)
          var lblock = 3
          while (br.bit() == 1) lblock += 1
          val lenBits = lblock + log2floor(nPasses)
          val dataLen = br.bits(lenBits)
          toDecode += ((band, blocks(j), mb - missing, nPasses, dataLen))
        }
        j += 1
      }
    }
    var p = br.align()
    for ((band, cb, nPlanes, nPasses, dataLen) <- toDecode) {
      require(p + dataLen <= data.length, s"truncated code-block data in $path")
      val seg = java.util.Arrays.copyOfRange(data, p, p + dataLen)
      p += dataLen
      require(nPlanes >= 1 && nPasses <= 3 * nPlanes - 2,
        s"inconsistent pass count $nPasses for $nPlanes planes in $path")
      val t = new T1Block(cb.w, cb.h, band.orient)
      tier1(t, new DecIo(new MqDecoder(seg)), nPlanes, nPasses)
      var y = 0
      while (y < cb.h) {
        var x = 0
        while (x < cb.w) {
          val i = t.at(x, y)
          val v = if (t.sgn(i) == 1) -t.mag(i) else t.mag(i)
          plane((band.y0 + cb.y0 + y) * pw + (band.x0 + cb.x0 + x)) = v
          x += 1
        }
        y += 1
      }
    }
    p
  }

  // ----------------------------------------------------------------
  // Encoder
  // ----------------------------------------------------------------
  /** Encode unsigned `bits`-deep samples as a lossless JPEG 2000
    * codestream. `levels` decomposition levels (0 = no transform);
    * code-block size 2^cbxExp x 2^cbyExp. `tileW`/`tileH` > 0 split
    * the image into a tile grid (each tile an independent codestream
    * region — the layout real encoders use so a reader can decode a
    * region without the whole image); 0 keeps one whole-image tile.
    * Interior tile dims must be multiples of cb·2^levels so tile
    * origins stay even at every lifting level and code-block-aligned
    * (see the decoder's profile note). */
  def encode(vals: Array[Int], w: Int, h: Int, bits: Int,
             levels: Int = 2, cbxExp: Int = 6, cbyExp: Int = 6,
             tileW: Int = 0, tileH: Int = 0): Array[Byte] =
    encodeMulti(Array(vals), w, h, bits, levels, cbxExp, cbyExp, rct = false,
      tileW, tileH)

  /** Encode three equal-sized `bits`-deep unsigned R, G, B planes as
    * one lossless 3-component codestream. `rct` (the default) applies
    * the reversible color transform (G.2) — the YBR_RCT shape DICOM
    * prescribes for color JPEG 2000 Lossless; `rct = false` writes
    * the components untransformed (PhotometricInterpretation RGB).
    * Either way the round trip is bit-exact. */
  def encodeRgb(rp: Array[Int], gp: Array[Int], bp: Array[Int], w: Int, h: Int,
                bits: Int = 8, levels: Int = 2, cbxExp: Int = 6, cbyExp: Int = 6,
                tileW: Int = 0, tileH: Int = 0, rct: Boolean = true): Array[Byte] =
    encodeMulti(Array(rp, gp, bp), w, h, bits, levels, cbxExp, cbyExp, rct,
      tileW, tileH)

  private def encodeMulti(comps: Array[Array[Int]], w: Int, h: Int, bits: Int,
                          levels: Int, cbxExp: Int, cbyExp: Int, rct: Boolean,
                          tileW0: Int, tileH0: Int): Array[Byte] = {
    require(w > 0 && h > 0 && comps.nonEmpty && comps.forall(_.length == w * h),
      "bad image geometry")
    require(bits >= 1 && bits <= 16, s"unsupported precision $bits")
    require(levels >= 0 && levels <= 32, s"bad decomposition levels $levels")
    require(cbxExp >= 2 && cbyExp >= 2 && cbxExp + cbyExp <= 12,
      s"bad code-block size 2^$cbxExp x 2^$cbyExp")
    require(!rct || comps.length == 3, "RCT requires exactly 3 components")
    val tw0 = if (tileW0 <= 0) w else tileW0
    val th0 = if (tileH0 <= 0) h else tileH0
    require(tw0 > 0 && th0 > 0, s"bad tile size ${tw0}x$th0")
    val cbw = 1 << cbxExp; val cbh = 1 << cbyExp
    val tilesX = (w + tw0 - 1) / tw0; val tilesY = (h + th0 - 1) / th0
    // Long shift: an Int `cbw << levels` wraps at levels >= 28 (shift
    // counts mask mod 32), which would let an unalignable grid pass
    val unitX = cbw.toLong << levels; val unitY = cbh.toLong << levels
    if (tilesX > 1) require(tw0 % unitX == 0,
      s"tile width $tw0 must be a multiple of $unitX " +
        "(tile origins must stay even at every lifting level and code-block-aligned)")
    if (tilesY > 1) require(th0 % unitY == 0,
      s"tile height $th0 must be a multiple of $unitY " +
        "(tile origins must stay even at every lifting level and code-block-aligned)")
    val shift = 1 << (bits - 1) // DC level shift (E.3), before any MCT
    val planes = comps.map { c =>
      val a = new Array[Int](w * h)
      var i = 0
      while (i < a.length) {
        require(c(i) >= 0 && c(i) < (1 << bits), s"sample out of $bits-bit range: ${c(i)}")
        a(i) = c(i) - shift; i += 1
      }
      a
    }
    if (rct) fwdRct(planes(0), planes(1), planes(2))
    val qBase = if (rct) bits + 1 else bits // chroma head-room under RCT

    val tileBytes = new Array[Array[Byte]](tilesX * tilesY)
    var t = 0
    while (t < tileBytes.length) {
      val tx = t % tilesX; val ty = t / tilesX
      val tw = math.min(tw0, w - tx * tw0); val th = math.min(th0, h - ty * th0)
      val allBands = bandsFor(tw, th, levels)
      val perComp = planes.map { pl =>
        val tp = new Array[Int](tw * th)
        var y = 0
        while (y < th) {
          System.arraycopy(pl, (ty * th0 + y) * w + tx * tw0, tp, y * tw, tw)
          y += 1
        }
        fdwt(tp, tw, th, levels)
        tp
      }
      // LRCP: layer (1), then resolution, then component, then
      // position (1 precinct) — B.12.1.1
      val pk = new ByteArrayOutputStream()
      for (r <- 0 to levels; c <- planes.indices) {
        val bytes = encodePacket(perComp(c), tw, allBands(r), cbw, cbh,
          b => mbFor(qBase, b.gain))
        pk.write(bytes, 0, bytes.length)
      }
      tileBytes(t) = pk.toByteArray
      t += 1
    }

    val qcd = new ByteArrayOutputStream()
    qcd.write(GuardBits << 5) // Sqcd: style 0 (no quantization)
    qcd.write((qBase << 3) & 0xff) // epsilon for LL
    for (_ <- 1 to levels) {
      qcd.write(((qBase + 1) << 3) & 0xff); qcd.write(((qBase + 1) << 3) & 0xff)
      qcd.write(((qBase + 2) << 3) & 0xff)
    }
    writeCodestream(w, h, tw0, th0, bits, comps.length, if (rct) 1 else 0,
      levels, cbxExp, cbyExp, transform = 1, qcd.toByteArray, tileBytes)
  }

  /** Assemble a complete codestream (Annex A): SOC + main header
    * (SIZ/COD/QCD) + one SOT/SOD tile-part per tile + EOC. `qcd` is
    * the QCD payload starting at the Sqcd byte. */
  private def writeCodestream(w: Int, h: Int, tw0: Int, th0: Int, bits: Int,
                              ncomp: Int, mct: Int, levels: Int, cbxExp: Int,
                              cbyExp: Int, transform: Int, qcd: Array[Byte],
                              tileBytes: Array[Array[Byte]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >>> 8); u8(v) }
    def u32(v: Int): Unit = { u16(v >>> 16); u16(v) }
    u16(0xff4f) // SOC
    u16(0xff51); u16(38 + 3 * ncomp) // SIZ
    u16(0) // Rsiz
    u32(w); u32(h); u32(0); u32(0) // Xsiz Ysiz XOsiz YOsiz
    u32(tw0); u32(th0); u32(0); u32(0) // XTsiz YTsiz XTOsiz YTOsiz
    u16(ncomp) // Csiz
    for (_ <- 0 until ncomp) { u8(bits - 1); u8(1); u8(1) } // Ssiz (unsigned), XRsiz, YRsiz
    u16(0xff52); u16(12) // COD, Lcod
    u8(0) // Scod: default precincts, no SOP/EPH
    u8(0); u16(1); u8(mct) // SGcod: LRCP, 1 layer, MCT flag
    u8(levels); u8(cbxExp - 2); u8(cbyExp - 2); u8(0); u8(transform) // SPcod
    u16(0xff5c); u16(2 + qcd.length) // QCD, Lqcd
    out.write(qcd, 0, qcd.length)
    var t = 0
    while (t < tileBytes.length) {
      u16(0xff90); u16(10) // SOT, Lsot
      u16(t) // Isot (row-major tile order)
      u32(12 + 2 + tileBytes(t).length) // Psot: SOT segment (12) + SOD (2) + packets
      u8(0); u8(1) // TPsot, TNsot: one tile-part per tile
      u16(0xff93) // SOD
      out.write(tileBytes(t), 0, tileBytes(t).length)
      t += 1
    }
    u16(0xffd9) // EOC
    out.toByteArray
  }

  /** Encode unsigned `bits`-deep samples through the IRREVERSIBLE
    * 9/7 path (the lossy stream shape DICOM's JPEG 2000 syntax .91
    * carries): float DWT, uniform scalar deadzone quantization with
    * step `step` (in sample units — larger is coarser) signalled
    * scalar-expounded in the QCD, midpoint reconstruction at the
    * decoder. NOT bit-exact by construction; the per-coefficient
    * error is bounded by the quantizer step. Single component, one
    * whole-image tile. */
  def encode97(vals: Array[Int], w: Int, h: Int, bits: Int, step: Double,
               levels: Int = 2, cbxExp: Int = 6, cbyExp: Int = 6): Array[Byte] = {
    require(w > 0 && h > 0 && vals.length == w * h, "bad image geometry")
    require(bits >= 1 && bits <= 16, s"unsupported precision $bits")
    require(levels >= 0 && levels <= 32, s"bad decomposition levels $levels")
    require(cbxExp >= 2 && cbyExp >= 2 && cbxExp + cbyExp <= 12,
      s"bad code-block size 2^$cbxExp x 2^$cbyExp")
    require(step > 0 && !step.isInfinite, s"bad quantization step $step")
    // signal the stepsize (E.1.1): Δ = 2^(Rb−eps)·(1 + mu/2^11) with
    // Rb = bits (Table E.1: log2 gain 0 for every irreversible band);
    // the encoder then QUANTIZES WITH THE SIGNALLED value so both
    // sides use the identical Δ
    val rb = bits
    val e = math.floor(math.log(step) / math.log(2)).toInt
    val eps = rb - e
    require(eps >= 0 && eps <= 31, s"step $step unsignallable at $bits bits")
    val mu = math.min(2047, math.max(0,
      math.round((step / math.pow(2, e) - 1) * 2048).toInt))
    val delta = math.pow(2, e) * (1 + mu / 2048.0)

    val img = new Array[Double](w * h)
    val shift = 1 << (bits - 1) // DC level shift (E.3)
    var i = 0
    while (i < img.length) {
      require(vals(i) >= 0 && vals(i) < (1 << bits), s"sample out of $bits-bit range: ${vals(i)}")
      img(i) = (vals(i) - shift).toDouble; i += 1
    }
    fdwt97(img, w, h, levels)
    // deadzone quantization to sign-magnitude on the canonical layout
    val qp = new Array[Int](w * h)
    var maxMag = 0
    i = 0
    while (i < img.length) {
      val m = (math.abs(img(i)) / delta).toInt
      qp(i) = if (img(i) < 0) -m else m
      if (m > maxMag) maxMag = m
      i += 1
    }
    // guard bits sized so Mb = G + eps − 1 covers the max magnitude
    val planesNeeded = if (maxMag == 0) 1 else log2floor(maxMag) + 1
    val guard = math.max(2, planesNeeded - eps + 2)
    require(guard <= 7, s"step $step too fine for $bits-bit data (guard $guard > 7)")
    val mb = guard + eps - 1

    val cbw = 1 << cbxExp; val cbh = 1 << cbyExp
    val allBands = bandsFor(w, h, levels)
    val pk = new ByteArrayOutputStream()
    for (r <- 0 to levels) {
      val bytes = encodePacket(qp, w, allBands(r), cbw, cbh, _ => mb)
      pk.write(bytes, 0, bytes.length)
    }
    val qcd = new ByteArrayOutputStream()
    qcd.write((guard << 5) | 2) // Sqcd: scalar expounded
    for (_ <- 0 until 3 * levels + 1) {
      val v = (eps << 11) | mu
      qcd.write((v >>> 8) & 0xff); qcd.write(v & 0xff)
    }
    writeCodestream(w, h, w, h, bits, ncomp = 1, mct = 0, levels, cbxExp,
      cbyExp, transform = 0, qcd.toByteArray, Array(pk.toByteArray))
  }

  // ----------------------------------------------------------------
  // Decoder
  // ----------------------------------------------------------------
  /** Decode a single-component stream of this profile: returns
    * (width, height, precision, unsigned samples). A color stream
    * rejects here — use [[decodeFull]]. */
  def decode(data: Array[Byte], path: String): (Int, Int, Int, Array[Int]) = {
    val (w, h, bits, planes) = decodeFull(data, path)
    require(planes.length == 1,
      s"expected single-component JPEG 2000, got ${planes.length} components in $path")
    (w, h, bits, planes(0))
  }

  /** Decode any stream of this profile: returns (width, height,
    * precision, component planes) — one plane for grayscale, three
    * (R, G, B: the inverse RCT is applied when the stream's COD
    * carries the MCT flag) for color. Multi-tile streams decode tile
    * by tile; interior tile dims must be multiples of cb·2^levels
    * (the power-of-two layouts real encoders emit) so every tile
    * origin is even at every lifting level and code-block-aligned —
    * unaligned tiles change lifting parity and code-block anchoring,
    * so they reject loudly rather than mis-decode. */
  def decodeFull(data: Array[Byte], path: String): (Int, Int, Int, Array[Array[Int]]) = {
    var p = 0
    def u8(): Int = { val v = data(p) & 0xff; p += 1; v }
    def u16(): Int = { val v = ((data(p) & 0xff) << 8) | (data(p + 1) & 0xff); p += 2; v }
    def u32(): Int = { val v = u16(); (v << 16) | u16() }
    require(data.length >= 4 && u16() == 0xff4f, s"not a JPEG 2000 codestream: $path")

    var w = 0; var h = 0; var bits = 0; var ncomp = 0
    var tileW = 0; var tileH = 0; var useRct = false
    var levels = -1; var cbxExp = 0; var cbyExp = 0; var irreversible = false
    var guard = GuardBits; var qcdStyle = 0; var qcdRaw: Array[Byte] = null
    var sawSiz = false; var sawCod = false; var sawQcd = false
    var done = false
    while (!done) {
      require(p + 4 <= data.length, s"truncated JPEG 2000 codestream: $path")
      val marker = u16()
      require((marker & 0xff00) == 0xff00, f"bad JPEG 2000 marker $marker%04x in $path")
      marker match {
        case 0xff51 => // SIZ
          val len = u16(); val end = p + len - 2
          val rsiz = u16()
          require(rsiz == 0 || rsiz == 1 || rsiz == 2, s"unsupported Rsiz $rsiz in $path")
          val xs = u32(); val ys = u32(); val xo = u32(); val yo = u32()
          val xt = u32(); val yt = u32(); val xto = u32(); val yto = u32()
          require(xo == 0 && yo == 0 && xto == 0 && yto == 0,
            s"non-zero image/tile offsets unsupported in $path")
          require(xt > 0 && yt > 0, s"bad tile size ${xt}x$yt in $path")
          val csiz = u16()
          require(csiz >= 1 && csiz <= 4, s"unsupported component count $csiz in $path")
          ncomp = csiz
          var c = 0
          while (c < csiz) {
            val ssiz = u8()
            require((ssiz & 0x80) == 0, s"signed JPEG 2000 samples unsupported in $path")
            val bc = (ssiz & 0x7f) + 1
            if (c == 0) bits = bc
            else require(bc == bits, s"mixed component precisions unsupported in $path")
            val xr = u8(); val yr = u8()
            require(xr == 1 && yr == 1, s"subsampled components unsupported in $path")
            c += 1
          }
          require(bits <= 16, s"JPEG 2000 precision $bits unsupported in $path")
          w = xs; h = ys; tileW = math.min(xt, w); tileH = math.min(yt, h)
          require(w > 0 && h > 0 && w.toLong * h <= (1L << 28), s"bad JPEG 2000 geometry in $path")
          sawSiz = true; p = end
        case 0xff52 => // COD
          val len = u16(); val end = p + len - 2
          val scod = u8()
          require((scod & 0x07) == 0, s"precinct/SOP/EPH COD options unsupported in $path")
          val order = u8()
          require(order == 0, s"only LRCP progression supported, got $order in $path")
          val layers = u16()
          require(layers == 1, s"only single-layer streams supported, got $layers in $path")
          val mct = u8()
          require(mct == 0 || mct == 1, s"bad MCT flag $mct in $path")
          useRct = mct == 1
          levels = u8()
          require(levels <= 32, s"bad decomposition level count $levels in $path")
          cbxExp = u8() + 2; cbyExp = u8() + 2
          require(cbxExp + cbyExp <= 12, s"bad code-block size in $path")
          val cstyle = u8()
          require(cstyle == 0, s"code-block style options unsupported in $path")
          val transform = u8()
          require(transform == 0 || transform == 1, s"bad transform byte $transform in $path")
          irreversible = transform == 0
          sawCod = true; p = end
        case 0xff5c => // QCD: style + guard bits + per-band exponents
          val len = u16(); val end = p + len - 2
          val sqcd = u8()
          qcdStyle = sqcd & 0x1f
          require(qcdStyle == 0 || qcdStyle == 2,
            s"QCD style $qcdStyle unsupported (no-quantization or scalar-expounded) in $path")
          guard = (sqcd >>> 5) & 0x7
          qcdRaw = java.util.Arrays.copyOfRange(data, p, end)
          sawQcd = true; p = end
        case 0xff90 => done = true // SOT: the tile loop takes over
        case 0xff64 | 0xff63 => // COM / CRG: informational, skip
          val len = u16(); p += len - 2
        case 0xff55 | 0xff57 | 0xff58 => // TLM / PLM / PLT: pointer info, skip
          val len = u16(); p += len - 2
        case other =>
          // anything that would CHANGE decoding (RGN, POC, COC, QCC,
          // PPM/PPT, ...) rejects loudly rather than mis-decoding
          throw new IllegalArgumentException(f"unsupported JPEG 2000 marker $other%04x in $path")
      }
    }
    require(sawSiz && sawCod && sawQcd, s"missing SIZ/COD/QCD in $path")
    require(!useRct || ncomp == 3, s"MCT flag with $ncomp components in $path")
    require(!(useRct && irreversible),
      s"irreversible color (ICT) unsupported in $path")
    // the QCD style must match the transform: style 0 (no quantization)
    // pairs with the reversible 5/3, style 2 (scalar expounded) with
    // the irreversible 9/7 — a cross pairing cannot decode correctly
    require(qcdStyle == (if (irreversible) 2 else 0),
      s"QCD style $qcdStyle inconsistent with the COD transform in $path")
    val (expBytes, muArr) =
      if (qcdStyle == 0) (qcdRaw.map(b => (b & 0xff) >>> 3), Array.empty[Int])
      else {
        require(qcdRaw.length % 2 == 0, s"odd scalar-expounded QCD length in $path")
        val v = Array.tabulate(qcdRaw.length / 2)(i =>
          ((qcdRaw(2 * i) & 0xff) << 8) | (qcdRaw(2 * i + 1) & 0xff))
        (v.map(_ >>> 11), v.map(_ & 0x7ff))
      }
    require(expBytes.length >= 3 * levels + 1,
      s"QCD carries ${expBytes.length} exponents for $levels levels in $path")
    def qcdIdx(r: Int, bandIdx: Int): Int = if (r == 0) 0 else 1 + (r - 1) * 3 + bandIdx
    // Mb per subband from the stream's own QCD (E.1): Mb = G + eps - 1,
    // exponents in subband order LL, then (HL, LH, HH) per resolution
    def mbAt(r: Int, bandIdx: Int): Int = {
      val mb = guard + expBytes(qcdIdx(r, bandIdx)) - 1
      require(mb >= 1 && mb <= 30, s"bad bit-plane count $mb from QCD in $path")
      mb
    }
    // E.1.1: Δb = 2^(Rb − eps)·(1 + mu/2^11), Rb = bits (log2 gain 0
    // for every irreversible band, Table E.1)
    def deltaAt(r: Int, bandIdx: Int): Double = {
      val i = qcdIdx(r, bandIdx)
      math.pow(2, bits - expBytes(i)) * (1 + muArr(i) / 2048.0)
    }

    val cbw = 1 << cbxExp; val cbh = 1 << cbyExp
    val tilesX = (w + tileW - 1) / tileW; val tilesY = (h + tileH - 1) / tileH
    // Long shift: an Int `cbw << levels` wraps at levels >= 28, which
    // would turn this loud reject into a silent mis-decode
    val unitX = cbw.toLong << levels; val unitY = cbh.toLong << levels
    if (tilesX > 1) require(tileW % unitX == 0,
      s"tile width $tileW not a multiple of $unitX in $path " +
        "(unaligned tiles change lifting parity and code-block anchoring)")
    if (tilesY > 1) require(tileH % unitY == 0,
      s"tile height $tileH not a multiple of $unitY in $path " +
        "(unaligned tiles change lifting parity and code-block anchoring)")
    val nTiles = tilesX * tilesY
    val seen = new Array[Boolean](nTiles)
    val compPlanes = Array.fill(ncomp)(new Array[Int](w * h))

    var more = true
    while (more) {
      // the SOT marker itself was already consumed (by the header
      // loop for the first tile, by the tail of this loop after)
      val sotStart = p - 2
      val lsot = u16()
      require(lsot == 10, s"bad Lsot $lsot in $path")
      val isot = u16(); val psot = u32(); val tpsot = u8(); val tnsot = u8()
      require(tpsot == 0 && (tnsot == 0 || tnsot == 1),
        s"multiple tile-parts per tile unsupported in $path")
      require(isot < nTiles && !seen(isot), s"bad tile index $isot (of $nTiles) in $path")
      seen(isot) = true
      require(psot > 12 + 2 && sotStart + psot <= data.length, s"bad Psot $psot in $path")
      // tile-part header: pointer/comment markers skip; anything that
      // would change decoding (COD/COC/QCD/QCC/POC/PPT) rejects
      var m = u16()
      while (m == 0xff58 || m == 0xff64) { val l = u16(); p += l - 2; m = u16() }
      require(m == 0xff93, f"unsupported tile-part marker $m%04x in $path")
      val tx = isot % tilesX; val ty = isot / tilesX
      val tw = math.min(tileW, w - tx * tileW); val th = math.min(tileH, h - ty * tileH)
      val allBands = bandsFor(tw, th, levels)
      val tilePlanes = Array.fill(ncomp)(new Array[Int](tw * th))
      for (r <- 0 to levels; c <- 0 until ncomp)
        p = decodePacket(data, p, allBands(r), tilePlanes(c), tw, cbw, cbh,
          bi => mbAt(r, bi), path)
      require(p == sotStart + psot,
        s"tile $isot data length does not match Psot $psot in $path")
      var c = 0
      while (c < ncomp) {
        if (irreversible) {
          // dequantize with midpoint reconstruction, float inverse
          // transform, round back to the integer assembly plane
          val dp = new Array[Double](tw * th)
          for (r <- 0 to levels; (band, bi) <- allBands(r).zipWithIndex
               if band.w > 0 && band.h > 0) {
            val d = deltaAt(r, bi)
            var yy = 0
            while (yy < band.h) {
              var xx = 0
              while (xx < band.w) {
                val idx = (band.y0 + yy) * tw + (band.x0 + xx)
                val q = tilePlanes(c)(idx)
                dp(idx) =
                  if (q == 0) 0.0
                  else if (q > 0) (q + 0.5) * d
                  else -((-q + 0.5) * d)
                xx += 1
              }
              yy += 1
            }
          }
          idwt97(dp, tw, th, levels)
          var i2 = 0
          while (i2 < dp.length) {
            tilePlanes(c)(i2) = math.floor(dp(i2) + 0.5).toInt; i2 += 1
          }
        } else idwt(tilePlanes(c), tw, th, levels)
        var y = 0
        while (y < th) {
          System.arraycopy(tilePlanes(c), y * tw,
            compPlanes(c), (ty * tileH + y) * w + tx * tileW, tw)
          y += 1
        }
        c += 1
      }
      val nm = u16()
      if (nm == 0xffd9) more = false // EOC
      else require(nm == 0xff90, f"unexpected marker $nm%04x after tile data in $path")
    }
    require(seen.forall(identity), s"codestream is missing tiles in $path")
    if (useRct) invRct(compPlanes(0), compPlanes(1), compPlanes(2))
    val shift = 1 << (bits - 1)
    val maxV = (1 << bits) - 1
    for (pl <- compPlanes) {
      var i = 0
      while (i < pl.length) {
        val v = pl(i) + shift
        // lossless decoding out of range means corruption — reject;
        // the lossy path's quantization noise legally overshoots the
        // range at sharp edges, so it clamps (E.3's decoder clamp)
        if (irreversible) pl(i) = math.max(0, math.min(maxV, v))
        else {
          require(v >= 0 && v <= maxV, s"decoded sample $v outside $bits-bit range in $path")
          pl(i) = v
        }
        i += 1
      }
    }
    (w, h, bits, compPlanes)
  }
}
