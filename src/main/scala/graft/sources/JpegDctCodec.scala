package graft.sources

import java.io.ByteArrayOutputStream

/** Native single-component sequential-DCT JPEG codec (ITU-T T.81):
  * SOF0 Baseline (8-bit) and SOF1 Extended Sequential (8/12-bit) —
  * the decode half of the DICOM JPEG Extended (Process 2 & 4)
  * transfer syntax `1.2.840.10008.1.2.4.51`, which real PACS
  * archives use for 12-bit CT/MR exports the Baseline syntax cannot
  * carry (the reference reads these through spark-scifio,
  * /root/reference/pom.xml:60-64, exercised by IjRDDTests.scala:30-99).
  *
  * This is a LOSSY class by construction (DCT quantization): like the
  * Baseline path it stays out of the hash gate and the lossless
  * series rotation; the property tests bound the error instead of
  * demanding bit equality.
  *
  * Decoder scope: grayscale interchange streams — one component, any
  * DQT (8- or 16-bit entries) and any DHT the stream declares
  * (tables keyed by class+id, so third-party optimized-table streams
  * decode), precision 2..12, restart intervals (DRI/RSTn) honoured.
  * Progressive (SOF2), arithmetic coding, and multi-component scans
  * reject loudly rather than mis-decode.
  *
  * Encoder scope: quant table all-ones (max quality — the only loss
  * is coefficient rounding, plus magnitude clamping to the T.81
  * category limits that only adversarial inputs reach), flat
  * canonical Huffman tables (all DC categories at one code length,
  * all 226 AC run/size symbols at length 8 — complete, conformant,
  * and single-pass; a per-image optimal table would shave bits but
  * the DECODER reads whatever the file declares).
  */
private[graft] object JpegDctCodec {

  // ---- 8-point DCT basis (double) ----------------------------------
  private val cosT: Array[Double] = {
    val t = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var x = 0
      while (x < 8) {
        t(u * 8 + x) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
        x += 1
      }
      u += 1
    }
    t
  }
  private def cc(u: Int): Double = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0

  /** Forward 2-D DCT of one 8x8 block (T.81 A.3.3), in place. */
  private def fdct(b: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            s += b(y * 8 + x) * cosT(u * 8 + x) * cosT(v * 8 + y)
            x += 1
          }
          y += 1
        }
        out(v * 8 + u) = 0.25 * cc(u) * cc(v) * s
        u += 1
      }
      v += 1
    }
    out
  }

  /** Inverse 2-D DCT of one 8x8 coefficient block. */
  private def idct(c: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            s += cc(u) * cc(v) * c(v * 8 + u) * cosT(u * 8 + x) * cosT(v * 8 + y)
            u += 1
          }
          v += 1
        }
        out(y * 8 + x) = 0.25 * s
        x += 1
      }
      y += 1
    }
    out
  }

  /** Zig-zag order: zigzag(k) = raster index of the k-th coefficient. */
  private val zigzag: Array[Int] = {
    val z = new Array[Int](64)
    var k = 0
    var d = 0
    while (d < 15) {
      val range = if (d % 2 == 0) (math.min(d, 7) to math.max(0, d - 7) by -1)
                  else (math.max(0, d - 7) to math.min(d, 7))
      range.foreach { y => z(k) = y * 8 + (d - y); k += 1 }
      d += 1
    }
    z
  }

  private def ssssOf(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  // ==================== encoder =====================================

  /** MSB-first bit writer with 0xFF→0xFF00 stuffing (same discipline
    * as the lossless encoder's; duplicated here because that one is
    * private to ImageCodecIO and two 20-line classes beat a
    * visibility widening). */
  private final class BitWriter(bos: ByteArrayOutputStream) {
    private var acc = 0; private var nBits = 0
    def put(value: Int, bits: Int): Unit = {
      var b = bits - 1
      while (b >= 0) {
        acc = (acc << 1) | ((value >>> b) & 1); nBits += 1
        if (nBits == 8) {
          bos.write(acc)
          if (acc == 0xff) bos.write(0x00)
          acc = 0; nBits = 0
        }
        b -= 1
      }
    }
    def flush(): Unit = if (nBits > 0) put(0xff, 8 - nBits)
  }

  /** Encode one single-component frame. `precision` 8 → SOF0
    * Baseline; 12 → SOF1 Extended (the DICOM .51 profile). Values
    * must already sit in [0, 2^precision). */
  def encode(vals: Array[Int], w: Int, h: Int, precision: Int): Array[Byte] = {
    require(precision == 8 || precision == 12,
      s"JPEG DCT encoder speaks precision 8 or 12, got $precision")
    require(vals.length == w * h, "pixel count mismatch")
    val maxDcCat = if (precision == 8) 11 else 15
    val maxAcCat = if (precision == 8) 10 else 14
    val bos = new ByteArrayOutputStream()
    def marker(m: Int): Unit = { bos.write(0xff); bos.write(m) }
    def u16(v: Int): Unit = { bos.write((v >> 8) & 0xff); bos.write(v & 0xff) }
    marker(0xd8) // SOI
    // DQT: all-ones table, id 0; 12-bit frames need Pq=1 (16-bit
    // entries) only when an entry exceeds 255 — ones don't, but T.81
    // allows Pq=0 for any frame, so use the compact form
    marker(0xdb); u16(2 + 1 + 64); bos.write(0x00)
    (0 until 64).foreach(_ => bos.write(1))
    // SOF0 / SOF1
    marker(if (precision == 8) 0xc0 else 0xc1)
    u16(11); bos.write(precision); u16(h); u16(w); bos.write(1)
    bos.write(1); bos.write(0x11); bos.write(0) // comp 1, 1x1, Tq=0
    // DHT class 0 id 0: DC categories 0..maxDcCat, all at length 5
    // (≤16 symbols fit; all-ones code stays unused)
    marker(0xc4); u16(2 + 1 + 16 + (maxDcCat + 1)); bos.write(0x00)
    (1 to 16).foreach(l => bos.write(if (l == 5) maxDcCat + 1 else 0))
    (0 to maxDcCat).foreach(bos.write)
    // DHT class 1 id 0: EOB, ZRL and every (run 0..15, size 1..maxAcCat)
    // pair, all at length 8 (≤ 226 symbols of 256; code 255 unused)
    val acSymbols = Array(0x00, 0xf0) ++
      (for (r <- 0 to 15; s <- 1 to maxAcCat) yield (r << 4) | s)
    require(acSymbols.length < 256, "AC symbol table overflow")
    marker(0xc4); u16(2 + 1 + 16 + acSymbols.length); bos.write(0x10)
    (1 to 16).foreach(l => bos.write(if (l == 8) acSymbols.length else 0))
    acSymbols.foreach(bos.write)
    val acCode = acSymbols.zipWithIndex.toMap // canonical: code == rank at len 8
    // SOS
    marker(0xda); u16(8); bos.write(1); bos.write(1); bos.write(0x00)
    bos.write(0); bos.write(63); bos.write(0x00)
    val bw = new BitWriter(bos)
    val mid = 1 << (precision - 1)
    val bw8 = (w + 7) / 8; val bh8 = (h + 7) / 8
    var prevDc = 0
    val block = new Array[Double](64)
    var by = 0
    while (by < bh8) {
      var bx = 0
      while (bx < bw8) {
        var i = 0
        while (i < 64) {
          // edge-replicated padding keeps partial blocks smooth
          val x = math.min(bx * 8 + i % 8, w - 1)
          val y = math.min(by * 8 + i / 8, h - 1)
          block(i) = vals(y * w + x) - mid
          i += 1
        }
        val coef = fdct(block)
        val q = new Array[Int](64)
        i = 0
        while (i < 64) {
          q(i) = math.round(coef(zigzag(i))).toInt // quant table is all ones
          i += 1
        }
        // clamp into the category limits the tables can express —
        // only adversarial (checkerboard-at-full-range) inputs reach
        // them; the clamp adds bounded error to a lossy class
        val dcCap = (1 << maxDcCat) - 1
        val acCap = (1 << maxAcCat) - 1
        var diff = q(0) - prevDc
        if (diff > dcCap) { diff = dcCap } else if (diff < -dcCap) diff = -dcCap
        prevDc += diff
        val sDc = ssssOf(diff)
        bw.put(sDc, 5)
        if (sDc > 0) bw.put(if (diff >= 0) diff else diff - 1, sDc)
        var k = 1
        while (k < 64) {
          var run = 0
          while (k < 64 && q(k) == 0) { run += 1; k += 1 }
          if (k == 64) {
            bw.put(acCode(0x00), 8) // EOB
          } else {
            while (run >= 16) { bw.put(acCode(0xf0), 8); run -= 16 } // ZRL
            var v = q(k)
            if (v > acCap) v = acCap else if (v < -acCap) v = -acCap
            val s = ssssOf(v)
            bw.put(acCode((run << 4) | s), 8)
            bw.put(if (v >= 0) v else v - 1, s)
            k += 1
          }
        }
        bx += 1
      }
      by += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    bos.toByteArray
  }

  // ==================== decoder =====================================

  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    private val minCode = new Array[Int](17)
    private val maxCode = Array.fill(17)(-1)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        if (bits(l - 1) > 0) {
          valPtr(l) = k; minCode(l) = code
          code += bits(l - 1); k += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1; l += 1
      }
    }
    def decode(br: BitReader, path: String): Int = {
      var code = br.bit(); var l = 1
      while (l <= 16 && (maxCode(l) < 0 || code > maxCode(l))) {
        code = (code << 1) | br.bit(); l += 1
      }
      require(l <= 16, s"invalid Huffman code in JPEG stream in $path")
      vals(valPtr(l) + code - minCode(l))
    }
  }

  /** MSB-first reader over the entropy segment: un-stuffs 0xFF00 and
    * treats RSTn markers as byte-aligned resynchronization points
    * (call [[restart]] to consume one). */
  private final class BitReader(src: Array[Byte], private var pos: Int,
                                path: String) {
    private var acc = 0; private var nBits = 0
    def bit(): Int = {
      if (nBits == 0) {
        require(pos < src.length, s"truncated JPEG entropy data in $path")
        val b = src(pos) & 0xff; pos += 1
        if (b == 0xff) {
          require(pos < src.length && src(pos) == 0x00,
            s"unexpected marker inside JPEG entropy data in $path")
          pos += 1
        }
        acc = b; nBits = 8
      }
      nBits -= 1
      (acc >>> nBits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Byte-align and consume one RSTn marker (T.81 E.2.4). */
    def restart(): Unit = {
      nBits = 0
      require(pos + 1 < src.length && (src(pos) & 0xff) == 0xff &&
          (src(pos + 1) & 0xf8) == 0xd0,
        s"missing JPEG restart marker in $path")
      pos += 2
    }
    /** Position of the next unread byte (for scan-end discovery). */
    def bytePos: Int = pos
  }

  /** Decode a single-component DCT stream: SOF0 Baseline, SOF1
    * Extended sequential, or SOF2 PROGRESSIVE (spectral selection +
    * successive approximation, any scan script — coefficients
    * accumulate across scans exactly as T.81 G.2 prescribes, with
    * EOB-run skipping and the G.1.2.3 correction-bit refinement).
    * Returns (width, height, precision, samples in raster order,
    * clamped to [0, 2^precision)). */
  def decode(frag: Array[Byte], path: String): (Int, Int, Int, Array[Int]) = {
    require(frag.length >= 4 && (frag(0) & 0xff) == 0xff && (frag(1) & 0xff) == 0xd8,
      s"missing JPEG SOI marker in $path")
    var pos = 2
    def u16(p: Int): Int = ((frag(p) & 0xff) << 8) | (frag(p + 1) & 0xff)
    var w = 0; var h = 0; var precision = 0
    var progressive = false
    val quant = scala.collection.mutable.Map.empty[Int, Array[Int]]
    val huff = scala.collection.mutable.Map.empty[Int, HuffTable] // key class<<4|id
    var compQuantId = -1
    var restartInterval = 0
    // per-block RAW coefficients in ZIGZAG space, accumulated over
    // scans (one scan for sequential frames, many for progressive)
    var coefs: Array[Int] = null // flat nBlocks x 64, zigzag-major
    var nBlocks = 0
    var sawSos = false
    var sawEoi = false

    /** End of a scan's entropy segment: the first 0xFF not followed
      * by a stuff byte or an RSTn marker. */
    def scanEnd(start: Int): Int = {
      var p = start
      while (p + 1 < frag.length) {
        if ((frag(p) & 0xff) == 0xff) {
          val nxt = frag(p + 1) & 0xff
          if (nxt != 0x00 && (nxt & 0xf8) != 0xd0) return p
          p += 2
        } else p += 1
      }
      frag.length
    }

    def extend(v: Int, s: Int): Int =
      if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

    /** One scan over all blocks (single component → MCU = block).
      * Returns the byte position where the scan's entropy data ends
      * (the next marker's 0xFF). */
    def decodeScan(start: Int, ss: Int, se: Int, ah: Int, al: Int,
                   dcT: Int, acT: Int): Int = {
      // DC refinement scans read raw bits only; every other scan kind
      // needs its entropy table declared before the SOS
      val dc = huff.getOrElse(dcT, null)
      val ac = huff.getOrElse(0x10 | (acT & 0x0f), null)
      if (!progressive || (ss == 0 && ah == 0))
        require(dc != null, s"missing JPEG DC Huffman table in $path")
      if (se > 0) require(ac != null, s"missing JPEG AC Huffman table in $path")
      val br = new BitReader(frag, start, path)
      val p1 = 1 << al; val m1 = -1 << al
      var prevDc = 0
      var eobrun = 0
      def refine(k: Int): Unit =
        if (br.bit() == 1 && (coefs(k) & p1) == 0)
          coefs(k) += (if (coefs(k) >= 0) p1 else m1)
      var b = 0
      while (b < nBlocks) {
        if (restartInterval > 0 && b > 0 && b % restartInterval == 0) {
          br.restart(); prevDc = 0; eobrun = 0
        }
        val o = b * 64 // this block's slice of the flat zigzag array
        if (!progressive) {
          // sequential: DC + the full 1..63 band in one pass
          val sDc = dc.decode(br, path)
          require(sDc <= 15, s"bad JPEG DC category $sDc in $path")
          prevDc += (if (sDc == 0) 0 else extend(br.bits(sDc), sDc))
          coefs(o) = prevDc
          var k = 1
          var eob = false
          while (k < 64 && !eob) {
            val rs = ac.decode(br, path)
            val r = rs >> 4; val s = rs & 0x0f
            if (s == 0) {
              if (r == 15) {
                k += 16 // ZRL
                require(k <= 64, s"JPEG AC coefficient index overflow in $path")
              } else eob = true
            } else {
              k += r
              require(k < 64, s"JPEG AC coefficient index overflow in $path")
              coefs(o + k) = extend(br.bits(s), s)
              k += 1
            }
          }
        } else if (ss == 0 && ah == 0) {
          // DC first scan: diffs of (DC >> al)
          val sDc = dc.decode(br, path)
          require(sDc <= 15, s"bad JPEG DC category $sDc in $path")
          prevDc += (if (sDc == 0) 0 else extend(br.bits(sDc), sDc))
          coefs(o) = prevDc << al
        } else if (ss == 0) {
          // DC refinement: one correction bit per block
          coefs(o) |= br.bit() << al
        } else if (ah == 0) {
          // AC first scan of band [ss, se] with EOB-run skipping
          if (eobrun > 0) eobrun -= 1
          else {
            var k = ss
            while (k <= se) {
              val rs = ac.decode(br, path)
              val r = rs >> 4; val s = rs & 0x0f
              if (s == 0) {
                if (r == 15) {
                  k += 16 // ZRL
                  require(k <= se + 1, s"JPEG AC band overflow in $path")
                } else {
                  eobrun = (1 << r) - 1 + (if (r > 0) br.bits(r) else 0)
                  k = se + 1
                }
              } else {
                k += r
                require(k <= se, s"JPEG AC band overflow in $path")
                coefs(o + k) = extend(br.bits(s), s) << al
                k += 1
              }
            }
          }
        } else {
          // AC refinement (T.81 G.1.2.3 / the correction-bit walk)
          var k = ss
          if (eobrun == 0) {
            var inBand = true
            while (inBand && k <= se) {
              val rs = ac.decode(br, path)
              var r = rs >> 4; val s = rs & 0x0f
              var newval = 0
              if (s == 0) {
                if (r < 15) {
                  eobrun = (1 << r) + (if (r > 0) br.bits(r) else 0)
                  inBand = false // rest of band handled by the EOB sweep
                }
                // r == 15 (ZRL): skip 16 zero-history positions below
              } else {
                require(s == 1, s"bad JPEG refinement size $s in $path")
                newval = if (br.bit() == 1) p1 else m1
              }
              if (inBand) {
                var placed = false
                while (!placed && k <= se) {
                  if (coefs(o + k) != 0) refine(o + k)
                  else if (r == 0) { if (newval != 0) coefs(o + k) = newval; placed = true }
                  else r -= 1
                  k += 1
                }
                // a new coefficient whose zero-run overruns the band is
                // corrupt (ZRL, s == 0, legitimately consumes zeros to
                // the band end)
                require(placed || s == 0, s"JPEG refinement walk overflow in $path")
              }
            }
          }
          if (eobrun > 0) {
            // EOB-run block: every nonzero history coefficient in the
            // (remaining) band takes one correction bit
            while (k <= se) { if (coefs(o + k) != 0) refine(o + k); k += 1 }
            eobrun -= 1
          }
        }
        b += 1
      }
      // the reader stops inside the last entropy byte; the scan's true
      // end is the next marker at-or-after that byte (a short walk —
      // padding bits plus possibly a stray stuffed byte)
      scanEnd(br.bytePos)
    }

    while (!sawEoi) {
      require(pos + 2 <= frag.length && (frag(pos) & 0xff) == 0xff,
        s"malformed JPEG marker stream in $path")
      // T.81 B.1.1.2: markers may be preceded by any number of 0xFF
      // fill bytes — skip them or the next marker byte reads as a length
      while (pos + 2 < frag.length && (frag(pos + 1) & 0xff) == 0xff) pos += 1
      val m = frag(pos + 1) & 0xff
      if (m == 0xd9) { sawEoi = true } // EOI: standalone, no length
      else {
        require(pos + 4 <= frag.length, s"truncated JPEG stream in $path")
        val len = u16(pos + 2)
        require(pos + 2 + len <= frag.length, s"truncated JPEG segment in $path")
        m match {
          case 0xc0 | 0xc1 | 0xc2 => // Baseline / Extended / Progressive
            progressive = m == 0xc2
            precision = frag(pos + 4) & 0xff
            h = u16(pos + 5); w = u16(pos + 7)
            require((frag(pos + 9) & 0xff) == 1,
              s"multi-component DCT JPEG unsupported in $path")
            require(precision >= 2 && precision <= 12,
              s"bad JPEG DCT precision $precision in $path")
            require((frag(pos + 11) & 0xff) == 0x11,
              s"subsampled single-component JPEG is malformed in $path")
            compQuantId = frag(pos + 12) & 0xff
            // header-driven allocation needs a sanity cap: a crafted
            // 20-byte SOF declaring 65535x65535 would otherwise demand
            // ~17 GB before any entropy data is validated
            require(w.toLong * h <= (1L << 26),
              s"JPEG frame ${w}x$h exceeds this codec's 64M-pixel cap in $path")
            nBlocks = ((w + 7) / 8) * ((h + 7) / 8)
            coefs = new Array[Int](nBlocks * 64) // flat, zigzag-major
          case sof if sof >= 0xc3 && sof <= 0xcf && sof != 0xc4 && sof != 0xc8 && sof != 0xcc =>
            throw new IllegalArgumentException(
              f"unsupported JPEG frame type 0xFF$sof%02X in $path — " +
                "sequential/progressive DCT (SOF0/SOF1/SOF2) only in this codec")
          case 0xdb => // DQT: one or more tables, Pq selects 8/16-bit entries
            var p = pos + 4
            while (p < pos + 2 + len) {
              val pqTq = frag(p) & 0xff
              val pq = pqTq >> 4; val tq = pqTq & 0x0f
              require(pq <= 1, s"bad DQT precision in $path")
              val t = new Array[Int](64)
              var i = 0
              while (i < 64) {
                t(i) = if (pq == 0) frag(p + 1 + i) & 0xff else u16(p + 1 + 2 * i)
                i += 1
              }
              quant(tq) = t
              p += 1 + (if (pq == 0) 64 else 128)
            }
          case 0xc4 => // DHT: tables keyed (class, id)
            var p = pos + 4
            while (p < pos + 2 + len) {
              val tcTh = frag(p) & 0xff
              val bits = Array.tabulate(16)(i => frag(p + 1 + i) & 0xff)
              val n = bits.sum
              val vals = Array.tabulate(n)(i => frag(p + 17 + i) & 0xff)
              huff(tcTh) = new HuffTable(bits, vals)
              p += 17 + n
            }
          case 0xdd =>
            restartInterval = u16(pos + 4)
          case 0xda => // SOS: one scan (of possibly many, if progressive)
            require(coefs != null, s"JPEG SOS before SOF in $path")
            require((frag(pos + 4) & 0xff) == 1,
              s"multi-component JPEG scan unsupported in $path")
            val tdTa = frag(pos + 6) & 0xff
            val ss = frag(pos + 7) & 0xff; val se = frag(pos + 8) & 0xff
            val ahAl = frag(pos + 9) & 0xff
            val ah = ahAl >> 4; val al = ahAl & 0x0f
            if (!progressive)
              require(ss == 0 && se == 63 && ah == 0 && al == 0,
                s"sequential JPEG scan with progressive parameters in $path")
            else {
              require(se >= ss && se <= 63, s"bad JPEG spectral band [$ss, $se] in $path")
              require(ss != 0 || se == 0,
                s"progressive DC scan must be the lone band [0, 0] in $path")
              require(ah == 0 || ah == al + 1,
                s"bad JPEG successive approximation $ah/$al in $path")
            }
            val end = decodeScan(pos + 2 + len, ss, se, ah, al, tdTa >> 4, tdTa & 0x0f)
            sawSos = true
            // sequential frames have exactly ONE scan; stop here so a
            // stream truncated after the entropy data (no EOI — a
            // tolerated real-world shape the pre-progressive decoder
            // accepted) still decodes
            if (!progressive) sawEoi = true
            pos = end - (2 + len) // net: loop resumes at the scan's end marker
          case _ => () // APPn / COM: skip
        }
        pos += 2 + len
      }
    }
    require(w > 0 && h > 0, s"missing JPEG SOF frame header in $path")
    require(sawSos, s"missing JPEG scan in $path")
    require(quant.contains(compQuantId), s"missing JPEG quant table in $path")
    val qt = quant(compQuantId)
    val bw8 = (w + 7) / 8
    val out = new Array[Int](w * h)
    val mid = 1 << (precision - 1)
    val maxV = (1 << precision) - 1
    val coef = new Array[Double](64)
    var b = 0
    while (b < nBlocks) {
      val o = b * 64
      var i = 0
      while (i < 64) { coef(zigzag(i)) = coefs(o + i).toDouble * qt(i); i += 1 }
      val px = idct(coef)
      val bx = b % bw8; val by = b / bw8
      i = 0
      while (i < 64) {
        val x = bx * 8 + i % 8; val y = by * 8 + i / 8
        if (x < w && y < h) {
          var v = math.round(px(i)).toInt + mid
          if (v < 0) v = 0 else if (v > maxV) v = maxV
          out(y * w + x) = v
        }
        i += 1
      }
      b += 1
    }
    (w, h, precision, out)
  }
}
