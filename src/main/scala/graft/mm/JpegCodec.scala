package graft.mm

/** Baseline JPEG codec with zero new dependencies (r16 — the THIRD real
  * compressed format after PNG/GIF, closing the image side of the
  * "JPEG/OPUS stub" honesty gap): decode is a full baseline-sequential
  * implementation — marker walk (SOI/APPn/COM/DQT/DHT/DRI/SOF0/SOS),
  * canonical Huffman table construction, DC-differential + AC
  * run-length entropy decode with 0xFF00 byte unstuffing and RSTn
  * restart handling, dequantization, de-zigzag, separable 2-D IDCT,
  * level shift + clamp — for 8-bit grayscale (1 component) and YCbCr
  * 4:4:4 (3 components, all sampling factors 1). Subsampled chroma
  * (4:2:0/4:2:2), progressive (SOF2), arithmetic coding and 12-bit
  * precision degrade to None like every other unsupported shape — one
  * exotic blob must never kill a 100 TB job.
  *
  * Encode exists for fixtures, resize re-encoding and round-trip tests:
  * deterministic baseline grayscale (integer Rec.601 luma, edge-clamp
  * block padding, double FDCT, the fixed [[quantTable]] with Q00 = 8,
  * Annex-K-style Huffman tables). The Q00 = 8 choice makes the DC path
  * EXACT: an 8×8-constant block's only nonzero coefficient is
  * DC = 8·(v−128), so quantize → (v−128) and decode reproduces v
  * bit-for-bit. That is the oracle device: a per-block-constant fixture
  * round-trips LOSSLESSLY through real entropy-coded JPEG bytes, so the
  * driver key's pixel aggregates are closed forms DuckDB computes —
  * while arbitrary images take the normal lossy path.
  *
  * Total like its siblings: malformed/truncated input → None → the
  * caller's stub fallback. All tables below are the public constants of
  * ITU-T T.81 (zigzag order; the Annex K typical Huffman tables).
  */
object JpegCodec {

  // ---- public constants of ITU-T T.81 ----

  private val zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // Annex K "typical" luminance tables: BITS (counts per code length
  // 1..16) + HUFFVAL, for DC (categories 0..11) and AC ((run,size)).
  private val dcBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val dcVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val acBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val acVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** The encoder's quantization table (natural order). Q(0,0) = 8 is
    * the exactness device (see the scaladoc); the rest vary so general
    * (spec-path) dequantization is exercised on non-uniform entries. */
  val quantTable: Array[Int] = Array.tabulate(64)(i => if (i == 0) 8 else 8 + i % 17)

  /** cosTab(u)(x) = C(u)/2 · cos((2x+1)uπ/16) — the separable DCT
    * basis; IDCT applies it twice, FDCT applies its transpose twice. */
  private val cosTab: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    c / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  // ---- canonical Huffman (shared by encode and decode) ----

  /** Canonical code assignment: (code, length) per symbol, from BITS +
    * HUFFVAL — T.81 Annex C. */
  private def canonicalCodes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = scala.collection.mutable.Map[Int, (Int, Int)]()
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len)) {
        out(vals(k)) = (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    out.toMap
  }

  /** Decode-side table: mincode/maxcode/valptr per length (Annex F.2.2.3). */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    private var code = 0
    private var k = 0
    for (len <- 1 to 16) {
      valPtr(len) = k
      minCode(len) = code
      code += bits(len); k += bits(len)
      maxCode(len) = if (bits(len) > 0) code - 1 else -1
      code <<= 1
    }
    def value(len: Int, c: Int): Int = vals(valPtr(len) + c - minCode(len))
  }

  // ---- bit I/O over the entropy-coded segment ----

  /** MSB-first bit reader with 0xFF00 unstuffing; a non-RST marker in
    * the stream ends it (exposed via `hitMarker`). */
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    var hitMarker = false

    def readBit(): Int = {
      if (nBits == 0) {
        if (pos >= data.length) { hitMarker = true; return -1 }
        var b = data(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= data.length) { hitMarker = true; return -1 }
          val b2 = data(pos) & 0xff
          if (b2 == 0x00) pos += 1 // stuffed literal FF
          else { hitMarker = true; pos -= 1; return -1 }
          b = 0xff
        }
        acc = b; nBits = 8
      }
      nBits -= 1
      (acc >> nBits) & 1
    }

    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val b = readBit()
        if (b < 0) return -1
        v = (v << 1) | b
        i += 1
      }
      v
    }

    /** Drop partial bits and step over an expected RSTn marker. */
    def resync(): Boolean = {
      nBits = 0
      hitMarker = false
      if (pos + 1 < data.length && (data(pos) & 0xff) == 0xff) {
        val m = data(pos + 1) & 0xff
        if (m >= 0xd0 && m <= 0xd7) { pos += 2; return true }
      }
      false
    }

    def decodeHuff(t: HuffTable): Int = {
      var code = 0
      var len = 0
      while (len < 16) {
        val b = readBit()
        if (b < 0) return -1
        code = (code << 1) | b
        len += 1
        if (t.maxCode(len) >= 0 && code <= t.maxCode(len)) return t.value(len, code)
      }
      -1 // no 16-bit code matched: corrupt
    }
  }

  /** T.81 EXTEND: map `v` read as a `t`-bit magnitude to its signed
    * coefficient. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  // ---- decode ----

  private final case class Component(id: Int, hSamp: Int, vSamp: Int, tq: Int) {
    var dcTable: Int = 0
    var acTable: Int = 0
    var pred: Int = 0
  }

  /** Decode baseline JPEG to interleaved RGB. None on anything
    * unsupported or malformed. */
  def decode(bytes: Array[Byte]): Option[PpmCodec.Image] = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8)
      return None
    var i = 2
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var w = 0; var h = 0
    var comps: Array[Component] = null
    var restartInterval = 0

    def u16(o: Int): Int = ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)

    while (i + 4 <= bytes.length) {
      if ((bytes(i) & 0xff) != 0xff) return None
      val marker = bytes(i + 1) & 0xff
      if (marker == 0xff) { i += 1 } // fill byte
      else if (marker == 0xd8 || marker == 0x01 ||
        (marker >= 0xd0 && marker <= 0xd7)) { i += 2 } // standalone markers
      else if (marker == 0xd9) return None // EOI before SOS
      else {
        val len = u16(i + 2)
        if (len < 2 || i + 2 + len > bytes.length) return None
        val seg = i + 4
        val segEnd = i + 2 + len
        marker match {
          case 0xdb => // DQT: one or more tables
            var p = seg
            while (p < segEnd) {
              val pq = (bytes(p) >> 4) & 0x0f
              val tq = bytes(p) & 0x0f
              if (pq != 0 || tq > 3 || p + 65 > segEnd) return None // 8-bit only
              quant(tq) = Array.tabulate(64)(k => bytes(p + 1 + k) & 0xff)
              p += 65
            }
          case 0xc4 => // DHT: one or more tables
            var p = seg
            while (p < segEnd) {
              val tc = (bytes(p) >> 4) & 0x0f
              val th = bytes(p) & 0x0f
              if (tc > 1 || th > 3 || p + 17 > segEnd) return None
              val bits = new Array[Int](17)
              var total = 0
              for (l <- 1 to 16) { bits(l) = bytes(p + l) & 0xff; total += bits(l) }
              if (p + 17 + total > segEnd || total > 256) return None
              val vals = Array.tabulate(total)(k => bytes(p + 17 + k) & 0xff)
              val t = new HuffTable(bits, vals)
              if (tc == 0) dcTabs(th) = t else acTabs(th) = t
              p += 17 + total
            }
          case 0xc0 | 0xc1 => // baseline / extended-sequential SOF
            if (bytes(seg) != 8) return None // 8-bit precision only
            h = u16(seg + 1); w = u16(seg + 3)
            val nc = bytes(seg + 5) & 0xff
            if (w <= 0 || h <= 0 || (nc != 1 && nc != 3)) return None
            if (len != 8 + 3 * nc) return None
            if (w.toLong * h * 3 > (1L << 28)) return None // sanity bound
            comps = Array.tabulate(nc) { c =>
              val o = seg + 6 + c * 3
              Component(bytes(o) & 0xff, (bytes(o + 1) >> 4) & 0x0f,
                bytes(o + 1) & 0x0f, bytes(o + 2) & 0xff)
            }
            // 4:4:4 (or grayscale) only: every sampling factor 1
            if (!comps.forall(c => c.hSamp == 1 && c.vSamp == 1)) return None
          case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
            return None // progressive / hierarchical / arithmetic: unsupported
          case 0xdd => // DRI
            if (len != 4) return None
            restartInterval = u16(seg)
          case 0xda => // SOS: entropy data follows
            if (comps == null) return None
            val ns = bytes(seg) & 0xff
            if (ns != comps.length || len != 6 + 2 * ns) return None
            for (c <- 0 until ns) {
              val cid = bytes(seg + 1 + c * 2) & 0xff
              val tt = bytes(seg + 2 + c * 2) & 0xff
              val comp = comps.find(_.id == cid).getOrElse(return None)
              comp.dcTable = (tt >> 4) & 0x0f
              comp.acTable = tt & 0x0f
            }
            return decodeScan(bytes, segEnd, w, h, comps, quant, dcTabs, acTabs,
              restartInterval)
          case _ => () // APPn / COM / others: skip
        }
        i += 2 + len
      }
    }
    None // no SOS reached
  }

  /** Entropy-decode all MCUs (one block per component at 4:4:4), IDCT,
    * and assemble RGB. */
  private def decodeScan(bytes: Array[Byte], start: Int, w: Int, h: Int,
                         comps: Array[Component], quant: Array[Array[Int]],
                         dcTabs: Array[HuffTable], acTabs: Array[HuffTable],
                         restartInterval: Int): Option[PpmCodec.Image] = {
    val bw = (w + 7) / 8
    val bh = (h + 7) / 8
    val nc = comps.length
    // per-component plane, block-padded
    val planes = Array.fill(nc)(new Array[Int](bw * 8 * bh * 8))
    comps.foreach { c =>
      if (c.tq > 3 || quant(c.tq) == null) return None
      if (c.dcTable > 3 || c.acTable > 3 ||
        dcTabs(c.dcTable) == null || acTabs(c.acTable) == null) return None
    }
    val br = new BitReader(bytes, start)
    val coef = new Array[Int](64)
    val block = new Array[Double](64)
    val tmp = new Array[Double](64)
    var mcu = 0
    val nMcu = bw * bh
    var sinceRestart = 0
    while (mcu < nMcu) {
      if (restartInterval > 0 && sinceRestart == restartInterval) {
        if (!br.resync()) return None
        comps.foreach(_.pred = 0)
        sinceRestart = 0
      }
      val by = mcu / bw
      val bx = mcu % bw
      var c = 0
      while (c < nc) {
        val comp = comps(c)
        java.util.Arrays.fill(coef, 0)
        // DC
        val t = br.decodeHuff(dcTabs(comp.dcTable))
        if (t < 0 || t > 11) return None
        val diffBits = if (t == 0) 0 else br.readBits(t)
        if (diffBits < 0) return None
        comp.pred += extend(diffBits, t)
        coef(0) = comp.pred
        // AC
        var k = 1
        while (k < 64) {
          val rs = br.decodeHuff(acTabs(comp.acTable))
          if (rs < 0) return None
          val r = (rs >> 4) & 0x0f
          val s = rs & 0x0f
          if (s == 0) {
            if (r == 15) k += 16 // ZRL
            else k = 64          // EOB
          } else {
            k += r
            if (k > 63) return None
            val vb = br.readBits(s)
            if (vb < 0) return None
            coef(zigzag(k)) = extend(vb, s)
            k += 1
          }
        }
        // dequant + IDCT into the component plane
        val q = quant(comp.tq)
        var j = 0
        while (j < 64) { block(j) = coef(j).toDouble * q(zigzagInv(j)); j += 1 }
        idct8x8(block, tmp)
        val plane = planes(c)
        val stride = bw * 8
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val v = math.round(block(y * 8 + x)).toInt + 128
            plane((by * 8 + y) * stride + bx * 8 + x) =
              if (v < 0) 0 else if (v > 255) 255 else v
            x += 1
          }
          y += 1
        }
        c += 1
      }
      sinceRestart += 1
      mcu += 1
    }
    // assemble RGB
    val px = new Array[Byte](w * h * 3)
    val stride = bw * 8
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        if (nc == 1) {
          val g = planes(0)(y * stride + x).toByte
          px(o) = g; px(o + 1) = g; px(o + 2) = g
        } else {
          val yy = planes(0)(y * stride + x)
          val cb = planes(1)(y * stride + x) - 128
          val cr = planes(2)(y * stride + x) - 128
          px(o) = clamp8(math.round(yy + 1.402 * cr).toInt)
          px(o + 1) = clamp8(math.round(yy - 0.344136 * cb - 0.714136 * cr).toInt)
          px(o + 2) = clamp8(math.round(yy + 1.772 * cb).toInt)
        }
        x += 1
      }
      y += 1
    }
    Some(PpmCodec.Image(w, h, px))
  }

  private def clamp8(v: Int): Byte =
    (if (v < 0) 0 else if (v > 255) 255 else v).toByte

  /** zigzagInv(j) = zigzag position of natural index j: DQT arrives in
    * zigzag order and is stored as read, so dequantizing the NATURAL
    * slot j looks up the zigzag slot it came from. */
  private val zigzagInv: Array[Int] = {
    val inv = new Array[Int](64)
    var k = 0
    while (k < 64) { inv(zigzag(k)) = k; k += 1 }
    inv
  }

  /** Separable in-place 8×8 IDCT (basis [[cosTab]]); `tmp` is scratch. */
  private def idct8x8(block: Array[Double], tmp: Array[Double]): Unit = {
    // rows: over u for each v column index — first pass transforms dim 0
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += cosTab(u)(x) * block(y * 8 + u); u += 1 }
        tmp(y * 8 + x) = s
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) {
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += cosTab(v)(yy) * tmp(v * 8 + x); v += 1 }
        block(yy * 8 + x) = s
        yy += 1
      }
      x += 1
    }
  }

  /** Forward 8×8 DCT (transpose application of [[cosTab]]). */
  private def fdct8x8(block: Array[Double], tmp: Array[Double]): Unit = {
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += cosTab(u)(x) * block(y * 8 + x); x += 1 }
        tmp(y * 8 + u) = s
        y += 1
      }
      u += 1
    }
    var v = 0
    while (v < 8) {
      var uu = 0
      while (uu < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) { s += cosTab(v)(y) * tmp(y * 8 + uu); y += 1 }
        block(v * 8 + uu) = s
        uu += 1
      }
      v += 1
    }
  }

  // ---- encode ----

  /** Deterministic baseline grayscale encode: integer Rec.601 luma,
    * edge-clamp padding, double FDCT, [[quantTable]], Annex-K Huffman.
    * Arbitrary images take the normal lossy path; images whose every
    * 8×8 block region is CONSTANT round-trip exactly (Q00 = 8). */
  def encode(img: PpmCodec.Image): Array[Byte] = {
    val w = img.width
    val h = img.height
    val bw = (w + 7) / 8
    val bh = (h + 7) / 8
    val dcCodes = canonicalCodes(dcBits, dcVals)
    val acCodes = canonicalCodes(acBits, acVals)

    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v >> 8); w8(v) }

    w16(0xffd8) // SOI
    // APP0 / JFIF
    w16(0xffe0); w16(16)
    out.write("JFIF".getBytes("US-ASCII")); w8(0)
    w8(1); w8(1); w8(0); w16(1); w16(1); w8(0); w8(0)
    // DQT (table 0, zigzag order per spec)
    w16(0xffdb); w16(67); w8(0)
    var k = 0
    while (k < 64) { w8(quantTable(zigzag(k))); k += 1 }
    // SOF0 — emitted BEFORE DHT so dims sit inside the connector's
    // 256-byte header prefix regardless of Huffman table size
    w16(0xffc0); w16(11)
    w8(8); w16(h); w16(w); w8(1)
    w8(1); w8(0x11); w8(0)
    // DHT: DC then AC
    def writeDht(cls: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      w16(0xffc4); w16(2 + 17 + vals.length); w8(cls << 4)
      for (l <- 1 to 16) w8(bits(l))
      vals.foreach(w8)
    }
    writeDht(0, dcBits, dcVals)
    writeDht(1, acBits, acVals)
    // SOS
    w16(0xffda); w16(8)
    w8(1); w8(1); w8(0x00); w8(0); w8(63); w8(0)

    // entropy-coded data with byte stuffing
    var acc = 0L; var accBits = 0
    def putBits(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1)); accBits += len
      while (accBits >= 8) {
        val b = ((acc >> (accBits - 8)) & 0xff).toInt
        w8(b); if (b == 0xff) w8(0)
        accBits -= 8
      }
    }
    def category(v: Int): Int = {
      var a = math.abs(v)
      var t = 0
      while (a != 0) { a >>= 1; t += 1 }
      t
    }
    val block = new Array[Double](64)
    val tmp = new Array[Double](64)
    val coef = new Array[Int](64)
    var pred = 0
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        var y = 0
        while (y < 8) {
          val sy = math.min(by * 8 + y, h - 1)
          var x = 0
          while (x < 8) {
            val sx = math.min(bx * 8 + x, w - 1)
            val o = (sy * w + sx) * 3
            val luma = (299 * (img.pixels(o) & 0xff) + 587 * (img.pixels(o + 1) & 0xff) +
              114 * (img.pixels(o + 2) & 0xff)) / 1000
            block(y * 8 + x) = luma - 128.0
            x += 1
          }
          y += 1
        }
        fdct8x8(block, tmp)
        var j = 0
        while (j < 64) {
          coef(j) = math.round(block(j) / quantTable(j)).toInt
          j += 1
        }
        // DC
        val diff = coef(0) - pred
        pred = coef(0)
        val t = category(diff)
        val (dc, dl) = dcCodes(t)
        putBits(dc, dl)
        if (t > 0) putBits(if (diff < 0) diff + (1 << t) - 1 else diff, t)
        // AC in zigzag order
        var run = 0
        k = 1
        while (k < 64) {
          val v = coef(zigzag(k))
          if (v == 0) run += 1
          else {
            while (run > 15) { val (c, l) = acCodes(0xf0); putBits(c, l); run -= 16 }
            val s = category(v)
            val (c, l) = acCodes((run << 4) | s)
            putBits(c, l)
            putBits(if (v < 0) v + (1 << s) - 1 else v, s)
            run = 0
          }
          k += 1
        }
        if (run > 0) { val (c, l) = acCodes(0x00); putBits(c, l) }
        bx += 1
      }
      by += 1
    }
    if (accBits > 0) { // pad final byte with 1s per spec
      val pad = 8 - accBits
      putBits((1 << pad) - 1, pad)
    }
    w16(0xffd9) // EOI
    out.toByteArray
  }
}
