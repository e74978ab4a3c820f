package graft.mm

/** Real, dependency-free mini-codecs for the multimodal operators —
  * replacing the innermost fake of [[Multimodal.StubCodec]] with actual
  * byte-format parsing so the batch plumbing is exercised on real media
  * bytes (no image/audio libraries exist in this environment; PPM and
  * WAV are simple enough to parse from scratch).
  *
  * Both decoders are total: malformed input returns None and the caller
  * falls back to the stub path — a decode error must never kill a 100 TB
  * job over one corrupt blob (the operators surface a fallback, not an
  * exception).
  */
object PpmCodec {

  /** Decoded P6 image: width, height, interleaved RGB bytes (3/pixel). */
  final case class Image(width: Int, height: Int, pixels: Array[Byte])

  /** Parse binary PPM (P6): "P6" <ws> width <ws> height <ws> maxval
    * (must be 255) <single ws> then width*height*3 raw RGB bytes.
    * '#' comments are allowed in the header per the spec. */
  def decode(bytes: Array[Byte]): Option[Image] = {
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    var i = 2
    def skipWs(): Unit = {
      var in = true
      while (in && i < bytes.length) {
        val c = bytes(i)
        if (c == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
        else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') i += 1
        else in = false
      }
    }
    def readInt(): Option[Int] = {
      skipWs()
      val start = i
      var v = 0L
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0'); i += 1
        if (v > Int.MaxValue) return None
      }
      if (i == start) None else Some(v.toInt)
    }
    for {
      w <- readInt()
      h <- readInt()
      maxv <- readInt()
      if maxv == 255 && w > 0 && h > 0
      // exactly one whitespace byte separates header from raster
      if i < bytes.length && (bytes(i) == '\n' || bytes(i) == ' ' ||
        bytes(i) == '\t' || bytes(i) == '\r')
      if bytes.length - (i + 1) >= w.toLong * h * 3
    } yield Image(w, h, java.util.Arrays.copyOfRange(bytes, i + 1, i + 1 + w * h * 3))
  }

  def encode(img: Image): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + img.pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.pixels, 0, out, header.length, img.pixels.length)
    out
  }

  /** Nearest-neighbor resample to (w2 × h2). */
  def resizeNearest(img: Image, w2: Int, h2: Int): Image = {
    val out = new Array[Byte](w2 * h2 * 3)
    var y = 0
    while (y < h2) {
      val sy = (y.toLong * img.height / h2).toInt
      var x = 0
      while (x < w2) {
        val sx = (x.toLong * img.width / w2).toInt
        val s = (sy * img.width + sx) * 3
        val d = (y * w2 + x) * 3
        out(d) = img.pixels(s); out(d + 1) = img.pixels(s + 1); out(d + 2) = img.pixels(s + 2)
        x += 1
      }
      y += 1
    }
    Image(w2, h2, out)
  }

  /** Real image features: per-channel mean (3) + luminance histogram
    * over the remaining bins, all normalized to [0,1]. */
  def features(img: Image, dim: Int = 16): Array[Float] = {
    val f = new Array[Float](dim)
    val histBins = math.max(dim - 3, 1)
    val n = img.pixels.length / 3
    var i = 0
    var rSum = 0L; var gSum = 0L; var bSum = 0L
    while (i < n) {
      val r = img.pixels(i * 3) & 0xff
      val g = img.pixels(i * 3 + 1) & 0xff
      val b = img.pixels(i * 3 + 2) & 0xff
      rSum += r; gSum += g; bSum += b
      // integer Rec.601 luma
      val y = (299 * r + 587 * g + 114 * b) / 1000
      if (dim > 3) f(3 + y * histBins / 256) += 1f
      i += 1
    }
    if (n > 0) {
      f(0) = rSum.toFloat / n / 255f
      if (dim > 1) f(1) = gSum.toFloat / n / 255f
      if (dim > 2) f(2) = bSum.toFloat / n / 255f
      var j = 3
      while (j < dim) { f(j) /= n; j += 1 }
    }
    f
  }
}

/** PNG codec with zero new dependencies (r15, verdict ask #5 — the
  * highest-value missing compressed format): decode = chunk walk +
  * `java.util.zip.Inflater` over the concatenated IDAT stream + full
  * scanline unfiltering (None/Sub/Up/Average/Paeth), supporting 8-bit
  * greyscale (color type 0), RGB (2) and RGBA (6), non-interlaced —
  * the overwhelming share of real-world PNGs. Output is the shared
  * [[PpmCodec.Image]] RGB shape, so features/resize reuse the proven
  * paths (alpha is dropped; grey replicates to RGB).
  *
  * Encode exists for fixtures and round-trip tests and is fully
  * DETERMINISTIC at the byte level: the zlib stream is hand-rolled as
  * STORED (uncompressed) deflate blocks + adler32, so the on-disk size
  * is the closed form `8 + 25 + (12 + 2 + 5·ceil(raw/65535) + raw + 4)
  * + 12` with raw = h·(1 + 3·w) — the property that lets the media-scan
  * oracle compute PNG file sizes in SQL (a Deflater's output segments
  * by internal buffer state and is not portably reproducible).
  *
  * Total like its siblings: malformed/truncated input → None → the
  * caller's stub fallback; one corrupt blob must never kill a job. */
object PngCodec {

  private val SIG = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  /** Decode to interleaved RGB. None on anything unsupported. */
  def decode(bytes: Array[Byte]): Option[PpmCodec.Image] = {
    if (bytes.length < SIG.length + 25 ||
      !java.util.Arrays.equals(java.util.Arrays.copyOf(bytes, 8), SIG)) return None
    var i = 8
    var w = 0; var h = 0; var bitDepth = -1; var colorType = -1; var interlace = -1
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd && i + 8 <= bytes.length) {
      val len = be32(bytes, i)
      if (len < 0 || len > Int.MaxValue - 12 || i + 12 + len > bytes.length) return None
      val typ = new String(bytes, i + 4, 4, "US-ASCII")
      val dataOff = i + 8
      typ match {
        case "IHDR" =>
          if (len != 13) return None
          w = be32(bytes, dataOff).toInt
          h = be32(bytes, dataOff + 4).toInt
          bitDepth = bytes(dataOff + 8) & 0xff
          colorType = bytes(dataOff + 9) & 0xff
          interlace = bytes(dataOff + 12) & 0xff
        case "IDAT" => idat.write(bytes, dataOff, len.toInt)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks skipped; CRCs not verified (total decode)
      }
      i += 12 + len.toInt
    }
    val channels = colorType match {
      case 0 => 1
      case 2 => 3
      case 6 => 4
      case _ => return None
    }
    if (w <= 0 || h <= 0 || bitDepth != 8 || interlace != 0 || !sawEnd) return None
    if (w.toLong * h * channels > (1L << 28)) return None // sanity bound
    val stride = w * channels
    val raw = new Array[Byte](h * (1 + stride))
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        // any zero-progress iteration is corrupt for our purposes:
        // needsInput() = truncated stream, needsDictionary() (zlib
        // FDICT) = a preset-dictionary blob we never emit — without
        // this the loop would spin forever on a crafted FDICT header
        if (n == 0) return None
        off += n
      }
      if (off < raw.length) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    // unfilter scanlines in place into `px`
    val px = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val ft = raw(y * (1 + stride)) & 0xff
      val rowOff = y * (1 + stride) + 1
      val outOff = y * stride
      var x = 0
      while (x < stride) {
        val cur = raw(rowOff + x) & 0xff
        val left = if (x >= channels) px(outOff + x - channels) & 0xff else 0
        val up = if (y > 0) px(outOff - stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= channels) px(outOff - stride + x - channels) & 0xff else 0
        val v = ft match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
            cur + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
          case _ => return None
        }
        px(outOff + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    // normalize to RGB
    val rgb = channels match {
      case 3 => px
      case 1 =>
        val out = new Array[Byte](w * h * 3)
        var j = 0
        while (j < w * h) { val g = px(j); out(j * 3) = g; out(j * 3 + 1) = g; out(j * 3 + 2) = g; j += 1 }
        out
      case 4 =>
        val out = new Array[Byte](w * h * 3)
        var j = 0
        while (j < w * h) {
          out(j * 3) = px(j * 4); out(j * 3 + 1) = px(j * 4 + 1); out(j * 3 + 2) = px(j * 4 + 2)
          j += 1
        }
        out
    }
    Some(PpmCodec.Image(w, h, rgb))
  }

  /** The closed-form encoded size for a w×h RGB image — mirrored by the
    * media-scan oracle SQL. */
  def encodedSize(w: Int, h: Int): Long = {
    val raw = h.toLong * (1 + 3L * w)
    val nBlocks = (raw + 65534) / 65535
    8L + 25 + (12 + 2 + 5 * nBlocks + raw + 4) + 12
  }

  /** Deterministic encode: filter-0 scanlines, STORED deflate blocks,
    * hand-computed adler32 + CRC32 — byte-stable across JVMs. */
  def encode(img: PpmCodec.Image): Array[Byte] = {
    val stride = img.width * 3
    val raw = new Array[Byte](img.height * (1 + stride))
    var y = 0
    while (y < img.height) {
      raw(y * (1 + stride)) = 0
      System.arraycopy(img.pixels, y * stride, raw, y * (1 + stride) + 1, stride)
      y += 1
    }
    // zlib: 0x78 0x01 header, stored blocks, adler32
    val zlib = new java.io.ByteArrayOutputStream()
    zlib.write(0x78); zlib.write(0x01)
    var off = 0
    while (off < raw.length || (raw.length == 0 && off == 0)) {
      val n = math.min(65535, raw.length - off)
      val last = off + n >= raw.length
      zlib.write(if (last) 1 else 0)
      zlib.write(n & 0xff); zlib.write((n >> 8) & 0xff)
      zlib.write(~n & 0xff); zlib.write((~n >> 8) & 0xff)
      zlib.write(raw, off, n)
      off += n
      if (last) off = raw.length + 1 // exit (handles the 0-byte case)
    }
    val adler = new java.util.zip.Adler32(); adler.update(raw)
    val a = adler.getValue
    zlib.write(((a >> 24) & 0xff).toInt); zlib.write(((a >> 16) & 0xff).toInt)
    zlib.write(((a >> 8) & 0xff).toInt); zlib.write((a & 0xff).toInt)

    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(12 + data.length)
      out.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      out.putInt(crc.getValue.toInt)
      out.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(img.width).putInt(img.height)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      .array()
    SIG ++ chunk("IHDR", ihdr) ++ chunk("IDAT", zlib.toByteArray) ++
      chunk("IEND", Array.empty[Byte])
  }
}

/** RIFF/WAVE PCM-16 parser. */
object WavCodec {

  final case class Audio(sampleRate: Int, channels: Int, samples: Array[Short])

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** Parse a canonical RIFF/WAVE file: walks chunks, requires an
    * audioFormat=1 (PCM) 16-bit "fmt " chunk and a "data" chunk. */
  def decode(bytes: Array[Byte]): Option[Audio] = {
    if (bytes.length < 44) return None
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F')) return None
    if (!(bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E')) return None
    var i = 12
    var rate = -1
    var channels = -1
    var bits = -1
    var data: Array[Short] = null
    while (i + 8 <= bytes.length) {
      val id = new String(bytes, i, 4, "US-ASCII")
      val size = le32(bytes, i + 4)
      if (size < 0 || i + 8 + size > bytes.length) return None
      val sz = size.toInt
      if (id == "fmt " && sz >= 16) {
        if (le16(bytes, i + 8) != 1) return None // PCM only
        channels = le16(bytes, i + 10)
        rate = le32(bytes, i + 12).toInt
        bits = le16(bytes, i + 22)
      } else if (id == "data") {
        if (bits != 16 || channels <= 0) return None // fmt must precede data
        val n = sz / 2
        val s = new Array[Short](n)
        var j = 0
        while (j < n) { s(j) = le16(bytes, i + 8 + j * 2).toShort; j += 1 }
        data = s
      }
      i += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    if (rate > 0 && data != null) Some(Audio(rate, channels, data)) else scala.None
  }

  def encode(a: Audio): Array[Byte] = {
    val dataLen = a.samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(a.channels.toShort).putInt(a.sampleRate)
      .putInt(a.sampleRate * a.channels * 2)
      .putShort((a.channels * 2).toShort).putShort(16)
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    a.samples.foreach(out.putShort)
    out.array()
  }

  /** Real audio features: [RMS energy, zero-crossing rate, then an
    * absolute-amplitude histogram over the remaining bins]. */
  def features(a: Audio, dim: Int = 16): Array[Float] = {
    val f = new Array[Float](dim)
    val n = a.samples.length
    if (n == 0) return f
    var i = 0
    var sq = 0.0
    var zc = 0
    val histBins = math.max(dim - 2, 1)
    while (i < n) {
      val s = a.samples(i).toDouble / 32768.0
      sq += s * s
      if (i > 0 && (a.samples(i) >= 0) != (a.samples(i - 1) >= 0)) zc += 1
      if (dim > 2) {
        val bin = (math.abs(a.samples(i).toInt) * histBins / 32768).min(histBins - 1)
        f(2 + bin) += 1f
      }
      i += 1
    }
    f(0) = math.sqrt(sq / n).toFloat
    if (dim > 1) f(1) = zc.toFloat / n
    var j = 2
    while (j < dim) { f(j) /= n; j += 1 }
    f
  }
}
