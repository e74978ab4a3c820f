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

/** GIF codec with zero new dependencies (r16, verdict ask #4 — the
  * second real compressed format after PNG): decode = header walk +
  * FULL variable-width LZW (dictionary growth to 12 bits, CLEAR/EOI,
  * sub-block framing, global AND local color tables, extension blocks
  * skipped) over the first image of a GIF87a/GIF89a stream —
  * non-interlaced, the overwhelming share of machine-generated GIFs;
  * interlaced input degrades to None like every other unsupported
  * shape. Output is the shared [[PpmCodec.Image]] RGB form, so
  * features/resize reuse the proven paths.
  *
  * Encode exists for fixtures and round-trip tests and is fully
  * DETERMINISTIC at the byte level: a padded 256-entry global color
  * table and FLAT 9-bit LZW codes with a CLEAR every 252 pixels (the
  * classic patent-era "uncompressed GIF" technique — decoders see a
  * valid stream whose dictionary never outgrows 9-bit codes), so the
  * on-disk size is the closed form in [[encodedSize]] and the
  * media-source oracle computes GIF file sizes in SQL, exactly the
  * [[PngCodec.encodedSize]] device. The real COMPRESSING path of the
  * format lives in the decoder; MultimodalSpec round-trips a
  * spec-local greedy LZW compressor through it to pin dictionary
  * growth.
  *
  * Total like its siblings: malformed/truncated input → None → the
  * caller's stub fallback; one corrupt blob must never kill a job. */
object GifCodec {

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  /** Decode the first image to interleaved RGB. None on anything
    * unsupported or malformed. */
  def decode(bytes: Array[Byte]): Option[PpmCodec.Image] = decodeFrame(bytes, 0)

  /** Number of image frames in the stream (animated-GIF demux: counts
    * image descriptors, skipping their data without LZW-decoding it).
    * None on malformed/truncated input or a frameless stream. */
  def frameCount(bytes: Array[Byte]): Option[Int] =
    walkFrames(bytes, _ => false, -1)((_, img) => img).map(_._1).filter(_ > 0)

  /** Decode frame `target` (0-based) of a possibly-animated GIF,
    * stopping the walk at that frame (bytes after it are never read).
    * Frame 0 decodes STANDALONE with the image block's own dimensions
    * (positioning offsets are compositing metadata — the classic
    * "decode the first image" semantics, and what a sub-canvas still
    * GIF needs); later frames must be full-logical-screen and
    * non-interlaced, since a partial frame at index > 0 renders on top
    * of prior content and would need disposal-method compositing —
    * those degrade to None. */
  def decodeFrame(bytes: Array[Byte], target: Int): Option[PpmCodec.Image] =
    if (target < 0) None
    else walkFrames(bytes, _ == target, target)((_, img) => img)
      .flatMap(_._2.headOption.map(_._2))

  /** Single-pass demux + stride sampling: ONE walk decodes every
    * `stride`-th frame, maps it through `f` IMMEDIATELY (so a caller
    * folding frames to statistics never holds more than one decoded
    * frame in memory), and returns (total frame count, mapped frames
    * with their indices) — the shape a 1-in-N video sampler needs,
    * where per-frame [[decodeFrame]] calls would re-walk all earlier
    * frames' descriptors each time (O(frames²) skips per file).
    * Robustness: a sampled frame that is individually undecodable
    * (interlaced, partial-canvas at index > 0, corrupt LZW data) is
    * SKIPPED — the good frames still come back, matching the
    * one-corrupt-blob-never-kills-a-job contract; only structural
    * malformation of the stream itself (bad signature, truncation, a
    * lost block boundary) returns None. */
  def decodeSampled[T](bytes: Array[Byte], stride: Int)
                      (f: (Int, PpmCodec.Image) => T): Option[(Int, Seq[(Int, T)])] =
    if (stride <= 0) None
    else walkFrames(bytes, _ % stride == 0, -1)(f).filter(_._1 > 0)

  /** Shared single-pass walk: decodes the frames `want` selects and
    * maps each through `f` as soon as it is assembled; if `stopAt` ≥ 0
    * returns right after that frame (count = frames seen), else walks
    * to the trailer (count = total frames). A selected frame that
    * cannot be decoded is skipped (not accumulated); None only on
    * structural malformation of the walk itself. */
  private def walkFrames[T](bytes: Array[Byte], want: Int => Boolean, stopAt: Int)
                           (f: (Int, PpmCodec.Image) => T)
      : Option[(Int, List[(Int, T)])] = {
    if (bytes.length < 14) return None
    val sig = new String(bytes, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    var i = 6
    // logical screen descriptor
    val sw = u16(bytes, i)
    val sh = u16(bytes, i + 2)
    val packed = bytes(i + 4) & 0xff
    i += 7
    var gct: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 3 * (1 << ((packed & 0x07) + 1))
      if (i + n > bytes.length) return None
      gct = java.util.Arrays.copyOfRange(bytes, i, i + n)
      i += n
    }
    var frame = 0
    var acc: List[(Int, T)] = Nil
    while (i < bytes.length) {
      (bytes(i) & 0xff) match {
        case 0x3b => // trailer
          return Some((frame, acc.reverse))
        case 0x21 => // extension: label byte then sub-blocks
          i += 2
          while (i < bytes.length && bytes(i) != 0) i += 1 + (bytes(i) & 0xff)
          if (i >= bytes.length) return None
          i += 1 // block terminator
        case 0x2c =>
          if (i + 10 > bytes.length) return None
          val left = u16(bytes, i + 1)
          val top = u16(bytes, i + 3)
          val w = u16(bytes, i + 5)
          val h = u16(bytes, i + 7)
          val ipacked = bytes(i + 9) & 0xff
          i += 10
          val decodeThis = want(frame)
          // local color table wins for THIS frame; in skip mode it is
          // stepped over without the copy
          var palette = gct
          if ((ipacked & 0x80) != 0) {
            val n = 3 * (1 << ((ipacked & 0x07) + 1))
            if (i + n > bytes.length) return None
            if (decodeThis) palette = java.util.Arrays.copyOfRange(bytes, i, i + n)
            i += n
          }
          if (i >= bytes.length) return None
          val minCode = bytes(i) & 0xff
          i += 1
          // a selected frame decodes only if its SHAPE is supported:
          // non-interlaced, full-canvas when at index > 0 (frame 0
          // decodes standalone with its own dims — positioning offsets
          // are compositing metadata), valid palette/dims/min-code;
          // anything else is skipped, never a file-level failure
          val frameOk = decodeThis &&
            (ipacked & 0x40) == 0 &&
            (frame == 0 || (left == 0 && top == 0 && w == sw && h == sh)) &&
            palette != null && w > 0 && h > 0 &&
            w.toLong * h * 3 <= (1L << 28) &&
            minCode >= 2 && minCode <= 8
          // concatenate (or in skip mode just step over) sub-blocks
          val data = if (frameOk) new java.io.ByteArrayOutputStream() else null
          while (i < bytes.length && bytes(i) != 0) {
            val n = bytes(i) & 0xff
            if (i + 1 + n > bytes.length) return None
            if (frameOk) data.write(bytes, i + 1, n)
            i += 1 + n
          }
          if (i >= bytes.length) return None
          i += 1 // block terminator
          if (frameOk) {
            lzwDecode(data.toByteArray, minCode, w * h).foreach { idx =>
              val nColors = palette.length / 3
              val px = new Array[Byte](w * h * 3)
              var j = 0
              var pxOk = true
              while (pxOk && j < w * h) {
                val c = idx(j) & 0xff
                if (c >= nColors) pxOk = false // index beyond the palette: corrupt
                else {
                  px(j * 3) = palette(c * 3)
                  px(j * 3 + 1) = palette(c * 3 + 1)
                  px(j * 3 + 2) = palette(c * 3 + 2)
                  j += 1
                }
              }
              if (pxOk) acc = (frame, f(frame, PpmCodec.Image(w, h, px))) :: acc
            }
          }
          if (frame == stopAt) return Some((frame + 1, acc.reverse))
          frame += 1
        case _ => return None
      }
    }
    None // ran off the end without a trailer
  }

  /** Full variable-width LZW over an LSB-first bit stream: dictionary
    * rebuilt on CLEAR, code width grows 9→12 as the dictionary fills,
    * the `code == dictSize` just-added case handled per the spec.
    * Returns exactly `nPixels` indices or None. */
  private def lzwDecode(data: Array[Byte], minCode: Int,
                        nPixels: Int): Option[Array[Byte]] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val out = new Array[Byte](nPixels)
    var outN = 0
    var dictSize = eoi + 1
    var width = minCode + 1
    var prev = -1
    var acc = 0L; var accBits = 0; var pos = 0
    val stack = new Array[Byte](4096)
    def expand(code: Int): Byte = { // push code's string, return its first byte
      var sp = 0
      var c = code
      while (c >= clear) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
      stack(sp) = c.toByte; sp += 1
      while (sp > 0 && outN < nPixels) { sp -= 1; out(outN) = stack(sp); outN += 1 }
      c.toByte
    }
    while (outN < nPixels) {
      while (accBits < width) {
        if (pos >= data.length) return None // truncated stream
        acc |= (data(pos) & 0xffL) << accBits
        accBits += 8; pos += 1
      }
      val code = (acc & ((1 << width) - 1)).toInt
      acc >>>= width; accBits -= width
      if (code == clear) {
        dictSize = eoi + 1; width = minCode + 1; prev = -1
      } else if (code == eoi) {
        return if (outN == nPixels) Some(out) else None
      } else if (prev == -1) {
        if (code >= clear) return None // first code must be a literal
        expand(code)
        prev = code
      } else if (code <= dictSize) {
        if (code == dictSize && dictSize >= 4096) return None
        val first =
          if (code == dictSize) { // the just-about-to-be-added entry
            val f = expandFirst(prefix, suffix, clear, prev)
            // entry = string(prev) + first(prev): emit prev then f
            expand(prev)
            if (outN < nPixels) { out(outN) = f; outN += 1 }
            f
          } else expand(code)
        if (dictSize < 4096) {
          prefix(dictSize) = prev; suffix(dictSize) = first
          dictSize += 1
          if (dictSize == (1 << width) && width < 12) width += 1
        }
        prev = code
      } else return None // code beyond the dictionary: corrupt
    }
    Some(out)
  }

  private def expandFirst(prefix: Array[Int], suffix: Array[Byte],
                          clear: Int, code: Int): Byte = {
    var c = code
    while (c >= clear) c = prefix(c)
    c.toByte
  }

  /** Closed-form encoded size of [[encode]]'s output (the oracle's
    * device): flat 9-bit codes = initial CLEAR + n pixels + a CLEAR
    * before every 253rd pixel + EOI, packed LSB-first, framed in
    * ≤255-byte sub-blocks; fixed 794-byte envelope (13-byte header +
    * 768-byte padded palette + 10-byte descriptor + min-code byte +
    * block terminator + trailer). */
  def encodedSize(w: Int, h: Int): Long = {
    val n = w.toLong * h
    val codes = n + 2 + (n - 1) / 252
    val dataBytes = (9 * codes + 7) / 8
    val subBlocks = (dataBytes + 254) / 255
    794 + dataBytes + subBlocks
  }

  /** Closed-form size of [[encodeAnimated]]'s output: 13-byte header +
    * 768-byte global table + per frame (8-byte GCE + 10-byte descriptor
    * + min-code byte + flat-9-bit data + sub-block framing + block
    * terminator) + trailer. */
  def encodedAnimatedSize(w: Int, h: Int, nFrames: Int): Long = {
    val n = w.toLong * h
    val codes = n + 2 + (n - 1) / 252
    val dataBytes = (9 * codes + 7) / 8
    val subBlocks = (dataBytes + 254) / 255
    13L + 768 + nFrames.toLong * (8 + 10 + 1 + dataBytes + subBlocks + 1) + 1
  }

  /** Deterministic animated GIF89a bytes: one shared 256-entry global
    * palette over the union of all frames' colors (≤256 distinct →
    * lossless, sorted; richer → the fixed R3G3B2 quantization), then
    * per frame a graphic-control extension (fixed 4/100 s delay) and a
    * full-logical-screen image block in the same flat-9-bit LZW as
    * [[encode]] — so the on-disk size is the [[encodedAnimatedSize]]
    * closed form. This is the "video" container of the media stack:
    * frame demux ([[frameCount]]) and per-frame decode
    * ([[decodeFrame]]) run against exactly these streams. */
  def encodeAnimated(frames: Seq[PpmCodec.Image]): Array[Byte] = {
    require(frames.nonEmpty, "animated GIF needs at least one frame")
    val w = frames.head.width
    val h = frames.head.height
    require(frames.forall(f => f.width == w && f.height == h),
      "all frames must share the logical screen size")
    val n = w * h
    val rgbFrames = frames.map { f =>
      Array.tabulate(n) { j =>
        ((f.pixels(j * 3) & 0xff) << 16) | ((f.pixels(j * 3 + 1) & 0xff) << 8) |
          (f.pixels(j * 3 + 2) & 0xff)
      }
    }
    val distinct = rgbFrames.iterator.flatten.toSet
    val (palette, indexOf): (Array[Int], Int => Int) =
      if (distinct.size <= 256) {
        val p = distinct.toArray.sorted
        val m = p.zipWithIndex.toMap
        (p.padTo(256, 0), m)
      } else {
        val p = Array.tabulate(256) { i =>
          val r = ((i >> 5) & 7) * 255 / 7
          val g = ((i >> 2) & 7) * 255 / 7
          val b = (i & 3) * 255 / 3
          (r << 16) | (g << 8) | b
        }
        (p, c => {
          val r = (c >> 16) & 0xff; val g = (c >> 8) & 0xff; val b = c & 0xff
          ((r * 7 / 255) << 5) | ((g * 7 / 255) << 2) | (b * 3 / 255)
        })
      }
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    w16(w); w16(h)
    out.write(0x80 | 0x07); out.write(0); out.write(0)
    palette.foreach { c =>
      out.write((c >> 16) & 0xff); out.write((c >> 8) & 0xff); out.write(c & 0xff)
    }
    rgbFrames.foreach { rgb =>
      // graphic control extension: 4/100 s delay, no transparency
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(0); w16(4); out.write(0); out.write(0)
      out.write(0x2c); w16(0); w16(0); w16(w); w16(h); out.write(0)
      out.write(8) // LZW min code size
      val data = new java.io.ByteArrayOutputStream()
      var acc = 0L; var accBits = 0
      def emit(code: Int): Unit = {
        acc |= (code.toLong & 0x1ff) << accBits; accBits += 9
        while (accBits >= 8) { data.write((acc & 0xff).toInt); acc >>>= 8; accBits -= 8 }
      }
      emit(256)
      var sinceClear = 0
      var j = 0
      while (j < n) {
        if (sinceClear == 252) { emit(256); sinceClear = 0 }
        emit(indexOf(rgb(j))); sinceClear += 1
        j += 1
      }
      emit(257)
      if (accBits > 0) data.write((acc & 0xff).toInt)
      val payload = data.toByteArray
      var off = 0
      while (off < payload.length) {
        val len = math.min(255, payload.length - off)
        out.write(len)
        out.write(payload, off, len)
        off += len
      }
      out.write(0) // block terminator
    }
    out.write(0x3b)
    out.toByteArray
  }

  /** Deterministic GIF87a bytes. Images with ≤256 distinct colors
    * encode LOSSLESSLY (exact palette, sorted); anything richer
    * quantizes to the fixed R3G3B2 palette — the same trade every real
    * GIF encoder makes, kept deterministic. */
  def encode(img: PpmCodec.Image): Array[Byte] = {
    val n = img.width * img.height
    val rgb = new Array[Int](n)
    var j = 0
    while (j < n) {
      rgb(j) = ((img.pixels(j * 3) & 0xff) << 16) |
        ((img.pixels(j * 3 + 1) & 0xff) << 8) | (img.pixels(j * 3 + 2) & 0xff)
      j += 1
    }
    val distinct = rgb.toSet
    val (palette, indexOf): (Array[Int], Int => Int) =
      if (distinct.size <= 256) {
        val p = distinct.toArray.sorted
        val m = p.zipWithIndex.toMap
        (p.padTo(256, 0), m)
      } else {
        val p = Array.tabulate(256) { i =>
          val r = ((i >> 5) & 7) * 255 / 7
          val g = ((i >> 2) & 7) * 255 / 7
          val b = (i & 3) * 255 / 3
          (r << 16) | (g << 8) | b
        }
        (p, c => {
          val r = (c >> 16) & 0xff; val g = (c >> 8) & 0xff; val b = c & 0xff
          ((r * 7 / 255) << 5) | ((g * 7 / 255) << 2) | (b * 3 / 255)
        })
      }
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF87a".getBytes("US-ASCII"))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    w16(img.width); w16(img.height)
    out.write(0x80 | 0x07) // GCT present, 2^8 entries
    out.write(0); out.write(0)
    palette.foreach { c =>
      out.write((c >> 16) & 0xff); out.write((c >> 8) & 0xff); out.write(c & 0xff)
    }
    out.write(0x2c); w16(0); w16(0); w16(img.width); w16(img.height); out.write(0)
    out.write(8) // LZW min code size
    // flat 9-bit stream with periodic CLEAR (see encodedSize)
    val data = new java.io.ByteArrayOutputStream()
    var acc = 0L; var accBits = 0
    def emit(code: Int): Unit = {
      acc |= (code.toLong & 0x1ff) << accBits; accBits += 9
      while (accBits >= 8) { data.write((acc & 0xff).toInt); acc >>>= 8; accBits -= 8 }
    }
    emit(256) // CLEAR
    var sinceClear = 0
    j = 0
    while (j < n) {
      if (sinceClear == 252) { emit(256); sinceClear = 0 }
      emit(indexOf(rgb(j))); sinceClear += 1
      j += 1
    }
    emit(257) // EOI
    if (accBits > 0) data.write((acc & 0xff).toInt)
    val payload = data.toByteArray
    var off = 0
    while (off < payload.length) {
      val len = math.min(255, payload.length - off)
      out.write(len)
      out.write(payload, off, len)
      off += len
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }
}

/** IMA ADPCM codec in the RIFF/WAVE container (r16 — the audio side of
  * the "JPEG/OPUS stub" gap: a REAL 4:1 compressed audio format, zero
  * dependencies). Decode parses `wFormatTag = 17` (IMA/DVI ADPCM) mono
  * files — fmt extension with samples-per-block, optional `fact` chunk
  * for the exact total sample count, per-block 4-byte headers (initial
  * predictor int16 + step-table index) followed by 4-bit nibbles run
  * through the standard IMA step/index adaptation — into the shared
  * [[WavCodec.Audio]] PCM-16 shape, so audio features reuse the proven
  * path. Encode is the deterministic greedy nibble quantizer.
  *
  * The oracle device (the JPEG Q00 = 8 analogue): a per-block-CONSTANT
  * signal encodes losslessly — the block header stores its first sample
  * exactly, every following delta is 0 → nibble 0, and at step index 0
  * the decoded delta is step(0)>>3 = 7>>3 = 0 while the index stays
  * clamped at 0 — so block-constant fixtures round-trip bit-exactly
  * through real compressed bytes and the driver key's sample aggregates
  * are closed forms. Arbitrary signals take the normal lossy path.
  *
  * Total like its siblings: malformed/truncated input → None. Step and
  * index tables are the public IMA/DVI constants. */
object AdpcmCodec {

  private val stepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  private val indexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** One nibble through the IMA update rule; returns the new sample and
    * mutates nothing (pred/index threading is the caller's). */
  @inline private def step(pred: Int, index: Int, nibble: Int): (Int, Int) = {
    val st = stepTable(index)
    var diff = st >> 3
    if ((nibble & 1) != 0) diff += st >> 2
    if ((nibble & 2) != 0) diff += st >> 1
    if ((nibble & 4) != 0) diff += st
    val p0 = if ((nibble & 8) != 0) pred - diff else pred + diff
    val p = if (p0 < -32768) -32768 else if (p0 > 32767) 32767 else p0
    val i0 = index + indexTable(nibble & 7)
    val i = if (i0 < 0) 0 else if (i0 > 88) 88 else i0
    (p, i)
  }

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** Decode a mono IMA-ADPCM WAV. None on anything unsupported. */
  def decode(bytes: Array[Byte]): Option[WavCodec.Audio] = {
    if (bytes.length < 12) return None
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F')) return None
    if (!(bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E')) return None
    var i = 12
    var rate = -1
    var blockAlign = -1
    var samplesPerBlock = -1
    var factSamples = -1L
    var data: Array[Byte] = null
    while (i + 8 <= bytes.length) {
      val id = new String(bytes, i, 4, "US-ASCII")
      val size = le32(bytes, i + 4)
      if (size < 0 || i + 8 + size > bytes.length) return None
      val sz = size.toInt
      if (id == "fmt " && sz >= 20) {
        if (le16(bytes, i + 8) != 17) return None  // IMA ADPCM only
        if (le16(bytes, i + 10) != 1) return None  // mono only
        rate = le32(bytes, i + 12).toInt
        blockAlign = le16(bytes, i + 20)
        if (le16(bytes, i + 22) != 4) return None  // 4-bit nibbles only
        samplesPerBlock = le16(bytes, i + 26)      // after cbSize
      } else if (id == "fact" && sz >= 4) {
        factSamples = le32(bytes, i + 8)
      } else if (id == "data") {
        if (blockAlign < 5) return None // fmt must precede data
        data = java.util.Arrays.copyOfRange(bytes, i + 8, i + 8 + sz)
      }
      i += 8 + sz + (sz & 1)
    }
    if (rate <= 0 || data == null || samplesPerBlock <= 0) return None
    if (samplesPerBlock != (blockAlign - 4) * 2 + 1) return None
    if (data.length % blockAlign != 0) return None
    val nBlocks = data.length / blockAlign
    val maxSamples = nBlocks.toLong * samplesPerBlock
    val total = if (factSamples >= 0) factSamples else maxSamples
    if (total > maxSamples || total > (1L << 26)) return None
    val out = new Array[Short](total.toInt)
    var n = 0
    var b = 0
    while (b < nBlocks && n < out.length) {
      val base = b * blockAlign
      var pred = (le16(data, base) << 16) >> 16 // sign-extend int16
      var index = data(base + 2) & 0xff
      if (index > 88) return None
      out(n) = pred.toShort; n += 1
      var k = 0
      val nNibbles = (blockAlign - 4) * 2
      while (k < nNibbles && n < out.length) {
        val byte = data(base + 4 + (k >> 1)) & 0xff
        val nib = if ((k & 1) == 0) byte & 0x0f else (byte >> 4) & 0x0f
        val (p, ix) = step(pred, index, nib)
        pred = p; index = ix
        out(n) = p.toShort; n += 1
        k += 1
      }
      b += 1
    }
    if (n < out.length) return None // data ended before fact count
    Some(WavCodec.Audio(rate, 1, out))
  }

  /** Closed-form encoded size (the oracle's device): fixed 60-byte
    * envelope (12 RIFF + 28 fmt-with-extension + 12 fact + 8 data
    * header) + ceil(n / samplesPerBlock(blockAlign)) · blockAlign. */
  def encodedSize(nSamples: Int, blockAlign: Int = 20): Long = {
    val spb = (blockAlign - 4) * 2 + 1
    val nBlocks = (nSamples + spb - 1) / spb
    60L + nBlocks.toLong * blockAlign
  }

  /** Deterministic mono IMA-ADPCM encode (greedy nibble quantizer).
    * Signals CONSTANT within each block round-trip exactly (see the
    * object scaladoc); everything else is normally lossy. */
  def encode(a: WavCodec.Audio, blockAlign: Int = 20): Array[Byte] = {
    require(a.channels == 1, "IMA ADPCM encoder is mono")
    require(blockAlign >= 5, "blockAlign must hold a header + nibbles")
    val spb = (blockAlign - 4) * 2 + 1
    val n = a.samples.length
    val nBlocks = (n + spb - 1) / spb
    val out = java.nio.ByteBuffer.allocate((60 + nBlocks.toLong * blockAlign).toInt)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(52 + nBlocks * blockAlign)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(20)
      .putShort(17).putShort(1).putInt(a.sampleRate)
      .putInt(a.sampleRate * blockAlign / spb) // nominal byte rate
      .putShort(blockAlign.toShort).putShort(4)
      .putShort(2).putShort(spb.toShort) // cbSize, samples per block
    out.put("fact".getBytes("US-ASCII")).putInt(4).putInt(n)
    out.put("data".getBytes("US-ASCII")).putInt(nBlocks * blockAlign)
    var index = 0
    var b = 0
    while (b < nBlocks) {
      val base = b * spb
      val first = if (base < n) a.samples(base).toInt else 0
      out.putShort(first.toShort).put(index.toByte).put(0.toByte)
      var pred = first
      var k = 0
      var byteAcc = 0
      while (k < (blockAlign - 4) * 2) {
        val j = base + 1 + k
        val target = if (j < n) a.samples(j).toInt else pred
        val st = stepTable(index)
        var delta = target - pred
        var nib = if (delta < 0) { delta = -delta; 8 } else 0
        if (delta >= st) { nib |= 4; delta -= st }
        if (delta >= (st >> 1)) { nib |= 2; delta -= st >> 1 }
        if (delta >= (st >> 2)) nib |= 1
        val (p, ix) = step(pred, index, nib)
        pred = p; index = ix
        if ((k & 1) == 0) byteAcc = nib
        else { out.put((byteAcc | (nib << 4)).toByte); byteAcc = 0 }
        k += 1
      }
      b += 1
    }
    out.array()
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
