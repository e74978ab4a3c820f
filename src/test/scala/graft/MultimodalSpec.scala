package graft

import org.apache.spark.sql.Row

import graft.mm.{AdpcmCodec, GifCodec, JpegCodec, Multimodal, PngCodec, PpmCodec, WavCodec}

class MultimodalSpec extends SparkSpec {

  private lazy val media = {
    val rows = Seq(
      Row(1L, "image", "img-one-payload".getBytes("UTF-8"), Row(64, 48, null, null)),
      Row(2L, "image", "img-two-different".getBytes("UTF-8"), Row(32, 32, null, null)),
      Row(3L, "audio", "pcm-audio-bytes".getBytes("UTF-8"), Row(null, null, 16000, null)),
      Row(4L, "video", "vid-bytes".getBytes("UTF-8"), Row(640, 480, null, 10)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)
  }

  test("extractFeatures emits fixed-dim float vectors, drops bytes") {
    val out = Multimodal.extractFeatures(media, batchSize = 2, dim = 16)
    assert(out.schema.fieldNames.toSeq == Seq("media_id", "kind", "features"))
    val rows = out.collect()
    assert(rows.length == 4)
    rows.foreach(r => assert(r.getSeq[Float](2).length == 16))
    // deterministic + content-sensitive
    val again = Multimodal.extractFeatures(media, batchSize = 3, dim = 16).collect()
    assert(rows.sortBy(_.getLong(0)).map(_.getSeq[Float](2)).toSeq ==
      again.sortBy(_.getLong(0)).map(_.getSeq[Float](2)).toSeq)
    val f = rows.sortBy(_.getLong(0))
    assert(f(0).getSeq[Float](2) != f(1).getSeq[Float](2))
  }

  test("resizeImages touches only image rows and preserves schema") {
    val out = Multimodal.resizeImages(media, 8, 8).collect().sortBy(_.getLong(0))
    assert(new String(out(0).getAs[Array[Byte]]("bytes"), "UTF-8").startsWith("resized:8x8:"))
    assert(new String(out(2).getAs[Array[Byte]]("bytes"), "UTF-8") == "pcm-audio-bytes")
    assert(Multimodal.resizeImages(media, 8, 8).schema == media.schema)
  }

  test("multimodal retrieval: real PPM decode → features → cosine top-1 finds the near-dup") {
    import org.apache.spark.sql.functions._
    import graft.sim.Similarity
    // six brightness variants of the gradient + ONE near-copy of variant 0
    // (a single pixel nudged): after decode → channel-mean/histogram
    // features → L2 normalize, the near-copy must be variant 0's nearest
    // neighbor — the end-to-end shape of image near-dup detection
    def img(scale: Double, tweak: Int = 0): Array[Byte] = {
      val px = new Array[Byte](4 * 4 * 3)
      for (y <- 0 until 4; x <- 0 until 4) {
        val o = (y * 4 + x) * 3
        px(o) = math.min(255, (x * 60 * scale).toInt).toByte
        px(o + 1) = math.min(255, (y * 60 * scale).toInt).toByte
        px(o + 2) = math.min(255, (128 * scale).toInt).toByte
      }
      if (tweak != 0) px(0) = (px(0) + tweak).toByte
      PpmCodec.encode(PpmCodec.Image(4, 4, px))
    }
    val rows = (0 until 6).map(i =>
      Row(i.toLong, "image", img(0.5 + i * 0.3), Row(4, 4, null, null))) :+
      Row(10L, "image", img(0.5, tweak = 3), Row(4, 4, null, null))
    val mediaDf = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), Multimodal.mediaSchema)
    val feats = Multimodal.extractFeatures(mediaDf, batchSize = 3, dim = 16)
    val norm = sqrt(aggregate(col("features"), lit(0.0d),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    val normed = feats.select(col("media_id"),
      transform(col("features"), x => x.cast("double") / norm).as("e"))
    val queries = normed.filter(col("media_id") === 0L)
      .select(col("media_id").as("qid"), col("e").as("qe"))
    val cands = normed.filter(col("media_id") =!= 0L)
      .select(col("media_id").as("cid"), col("e").as("ce"))
    val top = Similarity.cosineTopK(queries, cands, 1).collect()
    assert(top.length == 1 && top.head.getAs[Long]("cid") == 10L,
      s"nearest neighbor of the base image must be its near-copy, got ${top.toSeq}")
    assert(top.head.getAs[Double]("score") > 0.999, s"near-dup cosine ${top.head}")
  }

  /** 4×4 P6 gradient: pixel (x,y) = (x*60, y*60, 128). */
  private def gradientPpm: Array[Byte] = {
    val px = new Array[Byte](4 * 4 * 3)
    for (y <- 0 until 4; x <- 0 until 4) {
      val o = (y * 4 + x) * 3
      px(o) = (x * 60).toByte; px(o + 1) = (y * 60).toByte; px(o + 2) = 128.toByte
    }
    PpmCodec.encode(PpmCodec.Image(4, 4, px))
  }

  /** 100 Hz square-ish wave, 1 channel, 8 kHz PCM-16, 800 samples. */
  private def toneWav: Array[Byte] = {
    val samples = Array.tabulate(800)(i =>
      (if ((i / 40) % 2 == 0) 12000 else -12000).toShort)
    WavCodec.encode(WavCodec.Audio(8000, 1, samples))
  }

  test("PPM codec: encode/decode round-trip and header edge cases") {
    val bytes = gradientPpm
    val img = PpmCodec.decode(bytes).get
    assert(img.width == 4 && img.height == 4)
    assert(PpmCodec.decode(PpmCodec.encode(img)).get.pixels.toSeq == img.pixels.toSeq)
    // comments in header are legal PPM
    val withComment = ("P6\n# a comment\n4 4\n255\n").getBytes("US-ASCII") ++
      img.pixels
    assert(PpmCodec.decode(withComment).exists(_.width == 4))
    // malformed inputs degrade to None, never throw
    assert(PpmCodec.decode("P6\n4 4\n255\n".getBytes).isEmpty)   // truncated raster
    assert(PpmCodec.decode("P5\n4 4\n255\n".getBytes).isEmpty)   // wrong magic
    assert(PpmCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("PPM codec: nearest-neighbor resize picks the exact source pixels") {
    val img = PpmCodec.decode(gradientPpm).get
    val small = PpmCodec.resizeNearest(img, 2, 2)
    assert(small.width == 2 && small.height == 2)
    // 2x2 from 4x4: source pixels (0,0),(2,0),(0,2),(2,2)
    val expect = Seq((0, 0), (2, 0), (0, 2), (2, 2)).flatMap { case (x, y) =>
      val o = (y * 4 + x) * 3
      Seq(img.pixels(o), img.pixels(o + 1), img.pixels(o + 2))
    }
    assert(small.pixels.toSeq == expect)
  }

  test("WAV codec: encode/decode round-trip, rejects non-PCM and truncated data") {
    val audio = WavCodec.decode(toneWav).get
    assert(audio.sampleRate == 8000 && audio.channels == 1 && audio.samples.length == 800)
    assert(audio.samples(0) == 12000 && audio.samples(40) == -12000)
    // truncated file degrades to None
    assert(WavCodec.decode(toneWav.take(50)).isEmpty)
    assert(WavCodec.decode("RIFFjunk".getBytes).isEmpty)
  }

  test("real decode feeds the feature path: PPM means and WAV energy are exact") {
    val imgFeat = Multimodal.Codec.imageFeatures(gradientPpm, dim = 16)
    // channel means of the gradient: r = mean(0,60,120,180)/255, b = 128/255
    assert(math.abs(imgFeat(0) - 90f / 255f) < 1e-6f)
    assert(math.abs(imgFeat(1) - 90f / 255f) < 1e-6f)
    assert(math.abs(imgFeat(2) - 128f / 255f) < 1e-6f)
    assert(math.abs(imgFeat.drop(3).sum - 1f) < 1e-5f) // histogram normalized
    val wavFeat = Multimodal.Codec.imageFeatures(toneWav, dim = 16)
    assert(math.abs(wavFeat(0) - 12000f / 32768f) < 1e-4f) // RMS of square wave
    // unknown bytes take the stub path (byte histogram sums to 1)
    val stub = Multimodal.Codec.imageFeatures("not-a-media-file".getBytes, 16)
    assert(math.abs(stub.sum - 1f) < 1e-5f)
  }

  test("extractFeatures and resizeImages run real codecs through the batch plumbing") {
    val rows = Seq(
      Row(1L, "image", gradientPpm, Row(4, 4, null, null)),
      Row(2L, "audio", toneWav, Row(null, null, 8000, null)),
      Row(3L, "image", "not-really-an-image".getBytes, Row(null, null, null, null)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)
    val feats = Multimodal.extractFeatures(df, batchSize = 2, dim = 16)
      .collect().sortBy(_.getLong(0))
    assert(math.abs(feats(0).getSeq[Float](2).head - 90f / 255f) < 1e-6f)
    assert(math.abs(feats(1).getSeq[Float](2).head - 12000f / 32768f) < 1e-4f)
    assert(feats(2).getSeq[Float](2).length == 16) // stub fallback, no throw

    val resized = Multimodal.resizeImages(df, 2, 2).collect().sortBy(_.getLong(0))
    val out = PpmCodec.decode(resized(0).getAs[Array[Byte]]("bytes")).get
    assert(out.width == 2 && out.height == 2)
    // audio row untouched; unparseable image row got the stub tag
    assert(resized(1).getAs[Array[Byte]]("bytes").toSeq == toneWav.toSeq)
    assert(new String(resized(2).getAs[Array[Byte]]("bytes"), "UTF-8")
      .startsWith("resized:2x2:"))
  }

  test("codec round-trip properties on seeded random media") {
    val rnd = new scala.util.Random(271)
    (1 to 20).foreach { _ =>
      val w = 1 + rnd.nextInt(12)
      val h = 1 + rnd.nextInt(12)
      val px = Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
      val img = PpmCodec.Image(w, h, px)
      val back = PpmCodec.decode(PpmCodec.encode(img)).get
      assert(back.width == w && back.height == h && back.pixels.toSeq == px.toSeq)
      // resize to own size is identity for nearest-neighbor
      val same = PpmCodec.resizeNearest(img, w, h)
      assert(same.pixels.toSeq == px.toSeq)
    }
    (1 to 20).foreach { _ =>
      val n = 1 + rnd.nextInt(500)
      val ch = 1 + rnd.nextInt(2)
      val samples = Array.fill(n * ch)((rnd.nextInt(65536) - 32768).toShort)
      val a = WavCodec.Audio(8000 + rnd.nextInt(40000), ch, samples)
      val back = WavCodec.decode(WavCodec.encode(a)).get
      assert(back.sampleRate == a.sampleRate && back.channels == ch)
      assert(back.samples.toSeq == samples.toSeq)
    }
  }

  test("WAV decoder honors word alignment for odd-sized chunks") {
    // craft: RIFF/WAVE + a 3-byte junk chunk (odd, so a pad byte
    // follows) + valid fmt + data; the walk must skip the pad
    val a = WavCodec.Audio(8000, 1, Array[Short](100, -100, 3000))
    val canonical = WavCodec.encode(a)
    val fmtAndData = java.util.Arrays.copyOfRange(canonical, 12, canonical.length)
    val junk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte](1, 2, 3, 0) // 3 data + 1 pad
    val buf = java.nio.ByteBuffer
      .allocate(12 + junk.length + fmtAndData.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
      .putInt(4 + junk.length + fmtAndData.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put(junk).put(fmtAndData)
    val got = WavCodec.decode(buf.array())
    assert(got.exists(_.samples.toSeq == Seq[Short](100, -100, 3000)),
      s"odd-chunk walk failed: $got")
  }

  test("sampleFrames is metadata-only and strides correctly") {
    val out = Multimodal.sampleFrames(media, stride = 3).collect()
    assert(out.length == 1)
    assert(out.head.getSeq[Long](1) == Seq(0L, 3L, 6L, 9L))
    // plan never reads the bytes column
    val plan = Multimodal.sampleFrames(media, 3).queryExecution.optimizedPlan.toString
    assert(!plan.contains("bytes,") || !plan.contains("#bytes"), plan)
  }

  // ------------------------------------------------- PNG codec (r15)

  /** Wraps raw (filtered) scanline bytes in a valid PNG container using
    * a REAL Deflater stream — exercises the decoder against compressed
    * zlib, not just our own stored blocks. */
  private def pngFromRaw(w: Int, h: Int, colorType: Int, raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length + 64)
    val n = d.deflate(buf); d.end()
    val idat = java.util.Arrays.copyOf(buf, n)
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(12 + data.length)
      out.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      out.putInt(crc.getValue.toInt).array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
      .put(8.toByte).put(colorType.toByte).put(0.toByte).put(0.toByte).put(0.toByte).array()
    Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n') ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", idat) ++ chunk("IEND", Array.empty[Byte])
  }

  test("PNG codec: encode/decode round-trip, deterministic size, features parity with PPM") {
    val w = 7; val h = 5
    val px = Array.tabulate(w * h * 3)(j => ((j * 11 + 3) % 256).toByte)
    val img = PpmCodec.Image(w, h, px)
    val png = PngCodec.encode(img)
    assert(png.length == PngCodec.encodedSize(w, h), s"${png.length}")
    val back = PngCodec.decode(png).get
    assert(back.width == w && back.height == h && back.pixels.toSeq == px.toSeq)
    // the SAME pixels through PPM and PNG must extract identical features
    val viaPpm = Multimodal.Codec.imageFeatures(PpmCodec.encode(img))
    val viaPng = Multimodal.Codec.imageFeatures(png)
    assert(viaPpm.toSeq == viaPng.toSeq)
    // resize preserves the container format: a resized PNG is a PNG
    val resized = Multimodal.Codec.resize(png, 3, 2)
    val rimg = PngCodec.decode(resized).get
    assert(rimg.width == 3 && rimg.height == 2)
    assert(rimg.pixels.toSeq == PpmCodec.resizeNearest(img, 3, 2).pixels.toSeq)
  }

  test("PNG codec: all five filter types unfilter correctly under a real Deflater stream") {
    val w = 6; val h = 5; val stride = w * 3
    val px = Array.tabulate(stride * h)(j => ((j * 37 + j * j % 19) % 256).toByte)
    // forward-filter each row with filter type = row % 5 (the encoder
    // inverse of the decoder's unfilter branches)
    val raw = new Array[Byte]((1 + stride) * h)
    for (y <- 0 until h) {
      val ft = y % 5
      raw(y * (1 + stride)) = ft.toByte
      for (x <- 0 until stride) {
        val cur = px(y * stride + x) & 0xff
        val left = if (x >= 3) px(y * stride + x - 3) & 0xff else 0
        val up = if (y > 0) px((y - 1) * stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= 3) px((y - 1) * stride + x - 3) & 0xff else 0
        val v = ft match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
            cur - (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
        }
        raw(y * (1 + stride) + 1 + x) = (v & 0xff).toByte
      }
    }
    val img = PngCodec.decode(pngFromRaw(w, h, 2, raw)).get
    assert(img.pixels.toSeq == px.toSeq, "filtered scanlines did not unfilter to the source")
  }

  test("PNG codec: greyscale and RGBA normalize to RGB") {
    val g = Array.tabulate(4 * 3)(j => (j * 20).toByte) // 4x3 grey
    val grawRows = (0 until 3).flatMap(y => 0.toByte +: g.slice(y * 4, y * 4 + 4).toSeq).toArray
    val grey = PngCodec.decode(pngFromRaw(4, 3, 0, grawRows)).get
    assert(grey.width == 4 && grey.height == 3)
    assert((0 until 12).forall(j => grey.pixels(j * 3) == g(j) &&
      grey.pixels(j * 3 + 1) == g(j) && grey.pixels(j * 3 + 2) == g(j)))
    val rgba = Array.tabulate(2 * 2 * 4)(j => (j * 13).toByte)
    val rrawRows = (0 until 2).flatMap(y => 0.toByte +: rgba.slice(y * 8, y * 8 + 8).toSeq).toArray
    val rgb = PngCodec.decode(pngFromRaw(2, 2, 6, rrawRows)).get
    assert(rgb.pixels.toSeq == Seq(0, 13, 26, 52, 65, 78, 104, 117, 130, 156, 169, 182).map(_.toByte))
  }

  test("PNG codec: corrupt blobs degrade to the stub path, never throw") {
    val img = PpmCodec.Image(5, 4, Array.tabulate(60)(j => (j * 3).toByte))
    val png = PngCodec.encode(img)
    // truncated IDAT (cut mid-stream), bad magic, interlaced flag,
    // 16-bit depth: every one must decode to None
    val truncated = png.take(png.length - 20)
    assert(PngCodec.decode(truncated).isEmpty)
    assert(PngCodec.decode("nonsense".getBytes).isEmpty)
    val interlaced = png.clone(); interlaced(8 + 8 + 12) = 1 // IHDR interlace byte
    assert(PngCodec.decode(interlaced).isEmpty)
    val deep = png.clone(); deep(8 + 8 + 8) = 16 // IHDR bit depth
    assert(PngCodec.decode(deep).isEmpty)
    // zlib FDICT bit set (preset dictionary — no PNG encoder emits one):
    // Inflater.inflate() returns 0 with needsDictionary() true and
    // needsInput()/finished() false, so a decoder that only treats
    // needsInput() as corrupt would spin forever on this blob (r15
    // advisory): any zero-progress iteration must bail to None
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(12 + data.length)
      out.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      out.putInt(crc.getValue.toInt).array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13).putInt(5).putInt(4)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte).array()
    // 0x78 0x20: CMF deflate/32k, FLG with FDICT — (0x7820 % 31) == 0 so
    // the header itself is valid; DICTID + junk follow
    val fdictIdat = Array[Byte](0x78, 0x20, 1, 2, 3, 4, 9, 9, 9, 9, 9, 9)
    val fdictPng = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n') ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", fdictIdat) ++ chunk("IEND", Array.empty[Byte])
    assert(PngCodec.decode(fdictPng).isEmpty)
    // and the operator-facing dispatch falls back to the stub features
    // instead of raising — one corrupt blob must never kill a job
    val f = Multimodal.Codec.imageFeatures(truncated)
    assert(f.toSeq == Multimodal.StubCodec.imageFeatures(truncated).toSeq)
  }

  test("GIF codec: encode/decode round-trip, deterministic size, features parity with PPM") {
    val w = 9; val h = 7
    // ≤256 distinct colors (a gray ramp) → lossless exact-palette encode
    val px = Array.tabulate(w * h * 3)(j => { val v = ((j / 3) * 5 + 3) % 256; v.toByte })
    val img = PpmCodec.Image(w, h, px)
    val gif = GifCodec.encode(img)
    assert(gif.length == GifCodec.encodedSize(w, h), s"${gif.length}")
    val back = GifCodec.decode(gif).get
    assert(back.width == w && back.height == h && back.pixels.toSeq == px.toSeq)
    // the SAME pixels through PPM and GIF must extract identical features
    val viaPpm = Multimodal.Codec.imageFeatures(PpmCodec.encode(img))
    val viaGif = Multimodal.Codec.imageFeatures(gif)
    assert(viaPpm.toSeq == viaGif.toSeq)
    // resize preserves the container format: a resized GIF is a GIF
    val resized = Multimodal.Codec.resize(gif, 4, 3)
    val rimg = GifCodec.decode(resized).get
    assert(rimg.width == 4 && rimg.height == 3)
    assert(rimg.pixels.toSeq == PpmCodec.resizeNearest(img, 4, 3).pixels.toSeq)
    // the periodic-CLEAR path: an image larger than 252 pixels forces a
    // mid-stream CLEAR and the size formula must still be exact
    val w2 = 23; val h2 = 17 // 391 pixels > 252
    val px2 = Array.tabulate(w2 * h2 * 3)(j => { val v = ((j / 3) * 11 + 1) % 256; v.toByte })
    val big = GifCodec.encode(PpmCodec.Image(w2, h2, px2))
    assert(big.length == GifCodec.encodedSize(w2, h2), s"${big.length}")
    assert(GifCodec.decode(big).get.pixels.toSeq == px2.toSeq)
    // >256 distinct colors quantize to the fixed R3G3B2 palette —
    // deterministic, still decodable, dims preserved
    val rich = PpmCodec.Image(20, 15, Array.tabulate(20 * 15 * 3)(j => (j * 7 % 256).toByte))
    val q = GifCodec.decode(GifCodec.encode(rich)).get
    assert(q.width == 20 && q.height == 15)
  }

  test("GIF codec: full variable-width LZW decode (dictionary growth) via a greedy compressor") {
    // spec-local REAL LZW compressor (greedy longest-match, growing code
    // width 9→12, KwKwK cases included): the flat-9-bit production
    // encoder never grows the dictionary, so this pins the decoder's
    // growth/just-added-entry paths on genuinely compressed streams
    def compress(indices: Array[Int]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var acc = 0L; var accBits = 0; var width = 9
      def emit(code: Int): Unit = {
        acc |= (code.toLong & ((1 << width) - 1)) << accBits; accBits += width
        while (accBits >= 8) { out.write((acc & 0xff).toInt); acc >>>= 8; accBits -= 8 }
      }
      val dict = scala.collection.mutable.HashMap[List[Int], Int]()
      var next = 258
      emit(256) // CLEAR
      var cur = List(indices(0))
      for (j <- 1 until indices.length) {
        val ext = indices(j) :: cur // reversed key: cheap prepend
        if (dict.contains(ext)) cur = ext
        else {
          emit(if (cur.length == 1) cur.head else dict(cur))
          if (next < 4096) {
            dict(ext) = next
            next += 1
            // encoder widens when the NEXT code to assign reaches 2^width
            if (next == (1 << width) + 1 && width < 12) width += 1
          }
          cur = List(indices(j))
        }
      }
      emit(if (cur.length == 1) cur.head else dict(cur))
      emit(257) // EOI
      if (accBits > 0) out.write((acc & 0xff).toInt)
      out.toByteArray
    }
    // highly repetitive pixels → deep dictionary chains + KwKwK
    val w = 64; val h = 48 // 3072 pixels: enough adds to cross 512 → 10-bit codes
    val idx = Array.tabulate(w * h)(j => (j % 7) * 3 % 256)
    val payload = compress(idx)
    // wrap in a minimal GIF envelope with a 256-gray global table
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    w16(w); w16(h); out.write(0x87); out.write(0); out.write(0)
    (0 until 256).foreach(v => { out.write(v); out.write(v); out.write(v) })
    out.write(0x2c); w16(0); w16(0); w16(w); w16(h); out.write(0)
    out.write(8)
    var off = 0
    while (off < payload.length) {
      val len = math.min(255, payload.length - off)
      out.write(len); out.write(payload, off, len); off += len
    }
    out.write(0); out.write(0x3b)
    val gif = out.toByteArray
    // the compressed stream must be materially smaller than flat 9-bit
    assert(gif.length < GifCodec.encodedSize(w, h) * 3 / 4,
      s"greedy LZW should compress the repetitive ramp: ${gif.length}")
    val img = GifCodec.decode(gif).get
    assert(img.width == w && img.height == h)
    assert((0 until w * h).forall(j => (img.pixels(j * 3) & 0xff) == idx(j)),
      "decoded indices must match the source through dictionary growth")
  }

  test("qMediaGifDecode: executor-side LZW decode reproduces the generating formula exactly") {
    val rows = Multimodal.qMediaGifDecode(spark, sfDir).collect()
    assert(rows.length == 48)
    // independently recompute every aggregate from the fixture formula —
    // one wrong pixel anywhere in the decode path breaks this
    val docs = Tables.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("n_chars"))
      .orderBy("doc_id").limit(48).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    rows.foreach { r =>
      val id = r.getString(0).drop(1).dropRight(4).toLong
      val nc = docs(id)
      val w = (nc % 9 + 2).toInt; val h = (id % 6 + 2).toInt
      val vs = (0 until w * h).map(j => ((j * 5 + id) % 256).toInt)
      assert(r.getInt(1) == w && r.getInt(2) == h, r.toString)
      assert(r.getLong(3) == w * h && r.getLong(4) == vs.map(_.toLong).sum, r.toString)
      assert(r.getInt(5) == vs.min && r.getInt(6) == vs.max, r.toString)
    }
  }

  /** Shared scaffolding for the hand-built JPEG stream tests (one copy,
    * four tests): MSB-first bit writer with 0xFF stuffing, marker
    * helpers, and the T.81 Annex C canonical Huffman assignment. */
  private final class JpegStreamWriter {
    private val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v >> 8); w8(v) }
    def dht(cls: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      w16(0xffc4); w16(2 + 17 + vals.length); w8(cls << 4)
      (1 to 16).foreach(l => w8(bits(l))); vals.foreach(w8)
    }
    private var acc = 0L
    private var nb = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1)); nb += len
      while (nb >= 8) {
        val b = ((acc >> (nb - 8)) & 0xff).toInt
        w8(b); if (b == 0xff) w8(0)
        nb -= 8
      }
    }
    def putCoef(huff: Map[Int, (Int, Int)], sym: Int, v: Int): Unit = {
      val (c, l) = huff(sym); put(c, l)
      val s = sym & 0x0f
      if (s > 0) put(if (v < 0) v + (1 << s) - 1 else v, s)
    }
    def pad(): Unit = if (nb > 0) put((1 << (8 - nb)) - 1, 8 - nb)
    def bytes: Array[Byte] = out.toByteArray
  }

  private def canonicalCodes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0; var k = 0
    val m = scala.collection.mutable.Map[Int, (Int, Int)]()
    for (len <- 1 to 16) {
      for (_ <- 0 until bits(len)) { m(vals(k)) = (code, len); code += 1; k += 1 }
      code <<= 1
    }
    m.toMap
  }

  test("JPEG codec: block-constant images round-trip EXACTLY (Q00=8 device), ragged dims") {
    // every 8x8 block region constant → only the DC coefficient is
    // nonzero and Q00 = 8 makes quantization the identity on it, so the
    // full entropy-coded baseline stream reproduces the source pixels
    // bit-for-bit — the property the driver key's oracle relies on
    for (id <- 0L until 40L) {
      val w = (id % 11 + 6).toInt
      val h = (id % 9 + 6).toInt
      val bw = (w + 7) / 8
      val px = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        val v = (((y / 8) * bw + x / 8) * 37 + id) % 256
        val o = (y * w + x) * 3
        px(o) = v.toByte; px(o + 1) = v.toByte; px(o + 2) = v.toByte
      }
      val img = PpmCodec.Image(w, h, px)
      val enc = JpegCodec.encode(img)
      // deterministic at the byte level
      assert(java.util.Arrays.equals(enc, JpegCodec.encode(img)))
      val back = JpegCodec.decode(enc).getOrElse(fail(s"id=$id: decode failed"))
      assert(back.width == w && back.height == h, s"id=$id dims")
      assert(back.pixels.toSeq == px.toSeq, s"id=$id pixels differ")
      // the SAME pixels through PPM and JPEG must extract identical features
      assert(Multimodal.Codec.imageFeatures(enc).toSeq ==
        Multimodal.Codec.imageFeatures(PpmCodec.encode(img)).toSeq)
    }
  }

  test("JPEG codec: general images exercise the AC path and decode within lossy tolerance") {
    val w = 21; val h = 17
    val px = Array.tabulate(w * h * 3)(j => (((j / 3) * 7 + 13) % 256).toByte)
    val img = PpmCodec.Image(w, h, px)
    val enc = JpegCodec.encode(img)
    val back = JpegCodec.decode(enc).get
    assert(back.width == w && back.height == h)
    var maxErr = 0
    for (j <- 0 until w * h) {
      val o = j * 3
      val luma = (299 * (px(o) & 0xff) + 587 * (px(o + 1) & 0xff) +
        114 * (px(o + 2) & 0xff)) / 1000
      maxErr = math.max(maxErr, math.abs(luma - (back.pixels(o) & 0xff)))
    }
    assert(maxErr > 0, "a non-block-constant ramp must take the lossy path (AC real)")
    assert(maxErr <= 16, s"lossy error out of JPEG range: $maxErr")
    // grayscale output: channels replicate
    assert((0 until w * h).forall(j =>
      back.pixels(j * 3) == back.pixels(j * 3 + 1) && back.pixels(j * 3) == back.pixels(j * 3 + 2)))
    // resize preserves the container format: a resized JPEG is a JPEG
    val resized = Multimodal.Codec.resize(enc, 8, 8)
    val rimg = JpegCodec.decode(resized).get
    assert(rimg.width == 8 && rimg.height == 8)
  }

  test("JPEG codec: hand-built coefficient stream matches a naive direct IDCT (independent path)") {
    // Build a full baseline file byte-by-byte with spec-local Huffman
    // tables and a known coefficient set (run-lengths incl. ZRL), then
    // compare the decoder's output against a NAIVE O(64^2) IDCT computed
    // here — two independent implementations of dequant/zigzag/IDCT.
    val zigzag = Array(
      0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
      12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
      35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
      58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)
    val qNat = Array.tabulate(64)(j => 1 + j % 13) // varied dequant entries
    val dcBits = Array(0, 0, 3, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    val dcVals = Array(0, 1, 2, 3, 4, 5) // categories 0..5
    val acBits = Array(0, 0, 0, 5, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    val acVals = Array(0x00, 0x02, 0x21, 0x42, 0xf0) // EOB,(0,2),(2,1),(4,2),ZRL
    val dcC = canonicalCodes(dcBits, dcVals); val acC = canonicalCodes(acBits, acVals)
    val b = new JpegStreamWriter
    b.w16(0xffd8)
    b.w16(0xffdb); b.w16(67); b.w8(0); (0 until 64).foreach(k => b.w8(qNat(zigzag(k))))
    b.w16(0xffc0); b.w16(11); b.w8(8); b.w16(8); b.w16(8); b.w8(1); b.w8(1); b.w8(0x11); b.w8(0)
    b.dht(0, dcBits, dcVals); b.dht(1, acBits, acVals)
    b.w16(0xffda); b.w16(8); b.w8(1); b.w8(1); b.w8(0x00); b.w8(0); b.w8(63); b.w8(0)
    // DC = 5 (cat 3); AC: zz1 = -3 (0,2), two zeros then zz4 = +1 (2,1),
    // twenty zeros then zz25 = +2 (ZRL + (4,2)), EOB
    b.putCoef(dcC, 3, 5)
    b.putCoef(acC, 0x02, -3)
    b.putCoef(acC, 0x21, 1)
    b.putCoef(acC, 0xf0, 0)
    b.putCoef(acC, 0x42, 2)
    b.putCoef(acC, 0x00, 0)
    b.pad()
    b.w16(0xffd9)
    val img = JpegCodec.decode(b.bytes).getOrElse(fail("hand-built stream must decode"))
    // naive expectation
    val coefNat = new Array[Int](64)
    coefNat(zigzag(0)) = 5; coefNat(zigzag(1)) = -3
    coefNat(zigzag(4)) = 1; coefNat(zigzag(25)) = 2
    def C(u: Int) = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    for (y <- 0 until 8; x <- 0 until 8) {
      var s = 0.0
      for (v <- 0 until 8; u <- 0 until 8)
        s += C(u) * C(v) / 4.0 * (coefNat(v * 8 + u) * qNat(v * 8 + u)) *
          math.cos((2 * x + 1) * u * math.Pi / 16.0) *
          math.cos((2 * y + 1) * v * math.Pi / 16.0)
      val want = math.max(0, math.min(255, math.round(s).toInt + 128))
      assert((img.pixels((y * 8 + x) * 3) & 0xff) == want, s"pixel ($x,$y)")
    }
  }

  test("JPEG codec: YCbCr 4:4:4 color decodes with per-component prediction and RGB conversion") {
    // three DC-only components (Y=+10, Cb=-20, Cr=+15 at Q00=8) — the
    // planes are 138/108/143 and the expected RGB is hand-computed from
    // the BT.601 inverse: R=159, G=134, B=103 for every pixel
    val b = new JpegStreamWriter
    b.w16(0xffd8)
    b.w16(0xffdb); b.w16(67); b.w8(0); b.w8(8); (1 until 64).foreach(_ => b.w8(16))
    b.w16(0xffc0); b.w16(17); b.w8(8); b.w16(8); b.w16(8); b.w8(3)
    for (cid <- 1 to 3) { b.w8(cid); b.w8(0x11); b.w8(0) }
    val dcBits = Array(0, 0, 3, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    val dcVals = Array(0, 1, 2, 3, 4, 5)
    val acBits = Array(0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    val acVals = Array(0x00)
    b.dht(0, dcBits, dcVals); b.dht(1, acBits, acVals)
    b.w16(0xffda); b.w16(12); b.w8(3)
    for (cid <- 1 to 3) { b.w8(cid); b.w8(0x00) }
    b.w8(0); b.w8(63); b.w8(0)
    val dcC = canonicalCodes(dcBits, dcVals); val acC = canonicalCodes(acBits, acVals)
    def cat(v: Int): Int = { var a = math.abs(v); var t = 0; while (a != 0) { a >>= 1; t += 1 }; t }
    for (dc <- Seq(10, -20, 15)) // per-component predictors all start at 0
      { b.putCoef(dcC, cat(dc), dc); b.putCoef(acC, 0x00, 0) }
    b.pad()
    b.w16(0xffd9)
    val img = JpegCodec.decode(b.bytes).getOrElse(fail("color stream must decode"))
    assert(img.width == 8 && img.height == 8)
    for (j <- 0 until 64) {
      assert((img.pixels(j * 3) & 0xff) == 159, s"R at $j")
      assert((img.pixels(j * 3 + 1) & 0xff) == 134, s"G at $j")
      assert((img.pixels(j * 3 + 2) & 0xff) == 103, s"B at $j")
    }
  }

  test("JPEG codec: real-world layout variants — combined DHT, COM segment, fill bytes") {
    // most camera/library JPEGs pack BOTH Huffman tables into one DHT
    // segment, carry COM/APPn text, and may pad with 0xFF fill bytes
    // before markers; a decoder that only accepts its own encoder's
    // one-table-per-segment layout would reject them
    val b = new JpegStreamWriter
    b.w16(0xffd8)
    b.w8(0xff) // fill byte before the next marker
    val comment = "shot on a potato".getBytes("US-ASCII")
    b.w16(0xfffe); b.w16(2 + comment.length); comment.foreach(c => b.w8(c & 0xff)) // COM
    b.w16(0xffdb); b.w16(67); b.w8(0); b.w8(8); (1 until 64).foreach(_ => b.w8(16))
    b.w16(0xffc0); b.w16(11); b.w8(8); b.w16(8); b.w16(8); b.w8(1); b.w8(1); b.w8(0x11); b.w8(0)
    val dcBits = Array(0, 0, 3, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    val dcVals = Array(0, 1, 2, 3, 4, 5)
    val acBits = Array(0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    val acVals = Array(0x00)
    // ONE DHT segment holding BOTH tables back to back
    b.w16(0xffc4); b.w16(2 + (17 + dcVals.length) + (17 + acVals.length))
    b.w8(0x00); (1 to 16).foreach(l => b.w8(dcBits(l))); dcVals.foreach(b.w8)
    b.w8(0x10); (1 to 16).foreach(l => b.w8(acBits(l))); acVals.foreach(b.w8)
    b.w16(0xffda); b.w16(8); b.w8(1); b.w8(1); b.w8(0x00); b.w8(0); b.w8(63); b.w8(0)
    val dcC = canonicalCodes(dcBits, dcVals); val acC = canonicalCodes(acBits, acVals)
    b.putCoef(dcC, 3, 5) // DC = 5 → pixel 133
    b.putCoef(acC, 0x00, 0)
    b.pad()
    b.w16(0xffd9)
    val img = JpegCodec.decode(b.bytes).getOrElse(fail("variant layout must decode"))
    assert(img.width == 8 && img.height == 8)
    assert((img.pixels(0) & 0xff) == 133)
  }

  test("JPEG codec: restart markers reset DC prediction and bit alignment") {
    // two-block 16x8 grayscale with DRI=1: each block's DC is coded
    // ABSOLUTE (predictor reset at the RST0 boundary), stream re-aligns
    // to a byte before the marker
    val q0 = 8
    val b = new JpegStreamWriter
    b.w16(0xffd8)
    b.w16(0xffdb); b.w16(67); b.w8(0); b.w8(q0); (1 until 64).foreach(_ => b.w8(16))
    b.w16(0xffdd); b.w16(4); b.w16(1) // DRI = 1 MCU
    b.w16(0xffc0); b.w16(11); b.w8(8); b.w16(8); b.w16(16); b.w8(1); b.w8(1); b.w8(0x11); b.w8(0)
    val dcBits = Array(0, 0, 3, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    val dcVals = Array(0, 1, 2, 3, 4, 5)
    val acBits = Array(0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    val acVals = Array(0x00) // EOB only
    b.dht(0, dcBits, dcVals); b.dht(1, acBits, acVals)
    b.w16(0xffda); b.w16(8); b.w8(1); b.w8(1); b.w8(0x00); b.w8(0); b.w8(63); b.w8(0)
    val dcC = canonicalCodes(dcBits, dcVals); val acC = canonicalCodes(acBits, acVals)
    def cat(v: Int): Int = { var a = math.abs(v); var t = 0; while (a != 0) { a >>= 1; t += 1 }; t }
    def block(dcDiff: Int): Unit = {
      b.putCoef(dcC, cat(dcDiff), dcDiff)
      b.putCoef(acC, 0x00, 0)
    }
    block(10) // block A: DC = 10 → pixel 10*8/8 + 128 = 138
    b.pad()
    b.w16(0xffd0) // RST0: predictor resets
    block(-20) // block B: DC = -20 ABSOLUTE → pixel 108
    b.pad()
    b.w16(0xffd9)
    val img = JpegCodec.decode(b.bytes).getOrElse(fail("restart stream must decode"))
    assert(img.width == 16 && img.height == 8)
    assert((img.pixels(0) & 0xff) == 138, "block A constant")
    assert((img.pixels(8 * 3) & 0xff) == 108, "block B decodes ABSOLUTE after RST reset")
  }

  test("qMediaJpegDecode: executor-side baseline decode reproduces the block formula exactly") {
    val rows = Multimodal.qMediaJpegDecode(spark, sfDir).collect()
    assert(rows.length == 48)
    // independently recompute every aggregate from the fixture formula —
    // one wrong pixel anywhere in the Huffman/dequant/IDCT path breaks this
    val docs = Tables.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("n_chars"))
      .orderBy("doc_id").limit(48).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    rows.foreach { r =>
      val id = r.getString(0).drop(1).dropRight(4).toLong
      val nc = docs(id)
      val w = (nc % 11 + 6).toInt; val h = (id % 9 + 6).toInt
      val bw = (w + 7) / 8
      val vs = for (y <- 0 until h; x <- 0 until w)
        yield ((((y / 8) * bw + x / 8) * 37 + id) % 256).toInt
      assert(r.getInt(1) == w && r.getInt(2) == h, r.toString)
      assert(r.getLong(3) == w * h && r.getLong(4) == vs.map(_.toLong).sum, r.toString)
      assert(r.getInt(5) == vs.min && r.getInt(6) == vs.max, r.toString)
    }
  }

  test("JPEG codec: corrupt/unsupported blobs degrade to None, never throw") {
    val px = Array.tabulate(16 * 16 * 3)(j => ((j / 3 * 5) % 256).toByte)
    val enc = JpegCodec.encode(PpmCodec.Image(16, 16, px))
    assert(JpegCodec.decode(enc).isDefined)
    assert(JpegCodec.decode("not a jpeg".getBytes).isEmpty)
    // every truncation point degrades, never throws/hangs
    (0 until enc.length by 5).foreach { cut =>
      JpegCodec.decode(java.util.Arrays.copyOf(enc, cut)) // must not throw
    }
    // every single-byte corruption is total (None or a decoded image)
    (0 until enc.length by 3).foreach { flip =>
      val b = enc.clone(); b(flip) = (b(flip) ^ 0x5a).toByte
      JpegCodec.decode(b) // must not throw
    }
    // unsupported shapes: progressive, 12-bit, subsampled chroma
    val sofOff = enc.indexOfSlice(Seq(0xff.toByte, 0xc0.toByte))
    val prog = enc.clone(); prog(sofOff + 1) = 0xc2.toByte
    assert(JpegCodec.decode(prog).isEmpty, "progressive must be None")
    val deep = enc.clone(); deep(sofOff + 4) = 12
    assert(JpegCodec.decode(deep).isEmpty, "12-bit precision must be None")
    val sub = enc.clone(); sub(sofOff + 11) = 0x22
    assert(JpegCodec.decode(sub).isEmpty, "4:2:0 sampling must be None")
    // operator-facing dispatch falls back to stub features, not an exception
    val f = Multimodal.Codec.imageFeatures(enc.take(30))
    assert(f.toSeq == Multimodal.StubCodec.imageFeatures(enc.take(30)).toSeq)
  }

  test("GIF codec: animated encode / frame demux / per-frame decode round-trip exactly") {
    val w = 7; val h = 5; val nF = 9
    def framePx(f: Int): Array[Byte] = {
      val px = new Array[Byte](w * h * 3)
      for (j <- 0 until w * h) {
        val v = ((j * 3 + f * 11 + 4) % 256).toByte
        px(j * 3) = v; px(j * 3 + 1) = v; px(j * 3 + 2) = v
      }
      px
    }
    val frames = (0 until nF).map(f => PpmCodec.Image(w, h, framePx(f)))
    val gif = GifCodec.encodeAnimated(frames)
    assert(gif.length == GifCodec.encodedAnimatedSize(w, h, nF), s"${gif.length}")
    assert(java.util.Arrays.equals(gif, GifCodec.encodeAnimated(frames)), "deterministic")
    assert(GifCodec.frameCount(gif).contains(nF))
    for (f <- 0 until nF) {
      val img = GifCodec.decodeFrame(gif, f).getOrElse(fail(s"frame $f"))
      assert(img.width == w && img.height == h)
      assert(img.pixels.toSeq == framePx(f).toSeq, s"frame $f pixels")
    }
    // single-frame API views the animation as its first frame
    assert(GifCodec.decode(gif).get.pixels.toSeq == framePx(0).toSeq)
    assert(GifCodec.decodeFrame(gif, nF).isEmpty, "index past the last frame")
    assert(GifCodec.decodeFrame(gif, -1).isEmpty)
    // the still-image encoder's output is a 1-frame animation to the demux
    assert(GifCodec.frameCount(GifCodec.encode(frames.head)).contains(1))
    // single-pass sampling: one walk must agree with per-frame decodes
    val (cnt, sampled) = GifCodec.decodeSampled(gif, 5)((_, img) => img).get
    assert(cnt == nF)
    assert(sampled.map(_._1) == (0 until nF by 5))
    sampled.foreach { case (f, img) =>
      assert(img.pixels.toSeq == framePx(f).toSeq, s"sampled frame $f")
    }
    assert(GifCodec.decodeSampled(gif, 0)((_, img) => img).isEmpty)
    assert(GifCodec.decodeSampled(gif.take(gif.length - 10), 5)((_, img) => img).isEmpty)
    // truncation mid-animation: count and decode both degrade to None
    assert(GifCodec.frameCount(gif.take(gif.length - 10)).isEmpty)
    assert(GifCodec.decodeFrame(gif.take(800), 2).isEmpty)
    // a partial-canvas frame at index > 0 would composit onto prior
    // content → None; it still COUNTS (demux never inspects pixels),
    // and earlier frames stay decodable
    val frameLen = ((GifCodec.encodedAnimatedSize(w, h, nF) - 13 - 768 - 1) / nF).toInt
    val shifted = gif.clone()
    val desc1 = 13 + 768 + frameLen + 8 // second frame's descriptor
    assert((shifted(desc1) & 0xff) == 0x2c)
    shifted(desc1 + 1) = 1 // left = 1 on frame 1
    assert(GifCodec.decodeFrame(shifted, 1).isEmpty)
    assert(GifCodec.decodeFrame(shifted, 0).isDefined)
    assert(GifCodec.frameCount(shifted).contains(nF))
    // sampling SKIPS the bad frame and still returns the good ones —
    // one undecodable frame must not drop the file's whole output
    val (cnt2, sampled2) = GifCodec.decodeSampled(shifted, 1)((f2, _) => f2).get
    assert(cnt2 == nF)
    assert(sampled2.map(_._1) == (0 until nF).filter(_ != 1))
  }

  test("GIF codec: a sub-canvas FIRST frame decodes standalone with its own dims") {
    // positioning offsets and LSD mismatches are compositing metadata;
    // "decode the first image" must still serve the image block itself
    // (the pre-r16-refactor behavior, regression-pinned here)
    val w = 6; val h = 4
    val px = Array.tabulate(w * h * 3)(j => ((j / 3 * 7 + 2) % 256).toByte)
    val gif = GifCodec.encode(PpmCodec.Image(w, h, px))
    val desc = 6 + 7 + 768 // header + LSD + GCT
    assert((gif(desc) & 0xff) == 0x2c)
    val offset = gif.clone()
    offset(desc + 1) = 2 // left = 2
    offset(desc + 3) = 1 // top = 1
    assert(GifCodec.decode(offset).get.pixels.toSeq == px.toSeq)
    val lsdMismatch = gif.clone()
    lsdMismatch(6) = (w + 3).toByte // screen wider than the image
    val img = GifCodec.decode(lsdMismatch).get
    assert(img.width == w && img.height == h, "image block dims win for frame 0")
    assert(img.pixels.toSeq == px.toSeq)
  }

  test("GIF codec: a local color table applies to ITS frame only (scoping in animations)") {
    // frame 0 carries a REVERSED-gray LCT, frame 1 falls back to the
    // gray GCT; both frames' pixels are index 3 — so frame 0 must read
    // 252 and frame 1 must read 3, proving the LCT never leaks forward
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def w16v(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    w16v(2); w16v(2); out.write(0x87); out.write(0); out.write(0)
    (0 until 256).foreach(v => { out.write(v); out.write(v); out.write(v) }) // gray GCT
    def frameData(): Unit = { // 4 pixels of index 3, flat 9-bit LZW
      val data = new java.io.ByteArrayOutputStream()
      var acc = 0L; var accBits = 0
      def emit(code: Int): Unit = {
        acc |= (code.toLong & 0x1ff) << accBits; accBits += 9
        while (accBits >= 8) { data.write((acc & 0xff).toInt); acc >>>= 8; accBits -= 8 }
      }
      emit(256); emit(3); emit(3); emit(3); emit(3); emit(257)
      if (accBits > 0) data.write((acc & 0xff).toInt)
      val payload = data.toByteArray
      out.write(8) // min code size
      out.write(payload.length); out.write(payload, 0, payload.length)
      out.write(0)
    }
    out.write(0x2c); w16v(0); w16v(0); w16v(2); w16v(2); out.write(0x80 | 0x07) // LCT
    (0 until 256).foreach(v => { val r = 255 - v; out.write(r); out.write(r); out.write(r) })
    frameData()
    out.write(0x2c); w16v(0); w16v(0); w16v(2); w16v(2); out.write(0) // no LCT
    frameData()
    out.write(0x3b)
    val gif = out.toByteArray
    assert(GifCodec.frameCount(gif).contains(2))
    assert((GifCodec.decodeFrame(gif, 0).get.pixels(0) & 0xff) == 252, "frame 0 uses its LCT")
    assert((GifCodec.decodeFrame(gif, 1).get.pixels(0) & 0xff) == 3, "frame 1 falls back to the GCT")
  }

  test("qMediaVideoSample: demux + stride-sampled executor decode reproduce the formulas") {
    val rows = Multimodal.qMediaVideoSample(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("n_chars"))
      .orderBy("doc_id").limit(48).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // every (file, sampled-frame) pair present, none extra
    val expectRows = docs.toSeq.map { case (id, nc) =>
      (nc % 20 + 4).toInt match { case nf => (nf + 4) / 5 }
    }.sum
    assert(rows.length == expectRows)
    rows.foreach { r =>
      val id = r.getString(0).drop(1).dropRight(4).toLong
      val nc = docs(id)
      val w = (nc % 7 + 2).toInt; val h = (id % 5 + 2).toInt
      val nf = (nc % 20 + 4).toInt
      val f = r.getInt(3)
      assert(f % 5 == 0 && f < nf)
      assert(r.getLong(1) == GifCodec.encodedAnimatedSize(w, h, nf), r.toString)
      assert(r.getInt(2) == nf, r.toString)
      val vs = (0 until w * h).map(j => ((j * 3 + f * 11 + id) % 256).toInt)
      assert(r.getLong(4) == vs.map(_.toLong).sum, r.toString)
      assert(r.getInt(5) == vs.min && r.getInt(6) == vs.max, r.toString)
    }
  }

  test("ADPCM codec: block-constant signals round-trip EXACTLY; size is the closed form") {
    for (id <- 0L until 24L) {
      val n = (id % 150 + 30).toInt
      val samples = Array.tabulate(n)(j =>
        (((j / 33) * 911 + id * 73) % 60001 - 30000).toShort)
      val a = WavCodec.Audio((8000 + (id % 4) * 4000).toInt, 1, samples)
      val enc = AdpcmCodec.encode(a)
      assert(enc.length == AdpcmCodec.encodedSize(n), s"id=$id size")
      // deterministic at the byte level
      assert(java.util.Arrays.equals(enc, AdpcmCodec.encode(a)))
      val back = AdpcmCodec.decode(enc).getOrElse(fail(s"id=$id: decode failed"))
      assert(back.sampleRate == a.sampleRate && back.channels == 1)
      assert(back.samples.toSeq == samples.toSeq, s"id=$id samples differ")
      // the SAME audio through PCM-WAV and ADPCM must extract identical features
      assert(Multimodal.Codec.imageFeatures(enc).toSeq ==
        Multimodal.Codec.imageFeatures(WavCodec.encode(a)).toSeq)
    }
  }

  test("ADPCM codec: hand-built nibble stream matches hand-computed step-table walk") {
    // one 6-byte block (4 nibbles), predictor 0, index 0 — expected
    // samples worked out BY HAND from the public IMA tables:
    // 0x1: step 7, diff 0+1        -> 1,   index 0-1 -> 0
    // 0x7: step 7, diff 0+1+3+7    -> 12,  index 0+8 -> 8
    // 0xF: step 16, diff 2+4+8+16  -> -18, index 8+8 -> 16
    // 0x8: step 34, diff 4         -> -22, index 16-1 -> 15
    val bb = java.nio.ByteBuffer.allocate(66).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(58).put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(20)
      .putShort(17).putShort(1).putInt(8000).putInt(8000 * 6 / 5)
      .putShort(6).putShort(4).putShort(2).putShort(5)
    bb.put("fact".getBytes("US-ASCII")).putInt(4).putInt(5)
    bb.put("data".getBytes("US-ASCII")).putInt(6)
    bb.putShort(0).put(0.toByte).put(0.toByte)     // block header
    bb.put(0x71.toByte).put(0x8f.toByte)           // nibbles 1,7,F,8
    val a = AdpcmCodec.decode(bb.array()).getOrElse(fail("hand-built must decode"))
    assert(a.samples.toSeq == Seq[Short](0, 1, 12, -18, -22))
  }

  test("ADPCM codec: general signals track within adaptive tolerance at ~4:1 compression") {
    val n = 2000
    val samples = Array.tabulate(n)(j => (j * 12).toShort) // a steady ramp
    val a = WavCodec.Audio(16000, 1, samples)
    // production-shaped 256-byte blocks: the 4-byte header amortizes to
    // <1% and the ratio approaches the format's nominal 4:1
    val enc = AdpcmCodec.encode(a, blockAlign = 256)
    assert(enc.length < WavCodec.encode(a).length / 3, s"${enc.length}")
    val back = AdpcmCodec.decode(enc).get
    assert(back.samples.length == n)
    var maxErr = 0
    for (j <- 0 until n)
      maxErr = math.max(maxErr, math.abs(back.samples(j) - samples(j)))
    assert(maxErr > 0, "a ramp must take the lossy path")
    assert(maxErr <= 512, s"adaptation should track the ramp: $maxErr")
  }

  test("ADPCM codec: corrupt blobs degrade to None; PCM and ADPCM reject each other") {
    val samples = Array.tabulate(100)(j => (j * 11).toShort)
    val a = WavCodec.Audio(8000, 1, samples)
    val enc = AdpcmCodec.encode(a)
    assert(AdpcmCodec.decode(enc).isDefined)
    assert(AdpcmCodec.decode("not audio".getBytes).isEmpty)
    assert(AdpcmCodec.decode(WavCodec.encode(a)).isEmpty, "PCM is not ADPCM")
    assert(WavCodec.decode(enc).isEmpty, "ADPCM is not PCM")
    (0 until enc.length by 3).foreach { cut =>
      AdpcmCodec.decode(java.util.Arrays.copyOf(enc, cut)) // must not throw
    }
    (0 until enc.length by 2).foreach { flip =>
      val b = enc.clone(); b(flip) = (b(flip) ^ 0x5a).toByte
      AdpcmCodec.decode(b) // must not throw
    }
    // truncated data chunk (fact promises more samples than blocks hold)
    val shortData = enc.clone()
    val dataOff = enc.length - 40 // inside the last block
    assert(AdpcmCodec.decode(java.util.Arrays.copyOf(shortData, dataOff)).isEmpty)
  }

  test("qMediaAdpcmDecode: executor-side ADPCM decode reproduces the block formula exactly") {
    val rows = Multimodal.qMediaAdpcmDecode(spark, sfDir).collect()
    assert(rows.length == 48)
    val docs = Tables.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("n_chars"))
      .orderBy("doc_id").limit(48).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    rows.foreach { r =>
      val id = r.getString(0).drop(1).dropRight(4).toLong
      val nc = docs(id)
      val n = (nc % 150 + 30).toInt
      val vs = (0 until n).map(j => (((j / 33) * 911 + id * 73) % 60001 - 30000).toInt)
      assert(r.getLong(1) == AdpcmCodec.encodedSize(n), r.toString)
      assert(r.getInt(2) == (8000 + (id % 4) * 4000).toInt, r.toString)
      assert(r.getLong(3) == n && r.getLong(4) == vs.map(_.toLong).sum, r.toString)
      assert(r.getInt(5) == vs.min && r.getInt(6) == vs.max, r.toString)
    }
  }

  test("qMediaResize: distributed decode→resize→re-encode→decode matches the sampling formula") {
    val rows = Multimodal.qMediaResize(spark, sfDir).collect()
    assert(rows.length == 48)
    val docs = Tables.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("n_chars"))
      .orderBy("doc_id").limit(48).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    rows.foreach { r =>
      val id = r.getString(0).drop(1).dropRight(4).toLong
      val nc = docs(id)
      val w = (nc % 13 + 2).toInt; val h = (id % 7 + 2).toInt
      val vs = for (y <- 0 until 3; x <- 0 until 4)
        yield ((3L * ((y * h / 3) * w + (x * w / 4)) + id) % 251).toInt
      assert(r.getLong(1) == 12, r.toString)
      assert(r.getLong(2) == vs.map(_.toLong).sum, r.toString)
      assert(r.getInt(3) == vs.min && r.getInt(4) == vs.max, r.toString)
    }
  }

  test("qMediaProfile: six-format dispatch reproduces every family's formula in one query") {
    val rows = Multimodal.qMediaProfile(spark, sfDir).collect()
    assert(rows.length == 48, "every file must decode through SOME real codec")
    val docs = Tables.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("n_chars"))
      .orderBy("doc_id").limit(48).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    rows.foreach { r =>
      val id = r.getString(0).drop(1).dropRight(4).toLong
      val nc = docs(id)
      val (kind, n, sum): (String, Long, Long) = (id % 6) match {
        case 0 =>
          val n = (nc % 13 + 2) * (id % 7 + 2)
          ("image", n, (0L until n).map(j => (3 * j + id) % 251).sum)
        case 1 =>
          val n = nc % 300 + 10
          ("audio", n, (0L until n).map(j => (j * 31 + id) % 20000).sum)
        case 2 =>
          val n = (nc % 11 + 2) * (id % 5 + 2)
          ("image", n, (0L until n).map(j => (21 * j + id) % 253).sum)
        case 3 =>
          val n = (nc % 9 + 2) * (id % 6 + 2)
          ("image", n, (0L until n).map(j => (5 * j + id) % 256).sum)
        case 4 =>
          val w = nc % 11 + 6
          val n = w * (id % 9 + 6)
          ("image", n, (0L until n).map { j =>
            (((j / w) / 8) * ((w + 7) / 8) + (j % w) / 8) * 37 + id
          }.map(_ % 256).sum)
        case _ =>
          val n = nc % 150 + 30
          ("audio", n, (0L until n).map(j => (j / 33) * 911 + id * 73)
            .map(_ % 60001 - 30000).sum)
      }
      assert(r.getString(1) == kind, r.toString)
      assert(r.getLong(2) == n && r.getLong(3) == sum, r.toString)
    }
  }

  test("GIF codec: corrupt blobs degrade to None, never throw or hang") {
    val img = PpmCodec.Image(6, 5, Array.tabulate(90)(j => ((j / 3 * 9) % 256).toByte))
    val gif = GifCodec.encode(img)
    assert(GifCodec.decode(gif).isDefined)
    assert(GifCodec.decode("nonsense".getBytes).isEmpty)
    assert(GifCodec.decode(gif.take(40)).isEmpty)          // truncated in the palette
    assert(GifCodec.decode(gif.take(gif.length - 6)).isEmpty) // truncated LZW data
    val interlaced = gif.clone()
    interlaced(6 + 7 + 768 + 9) = 0x40.toByte              // image-descriptor interlace flag
    assert(GifCodec.decode(interlaced).isEmpty)
    val badCode = gif.clone()
    badCode(6 + 7 + 768 + 10) = 1                          // min code size below the valid range
    assert(GifCodec.decode(badCode).isEmpty)
    // operator-facing dispatch falls back to stub features, not an exception
    val f = Multimodal.Codec.imageFeatures(gif.take(40))
    assert(f.toSeq == Multimodal.StubCodec.imageFeatures(gif.take(40)).toSeq)
  }
}
