package graft

import org.apache.spark.sql.functions._

import graft.mm.{PpmCodec, WavCodec}
import graft.sources.v2.{MediaSource, MediaSourceProvider}

class MediaSourceSpec extends SparkSpec {

  private def fmt = classOf[MediaSourceProvider].getName

  /** temp dir with 3 PPMs, 2 WAVs, 1 opaque blob. */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("media_src").toFile
    def write(name: String, bytes: Array[Byte]): Unit = {
      val out = new java.io.FileOutputStream(new java.io.File(d, name))
      try out.write(bytes) finally out.close()
    }
    for (i <- 0 until 3) {
      val px = Array.tabulate(4 * 6 * 3)(j => ((j + i * 7) % 251).toByte)
      write(s"img$i.ppm", PpmCodec.encode(PpmCodec.Image(6, 4, px)))
    }
    for (i <- 0 until 2) {
      val samples = Array.tabulate(400)(j => ((j * (i + 3)) % 20000).toShort)
      write(s"tone$i.wav", WavCodec.encode(WavCodec.Audio(8000 + i * 8000, 1, samples)))
    }
    write("blob.bin", "not-media".getBytes("UTF-8"))
    d.getAbsolutePath
  }

  test("DSv2 media source reads the directory with typed per-format metadata") {
    val df = spark.read.format(fmt).load(dir)
    assert(df.schema == MediaSource.schema)
    val rows = df.collect().map(r => r.getAs[String]("name") -> r).toMap
    assert(rows.size == 6)
    assert(rows("img0.ppm").getAs[String]("kind") == "image")
    assert(rows("img0.ppm").getAs[Int]("width") == 6)
    assert(rows("img0.ppm").getAs[Int]("height") == 4)
    assert(rows("tone1.wav").getAs[String]("kind") == "audio")
    assert(rows("tone1.wav").getAs[Int]("sample_rate") == 16000)
    assert(rows("blob.bin").getAs[String]("kind") == "binary")
    assert(rows("blob.bin").isNullAt(rows("blob.bin").fieldIndex("width")))
    // bytes round-trip exactly
    assert(PpmCodec.decode(rows("img2.ppm").getAs[Array[Byte]]("bytes")).get.width == 6)
  }

  test("kind filter pushes down to the listing: pruned files never become tasks") {
    val df = spark.read.format(fmt).load(dir).where(col("kind") === "image")
    assert(df.count() == 3)
    // the pushed filter prunes at planInputPartitions: with 6 files in
    // one 16-file group, an unpruned scan has 1 partition of 6 files —
    // so prove pruning via the scan description instead of partitioning
    val desc = df.queryExecution.executedPlan.toString
    assert(desc.contains("listingFilters=[EqualTo(kind,image)]"),
      s"filter not pushed:\n${desc.take(600)}")
    // and the filter is gone from the residual only if pushed; either
    // way results must be exact
    assert(df.select("name").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("img0.ppm", "img1.ppm", "img2.ppm"))
  }

  test("metadata-only projection never reads file bodies") {
    MediaSource.bodyReads.set(0L)
    val meta = spark.read.format(fmt).load(dir)
      .select("name", "kind", "size", "width", "height", "sample_rate")
      .collect()
    assert(meta.length == 6)
    // header prefix (256 B) served every metadata column
    assert(MediaSource.bodyReads.get() == 0L,
      s"${MediaSource.bodyReads.get()} full-body reads for a metadata-only query")
    // sanity: selecting bytes DOES read bodies
    spark.read.format(fmt).load(dir).select("name", "bytes").collect()
    assert(MediaSource.bodyReads.get() == 6L)
  }

  test("size-range pushdown prunes at the listing: non-matching files are never opened") {
    // all 3 PPMs share one size; WAVs and the blob differ — pick a cut
    // that keeps exactly the PPMs
    val sizes = new java.io.File(dir).listFiles().map(f => f.getName -> f.length()).toMap
    val ppmSize = sizes("img0.ppm")
    MediaSource.headerReads.set(0L)
    MediaSource.bodyReads.set(0L)
    val rows = spark.read.format(fmt).load(dir)
      .where(col("size") === ppmSize)
      .select("name", "width", "height")
      .collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("img0.ppm", "img1.ppm", "img2.ppm"))
    assert(MediaSource.bodyReads.get() == 0L)
    // only the 3 surviving files were opened (header prefix), the other
    // 3 were pruned before any task existed
    assert(MediaSource.headerReads.get() == 3L,
      s"${MediaSource.headerReads.get()} header opens for a 3-file size match")
    // range form prunes too
    MediaSource.headerReads.set(0L)
    val n = spark.read.format(fmt).load(dir)
      .where(col("size") > ppmSize).select("name", "kind").count()
    val expected = sizes.values.count(_ > ppmSize)
    assert(n == expected)
    assert(MediaSource.headerReads.get() == 0L,
      "kind/size-only projection should not need header opens at all")
  }

  test("conflicting pushed kind equalities yield the correct empty result") {
    val df = spark.read.format(fmt).load(dir)
      .where(col("kind") === "image" && col("kind") === "audio")
    assert(df.count() == 0, "kind='image' AND kind='audio' must be empty")
    // IN pushes and enforces the full value set
    val both = spark.read.format(fmt).load(dir)
      .where(col("kind").isin("image", "audio"))
      .select("name").collect().map(_.getString(0)).sorted.toSeq
    assert(both == Seq("img0.ppm", "img1.ppm", "img2.ppm", "tone0.wav", "tone1.wav"))
  }

  test("ORDER comparisons on the string kind column stay residual and evaluate correctly") {
    // kind >= 'audio' is not integral-decidable: if the scan claimed it
    // as pushed, eval's numeric cmp would reject EVERY file (0 rows);
    // it must stay a residual Spark evaluates → all 6 files match
    val df = spark.read.format(fmt).load(dir).where(col("kind") >= "audio")
    assert(df.count() == 6)
    assert(spark.read.format(fmt).load(dir).where(col("kind") > "binary").count() == 3)
    // and the scan's pushed-filter list must not contain the comparison
    val scanDesc = df.queryExecution.executedPlan.toString()
    assert(!scanDesc.contains("listingFilters=[GreaterThanOrEqual"),
      s"kind comparison must not be pushed:\n$scanDesc")
  }

  test("metadata+bytes projection opens each file once, serving the header from the body") {
    MediaSource.headerReads.set(0); MediaSource.bodyReads.set(0)
    val rows = spark.read.format(fmt).load(dir)
      .select("name", "width", "bytes").collect()
    assert(rows.length == 6)
    assert(MediaSource.bodyReads.get() == 6, s"bodyReads=${MediaSource.bodyReads.get()}")
    assert(MediaSource.headerReads.get() == 0,
      s"header must be served from the body prefix: headerReads=${MediaSource.headerReads.get()}")
    // dims still parsed correctly from the body-served prefix
    val img = rows.find(_.getAs[String]("name") == "img1.ppm").get
    assert(img.getAs[Int]("width") == 6)
  }

  test("header-pushed predicates gate body reads: only matching bodies are opened") {
    MediaSource.bodyReads.set(0L)
    // sample_rate = 16000 matches exactly tone1.wav; bytes projected →
    // only ITS body may be read (headers decide the rest)
    val rows = spark.read.format(fmt).load(dir)
      .where(col("sample_rate") === 16000)
      .select("name", "bytes").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("tone1.wav"))
    assert(MediaSource.bodyReads.get() == 1L,
      s"${MediaSource.bodyReads.get()} body reads; header filter should gate to 1")
    // null semantics: width comparison never matches audio/binary rows
    val wide = spark.read.format(fmt).load(dir)
      .where(col("width") >= 1).select("name", "kind").collect()
    assert(wide.forall(_.getString(1) == "image") && wide.length == 3)
  }

  test("a RIFF container that is not WAVE reports no sample rate") {
    val d = java.nio.file.Files.createTempDirectory("media_riff").toFile
    // RIFF magic + AVI form type, junk where a WAV's rate would sit
    val bs = "RIFF".getBytes("ISO-8859-1") ++ Array[Byte](40, 0, 0, 0) ++
      "AVI LIST".getBytes("ISO-8859-1") ++ Array.fill[Byte](32)(0x5A)
    val out = new java.io.FileOutputStream(new java.io.File(d, "clip.wav"))
    try out.write(bs) finally out.close()
    val r = spark.read.format(fmt).load(d.getAbsolutePath)
      .select("name", "sample_rate").collect().head
    assert(r.isNullAt(1), s"AVI-in-.wav reported rate ${r.get(1)}")
  }

  test("the source composes: DSv2 scan feeds the multimodal feature path") {
    val media = spark.read.format(fmt).load(dir)
      .where(col("kind") === "image")
      .select(
        monotonically_increasing_id().as("media_id"),
        col("kind"), col("bytes"),
        struct(col("width"), col("height"),
          lit(null).cast("int").as("sample_rate"),
          lit(null).cast("int").as("n_frames")).as("meta"))
    // schema-align to Multimodal.mediaSchema field order
    val feats = graft.mm.Multimodal.extractFeatures(media, batchSize = 2, dim = 16)
    val rows = feats.collect()
    assert(rows.length == 3)
    rows.foreach(r => assert(r.getSeq[Float](2).length == 16))
  }

  test("q_media_scan driver key: listing prunes blobs, bodies never read, sizes exact") {
    MediaSource.headerReads.set(0); MediaSource.bodyReads.set(0)
    val out = graft.mm.Multimodal.qMediaScan(spark, sfDir).collect()
    // doc_id 0..47: 12 PPM (%4=0), 12 WAV (%4=1), 12 PNG (%4=2), 12 blobs
    assert(out.length == 36)
    // metadata-only projection: zero full-body reads
    assert(MediaSource.bodyReads.get() == 0L,
      s"bodyReads=${MediaSource.bodyReads.get()}")
    // the pushed kind filter pruned blobs at LISTING time: only the 36
    // matching files were ever opened, and only for their headers
    assert(MediaSource.headerReads.get() == 36L,
      s"headerReads=${MediaSource.headerReads.get()}")
    // per-format metadata parsed from real headers, size from listing
    val img = out.filter(r => r.getAs[String]("kind") == "image" &&
      r.getAs[String]("name").endsWith(".ppm"))
    val png = out.filter(_.getAs[String]("name").endsWith(".png"))
    val aud = out.filter(_.getAs[String]("kind") == "audio")
    assert(img.length == 12 && png.length == 12 && aud.length == 12)
    img.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val hdr = 9 + w.toString.length + h.toString.length
      assert(r.getAs[Long]("size") == hdr + 3L * w * h)
      assert(r.isNullAt(r.fieldIndex("sample_rate")))
    }
    // PNG dims come from the real big-endian IHDR parse; size is the
    // deterministic stored-block closed form
    png.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      assert(r.getAs[String]("kind") == "image")
      assert(r.getAs[Long]("size") == graft.mm.PngCodec.encodedSize(w, h))
      assert(r.isNullAt(r.fieldIndex("sample_rate")))
    }
    aud.foreach { r =>
      assert(Set(8000, 12000, 16000, 20000).contains(r.getAs[Int]("sample_rate")))
      assert((r.getAs[Long]("size") - 44) % 2 == 0)
      assert(r.isNullAt(r.fieldIndex("width")))
    }
    // the temp directory is deleted inside the key — a successful
    // collect() above ALSO proves the localCheckpoint materialization
    // (a lazy scan over deleted files would have thrown)
  }
}
