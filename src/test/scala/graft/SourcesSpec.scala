package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Sources

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned parquet sink round-trips and partition-prunes") {
    val out = Files.createTempDirectory("graft_sink").toString
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    Sources.writePartitioned(li, out, Seq("l_returnflag"))

    val back = Sources.readParquet(spark, out)
    assert(back.count() == li.count())
    // layout check: one directory per returnflag value
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("l_returnflag=A", "l_returnflag=N", "l_returnflag=R"))
    // pruning check: a filter on the partition column scans one partition
    val plan = back.filter(col("l_returnflag") === "A")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(l_returnflag"), plan.take(600))
  }

  test("every Tables loader resolves against the real testdata at every SF") {
    // schema-drift tripwire (round-9 verdict ask #2): the r7→r8 events
    // breakage (testdata ts re-typed ns-long → timestamp[us]) shipped
    // silently because only fixture schemas were exercised. Force full
    // ANALYSIS of each loader over each real SF dir present — a loader
    // whose normalization no longer type-checks against the shipped
    // schema fails here before the driver's oracle run does.
    val loaders: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
      "lineitem" -> (Tables.lineitem _), "orders" -> (Tables.orders _),
      "customer" -> (Tables.customer _), "supplier" -> (Tables.supplier _),
      "part" -> (Tables.part _), "nation" -> (Tables.nation _),
      "region" -> (Tables.region _), "events" -> (Tables.events _),
      "documents" -> (Tables.documents _), "embeddings" -> (Tables.embeddings _))
    val sfDirs = new java.io.File("/root/testdata").listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("sf")).map(_.toString).sorted
    assert(sfDirs.nonEmpty, "no testdata SF dirs found")
    for (dir <- sfDirs; (name, load) <- loaders) {
      val df = try load(spark, dir) catch {
        case e: Throwable => fail(s"$name failed to load/analyze at $dir: $e")
      }
      assert(df.queryExecution.analyzed != null, s"$name at $dir")
      assert(df.schema.nonEmpty, s"$name at $dir has empty schema")
    }
  }

  test("csv and jsonl round-trip with explicit schemas") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val df = Seq((1L, "a", 0.5), (2L, "b", 1.5)).toDF("id", "name", "score")

    val csvDir = Files.createTempDirectory("graft_csv").toString
    df.write.mode("overwrite").option("header", "true").csv(csvDir)
    val csvBack = Sources.readCsv(spark, csvDir, schema).orderBy("id")
    assert(csvBack.as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "a", 0.5), (2L, "b", 1.5)))

    val jsonDir = Files.createTempDirectory("graft_json").toString
    df.write.mode("overwrite").json(jsonDir)
    val jsonBack = Sources.readJsonl(spark, jsonDir, schema).orderBy("id")
    assert(jsonBack.as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "a", 0.5), (2L, "b", 1.5)))
  }

  test("q_ingest_jsonl gate key: checksums equal the parquet-direct aggregate") {
    val direct = graft.Tables.documents(spark, sfDir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("n_chars"),
        sum(pmod(graft.text.TextOps.baseHash60(col("text")), lit(1000000007L)))
          .as("content_sum"),
        sum(col("doc_id")).as("id_sum"))
      .orderBy("source").collect().toSeq
    val roundTrip = Sources.qIngestJsonl(spark, sfDir).collect().toSeq
    assert(roundTrip == direct, "JSONL round-trip changed the corpus")
    assert(roundTrip.nonEmpty)
    // CSV twin: same contract, RFC-4180 dialect — and the quoting must
    // survive content the fixture happens not to exercise (see below)
    val csvTrip = Sources.qIngestCsv(spark, sfDir).collect().toSeq
    assert(csvTrip == direct, "CSV round-trip changed the corpus")
    // ORC twin: the second columnar path under the same contract
    val orcTrip = Sources.qIngestOrc(spark, sfDir).collect().toSeq
    assert(orcTrip == direct, "ORC round-trip changed the corpus")
  }

  test("CSV ingest dialect survives quotes, commas and unicode in text") {
    import spark.implicits._
    val tricky = Seq(
      (1L, """he said "hi", twice""", "en", "src0", 19L),
      (2L, "commas, every, where", "en", "src0", 20L),
      (3L, "ünïcodé–content", "de", "src1", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Files.createTempDirectory("graft_csvq").toString
    tricky.write.mode("overwrite")
      .option("header", "true").option("quote", "\"").option("escape", "\"")
      .csv(out)
    val back = spark.read.schema(tricky.schema)
      .option("header", "true").option("quote", "\"").option("escape", "\"")
      .csv(out)
    assert(back.orderBy("doc_id").collect().toSeq ==
      tricky.orderBy("doc_id").collect().toSeq)
  }

  test("orc round-trips with pushdown intact") {
    val out = Files.createTempDirectory("graft_orc").toString
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_quantity")
    Sources.writeOrc(li, out)
    val back = Sources.readOrc(spark, out)
    assert(back.count() == li.count())
    val plan = back.filter(col("l_quantity") > 30)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("l_quantity"), plan.take(500))
  }

  test("raw text source reads one line per row") {
    val dir = Files.createTempDirectory("graft_txt").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "corpus.txt"),
      Seq("line one", "line two", "line three").mkString("", "\n", "\n"))
    val df = Sources.readText(spark, dir)
    assert(df.columns.toSeq == Seq("value"))
    assert(df.count() == 3)
  }

  test("shuffle preserves the row multiset and balances partitions") {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_linenumber", "l_quantity")
    val shuffled = Sources.shuffle(li, 8, seed = 13L)
    assert(shuffled.count() == li.count())
    assert(shuffled.except(li).isEmpty && li.except(shuffled).isEmpty)
    val sizes = shuffled.rdd.glom().map(_.length).collect()
    assert(sizes.length == 8)
    val mean = sizes.sum.toDouble / sizes.length
    assert(sizes.forall(s => math.abs(s - mean) < mean * 0.3), sizes.toSeq.toString)
  }

  test("bucketed tables join without a shuffle (co-located join)") {
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey", "o_totalprice")
    val c = Tables.customer(spark, sfDir).select("c_custkey", "c_name")
    o.write.mode("overwrite").bucketBy(4, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_bkt")
    c.write.mode("overwrite").bucketBy(4, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_bkt")
    val joined = spark.table("orders_bkt")
      .join(spark.table("customer_bkt"),
        col("o_custkey") === col("c_custkey"))
    // disable broadcast so the co-location actually decides the plan
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n${plan.take(800)}")
      assert(joined.count() == o.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("approx percentile tracks the exact interpolated percentile") {
    val li = Tables.lineitem(spark, sfDir)
    val approx = li.agg(percentile_approx($"l_quantity", lit(0.5), lit(1000)))
      .head().getDouble(0)
    val exact = li.agg(expr("percentile(l_quantity, 0.5)")).head().getDouble(0)
    assert(math.abs(approx - exact) <= 1.0, s"approx $approx vs exact $exact")
  }

  test("Tables.events yields µs TIMESTAMP_NTZ regardless of source precision") {
    import org.apache.spark.sql.types.TimestampNTZType
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType == TimestampNTZType, ev.schema("ts").dataType.toString)
    assert(ev.filter($"ts".isNotNull).count() > 0)
    // Also works without the ns legacy flag now that testdata ships µs.
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    try {
      val ev2 = Tables.events(spark, sfDir)
      assert(ev2.schema("ts").dataType == TimestampNTZType)
    } finally spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
  }

  test("approx_count_distinct is within 5% of exact") {
    val ev = Tables.events(spark, sfDir)
    val approx = ev.agg(approx_count_distinct($"user_id").as("a")).head().getLong(0)
    val exact = ev.agg(countDistinct($"user_id")).head().getLong(0)
    assert(math.abs(approx - exact) <= math.max(1L, (exact * 0.05).toLong),
      s"approx $approx vs exact $exact")
  }

  test("media dir ingest: glob filters at listing, content decodes, metadata prunes bodies") {
    import graft.mm.PpmCodec
    val dir = Files.createTempDirectory("graft_media")
    val img = PpmCodec.Image(2, 2, Array.tabulate(12)(i => (i * 20).toByte))
    Files.write(dir.resolve("a.ppm"), PpmCodec.encode(img))
    Files.write(dir.resolve("b.ppm"), PpmCodec.encode(img))
    Files.write(dir.resolve("notes.txt"), "not media".getBytes)

    val media = Sources.readMediaDir(spark, dir.toString, Some("*.ppm"))
    assert(media.count() == 2, "glob must exclude the .txt")
    // the bytes are REAL media: the shipped codec decodes them
    val decoded = media.select($"content").as[Array[Byte]].collect()
      .flatMap(PpmCodec.decode)
    assert(decoded.length == 2 && decoded.forall(i => i.width == 2 && i.height == 2))
    // metadata-only query prunes the content column at the scan
    val metaPlan = PlanAudit.executedPlan(
      media.select($"path", $"length").filter($"length" > 0)).toString
    assert(!metaPlan.contains("content"),
      s"metadata query must not read file bodies:\n$metaPlan")
  }

  test("sharded shuffle write: contiguous pos ranges, in-file order, no global sort") {
    import org.apache.spark.sql.execution.SortExec
    val docs = Tables.documents(spark, sfDir)
    val n = docs.count()
    val out = Files.createTempDirectory("graft_shards").toString
    val frame = text.Sampling.shuffledShardsFrame(docs, col("doc_id"))

    // the write-side plan must contain NO global sort — only the hash
    // exchange on the shard id plus per-partition sorts (the whole
    // point: at 100 TB a global ORDER BY is the query, this is not one)
    val sorts = PlanAudit.nodes(PlanAudit.executedPlan(frame))
      .collect { case s: SortExec => s }
    assert(sorts.nonEmpty && sorts.forall(!_.global),
      s"write plan ran a global sort: ${sorts.map(_.global)}")

    text.Sampling.writeShuffledShards(docs, col("doc_id"), out)

    // shard ranges: contiguous within each shard, chaining across
    // shards in shard-id order, covering exactly 1..N
    val ranges = spark.read.parquet(out)
      .groupBy($"shard").agg(
        min($"pos").as("lo"), max($"pos").as("hi"), count(lit(1)).as("c"))
      .orderBy($"shard")
      .as[(String, Long, Long, Long)].collect()
    assert(ranges.nonEmpty)
    ranges.foreach { case (s, lo, hi, c) =>
      assert(hi - lo + 1 == c, s"shard $s range [$lo,$hi] has holes (count $c)")
    }
    val chained = ranges.sliding(2).forall {
      case Array((_, _, hi, _), (_, lo, _, _)) => lo == hi + 1
      case _ => true
    }
    assert(chained, s"shard ranges do not chain: ${ranges.mkString(", ")}")
    assert(ranges.head._2 == 1L && ranges.last._3 == n,
      s"ranges cover [${ranges.head._2}, ${ranges.last._3}], want [1, $n]")

    // within one shard FILE the rows are pos-ascending (a trainer
    // streaming the file reads the permutation in order, no sort)
    val someShard = ranges(ranges.length / 2)._1
    val inFile = spark.read.parquet(s"$out/shard=$someShard")
      .select($"pos").as[Long].collect()
    assert(inFile.toSeq == inFile.sorted.toSeq, s"shard $someShard file not pos-sorted")

    // re-read union reproduces the oracled global order exactly
    val rereadPos = spark.read.parquet(out)
      .select($"doc_id", $"pos").as[(Long, Long)].collect().toMap
    val oraclePos = text.Sampling.qShuffleOrder(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    assert(rereadPos == oraclePos, "sharded write lost or changed positions")
  }
}
