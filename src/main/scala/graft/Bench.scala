package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** JSON-safe error text: whitelist printable ASCII (anything else —
    * control chars, unicode — becomes a space), then strip the two
    * characters that would still break a JSON string literal. */
  private def sanitize(t: Throwable): String =
    t.toString.replaceAll("[^\\x20-\\x7e]", " ")
      .replace("\\", " ").replace("\"", " ").take(160)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is ns-precision parquet; see graft.Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up JVM/codegen + parquet footer caches so the first timed
    // query isn't charged ~10 s of one-time session startup
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    // time a noop-format write, not count(): EliminateSorts drops a final
    // ORDER BY under count(), so count() would systematically exclude the
    // sort cost that Verify's parquet dump pays
    // median-of-reps per query: single-shot timing has a ±0.3 s noise
    // floor at sf0.1 that round-over-round comparisons misread as
    // regressions; the reported value per key is the median, with the
    // raw per-run samples kept under "runs"
    // a failing query must be VISIBLE in the bench JSON (an "errors"
    // entry), never a silently-absorbed near-0s "success"
    // SPARK_GRAFT_BENCH_ONLY=q_a,q_b restricts the run — the targeted-
    // iteration loop for optimizing one key without a 4-minute sweep
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val results = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      var err: Option[String] = None
      // an errored rep's (typically truncated) wall time must NOT enter
      // the sample: the "errors" entry is the only signal, and the median
      // is over successful reps only (0.0 if none succeeded)
      val times = (1 to reps).iterator.takeWhile(_ => err.isEmpty).flatMap { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
                 catch { case t: Throwable => err = Some(sanitize(t)); false }
        val dt = (System.nanoTime() - t0) / 1e9
        // drop blocks the query left pinned (localCheckpoint streams):
        // the ContextCleaner's periodic GC is 30 min, so without this
        // every rep of every query inherits the previous ones' blocks
        // and the block store fills over the run (reps are new RDDs —
        // nothing here is reused, only leaked). Outside the timer: this
        // is harness hygiene, not query cost.
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        if (ok) Some(dt) else None
      }.toVector
      val median = if (times.isEmpty) 0.0 else times.sorted.apply((times.size - 1) / 2)
      (name, median, times, err)
    }
    def r3(d: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, d)
    // ascending by median: the harness keeps only the LAST ~2000 output
    // chars of the run, so the expensive (interesting) keys and the
    // headline total must sit at the END of the line to survive truncation
    val byTime = results.sortBy(_._2)
    val qs = byTime.map { case (k, m, _, _) => "\"" + k + "\":" + r3(m) }
      .mkString("{", ",", "}")
    val runs = byTime.map { case (k, _, ts, _) => "\"" + k + "\":" + ts.map(r3).mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, _, Some(e)) => "\"" + k + "\":\"" + e + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val method = s"median of $reps noop-format writes per query (includes final ORDER BY cost; value per key = median over successful reps, raw samples under runs, queries sorted ascending by median; round-1 timed count(), which dropped sorts via EliminateSorts - totals not directly comparable)"
    // full JSON (all keys + raw samples) lands in the repo; stdout gets a
    // COMPACT line instead — rounds 1-4 all show "parsed": null in
    // BENCH_r*.json because the full ~5 kB line overflowed the harness's
    // ~2000-char stdout tail and could never be json.loads'd whole
    val fullJson = s"""{"method":"$method","runs":$runs,"queries":$qs,"errors":$errs,"sf":"$sfDir","n_queries":${results.size},"unit":"sec","metric":"total","value":${r3(total)}}"""
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(outFile), (fullJson + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    // compact stdout line: slowest 25 keys only (the rest are sub-second
    // scheduling-floor keys), headline fields last; ~900 chars total so the
    // whole line survives inside the tail window alongside sbt's epilogue
    val topQs = byTime.takeRight(25).map { case (k, m, _, _) => "\"" + k + "\":" + r3(m) }
      .mkString("{", ",", "}")
    println(s"""{"full":"$outFile","queries":$topQs,"errors":$errs,"sf":"$sfDir","n_queries":${results.size},"queries_note":"slowest 25 of ${results.size}; every key in $outFile","unit":"sec","metric":"total","value":${r3(total)}}""")
    spark.stop()
  }
}
