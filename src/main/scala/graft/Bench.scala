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
    val results = SparkEntry.queries.toSeq.map { case (name, fn) =>
      var err: Option[String] = None
      val times = (1 to reps).iterator.takeWhile(_ => err.isEmpty).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case t: Throwable => err = Some(sanitize(t)) }
        (System.nanoTime() - t0) / 1e9
      }.toVector
      val median = times.sorted.apply((times.size - 1) / 2)
      (name, median, times, err)
    }
    val qs = results.map { case (k, m, _, _) => "\"" + k + "\":" + m }
      .mkString("{", ",", "}")
    val runs = results.map { case (k, _, ts, _) => "\"" + k + "\":" + ts.mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, _, Some(e)) => "\"" + k + "\":\"" + e + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","method":"median of $reps noop-format writes per query (includes final ORDER BY cost; value per key = median, raw samples under runs; round-1 timed count(), which dropped sorts via EliminateSorts - totals not directly comparable)","queries":$qs,"runs":$runs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
