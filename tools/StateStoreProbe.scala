// Ad-hoc probe (not part of the sbt build; copy into src/ to compile,
// run via java -cp target/classes:/opt/spark/jars/*): r17 ask #8 —
// measure the RocksDB state-store provider against the default
// HDFS-backed one on the streaming replay keys at the pinned 8 state
// partitions. Adoption bar (set by the r16 verdict): >=30% per-key win
// with result determinism intact; numbers are committed either way.
import org.apache.spark.sql.SparkSession

object StateStoreProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val keys = Seq("q_stream_tumbling", "q_stream_append",
      "q_stream_join_outer", "q_stream_dedup_incremental",
      "q_stream_session")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val providers = Seq(
      "default" -> "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
      "rocksdb" -> "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // interleave providers per key so box drift hits both sides equally
    keys.foreach { k =>
      val results = providers.map { case (tag, cls) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", cls)
        val fn = graft.SparkEntry.queries(k)
        // warm-up (codegen + source listing)
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, dir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        val rows = fn(spark, dir).collect().map(_.toString).sorted.toSeq
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        (tag, times.sorted.apply(1), times, rows)
      }
      val (t0, m0, r0, rows0) = results(0)
      val (t1, m1, r1, rows1) = results(1)
      val det = rows0 == rows1
      println(f"$k%-28s $t0=$m0%6.3f ${r0.map(t => f"$t%5.2f").mkString("[",",","]")}  " +
        f"$t1=$m1%6.3f ${r1.map(t => f"$t%5.2f").mkString("[",",","]")}  " +
        f"speedup=${m0 / m1}%5.2f deterministic=$det")
    }
    spark.stop()
    sys.exit(0)
  }
}
