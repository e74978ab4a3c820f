// Ad-hoc A/B probe: OLD (two-explode) vs NEW (row-local trigram)
// repetitionReport shapes in ONE JVM so box-state drift cancels.
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object RepProbe {
  def t(label: String, reps: Int = 3)(df: => DataFrame): Unit = {
    val d = df
    d.write.format("noop").mode("overwrite").save() // warm
    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      d.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"$label%-30s median ${ts.sorted.apply((reps - 1) / 2)}%7.2f s  runs ${ts.map(x => f"$x%.2f").mkString(",")}")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, dir)
    import graft.text.TextOps
    import graft.text.TextOps.{tokens, shingles, repTopBigramMax, repDupTrigramMax}

    def oldRep(docs: DataFrame): DataFrame = {
      val toks = tokens(col("text"))
      val g2 = docs.select(col("doc_id"), explode(shingles(toks, 2)).as("g"))
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(max(col("c")).as("max2"), sum(col("c")).as("tot2"))
      val g3 = docs.select(col("doc_id"), explode(shingles(toks, 3)).as("g"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("tot3"), countDistinct(col("g")).as("dist3"))
      val topBigram = col("max2").cast("double") / col("tot2")
      val dupTrigram = lit(1.0) - col("dist3").cast("double") / col("tot3")
      g2.join(g3, Seq("doc_id"))
        .select(col("doc_id"),
          round(topBigram, 6).as("top_bigram_frac"),
          round(dupTrigram, 6).as("dup_trigram_frac"),
          (topBigram > repTopBigramMax || dupTrigram > repDupTrigramMax).as("flagged"))
    }

    t("OLD repetitionReport") { oldRep(docs) }
    t("NEW repetitionReport") { TextOps.repetitionReport(docs) }
    t("OLD repetitionReport(2)") { oldRep(docs) }
    t("NEW repetitionReport(2)") { TextOps.repetitionReport(docs) }
    // equivalence check: symmetric difference must be empty
    val a = oldRep(docs); val b = TextOps.repetitionReport(docs)
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(s"symmetric-diff rows = $diff")
    spark.stop()
  }
}
