// Ad-hoc probe (not part of the sbt build; compile with scalac against
// target/scala-2.13/classes + /opt/spark/jars): times the LLM-pipeline
// family stage by stage at bench shape (local[32], shuffle=32, noop
// writes) so the r16 optimization round attacks the measured hot stage
// instead of a guessed one.
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object StageProbe {
  def t(label: String)(df: => DataFrame): Unit = {
    val d = df
    d.write.format("noop").mode("overwrite").save() // warm (codegen)
    val t0 = System.nanoTime()
    d.write.format("noop").mode("overwrite").save()
    println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
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
    // pipeline stage costs, built standalone (each timed from cold)
    t("scrub(regex x2) only") {
      val injected = when(col("doc_id") % 7 === 0,
        concat(lit("contact user"), col("doc_id").cast("string"),
          lit("@example.com via https://example.org/u/"),
          col("doc_id").cast("string"), lit(" "), col("text")))
        .otherwise(col("text"))
      docs.select(col("doc_id"), col("source"),
        regexp_replace(regexp_replace(injected, TextOps.emailRe, "<EMAIL>"),
          TextOps.urlRe, "<URL>").as("text"))
    }
    t("qualityTails (unigram+cuts)") { TextOps.qualityTails(docs) }
    t("repetitionReport") { TextOps.repetitionReport(docs) }
    t("decontaminationReport") {
      TextOps.decontaminationReport(docs,
        graft.text.Sampling.inSample(col("doc_id"), TextOps.decontamEvalFraction), 3)
    }
    t("substringDupPairs") { TextOps.substringDupPairs(docs) }
    t("ngramJaccardPairs(0.5,None)") { TextOps.ngramJaccardPairs(docs, 3, 0.5, None) }
    t("minhash signatures") { TextOps.minhashSignatures(docs, 3) }
    t("bandedCandidates(from sigs)") {
      TextOps.bandedCandidatesFromSignatures(TextOps.minhashSignatures(docs, 3))
    }
    t("nearDupPairs (uncapped, full)") { TextOps.nearDupPairs(docs, 3, 0.6) }
    t("nearDupPairsCapped (full)") { TextOps.nearDupPairsCapped(docs, 3, 0.6) }
    t("shingleRows w=3 (df-capped)") { TextOps.shingleRows(docs, 3) }
    spark.stop()
  }
}
