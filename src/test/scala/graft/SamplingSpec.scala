package graft

import org.apache.spark.sql.functions._

import graft.text.Sampling

/** Content-hash sampling semantics: reproducibility is the whole point,
  * so every property here is about stability — same rows across runs,
  * across repartitioning, and membership consistency between the sample
  * and the split ops. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sfDir)

  test("hashSample keeps ~fraction of rows, exactly the same rows every run") {
    val n = docs.count().toDouble
    val s1 = Sampling.hashSample(docs, $"doc_id", 0.10)
      .select("doc_id").as[Long].collect().toSet
    val s2 = Sampling.hashSample(docs.repartition(13), $"doc_id", 0.10)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2, "sample must not depend on partitioning")
    // 2-hex granularity + 500-doc corpus: generous tolerance band
    assert(s1.size / n > 0.03 && s1.size / n < 0.25,
      s"10% sample kept ${s1.size} of $n")
    // fraction monotonicity: a bigger sample contains the smaller one
    val s3 = Sampling.hashSample(docs, $"doc_id", 0.30)
      .select("doc_id").as[Long].collect().toSet
    assert(s1.subsetOf(s3))
    // boundary cases
    assert(Sampling.hashSample(docs, $"doc_id", 0.0).count() == 0)
    assert(Sampling.hashSample(docs, $"doc_id", 1.0).count() == n.toLong)
  }

  test("splitAssign is disjoint, exhaustive, and roughly proportioned") {
    val split = docs.select($"doc_id",
      Sampling.splitAssign($"doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
    val counts = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    val total = counts.values.sum
    assert(total == docs.count(), "every row must get exactly one label")
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train").toDouble / total > 0.7, s"$counts")
    // splits agree with hashSample: the 10%-sample rows are exactly the
    // rows below the same hash cut, so sample ⊆ is consistent by cut
    val cut80 = Sampling.hashSample(docs, $"doc_id", 0.8)
      .select("doc_id").as[Long].collect().toSet
    val train = split.filter($"split" === "train")
      .select("doc_id").as[Long].collect().toSet
    assert(train == cut80, "train split must equal the 80% hash sample")
  }

  test("splitAssign with a cut that rounds to 256 (0.999/0.001) assigns by the guard, not hex '100'") {
    // round(0.999·256) = 256: hexOf(256) is the 3-char "100", which is
    // lexicographically above only "00".."0f" — without the always-true
    // guard ~94% of rows would silently land in "val"
    val split = docs.select($"doc_id",
      Sampling.splitAssign($"doc_id",
        Seq("train" -> 0.999, "val" -> 0.001)).as("split"))
    val counts = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.getOrElse("train", 0L) == docs.count(),
      s"0.999 rounds to cut 256 → every row is train at 1/256 granularity; got $counts")
  }

  test("splitAssign rejects fractions not summing to 1") {
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(lit(1L), Seq("a" -> 0.5, "b" -> 0.3))
    }
  }

  test("stratified sample applies per-stratum fractions independently") {
    val out = Sampling.stratifiedHashSample(docs, $"lang", $"doc_id",
      Map("en" -> 1.0, "de" -> 0.0, "fr" -> 0.5))
    val byLang = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    val full = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang.getOrElse("de", 0L) == 0L)
    assert(byLang("en") == full("en"), "fraction 1.0 keeps the whole stratum")
    assert(!byLang.contains("es") && !byLang.contains("zh"),
      "strata absent from the map are dropped")
    val frFrac = byLang.getOrElse("fr", 0L).toDouble / full("fr")
    assert(frFrac > 0.2 && frFrac < 0.8, s"fr kept $frFrac")
    // deterministic across runs
    val again = Sampling.stratifiedHashSample(docs, $"lang", $"doc_id",
      Map("en" -> 1.0, "de" -> 0.0, "fr" -> 0.5))
      .select("doc_id").as[Long].collect().toSet
    assert(again == out.select("doc_id").as[Long].collect().toSet)
  }
}
