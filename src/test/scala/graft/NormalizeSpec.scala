package graft

import org.apache.spark.sql.functions._

import graft.functions.Normalize
import graft.text.TextOps

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("nfc: composed and decomposed forms digest identically; ASCII is a fixpoint; null passes through") {
    val composed = "café niño"              // é, ñ precomposed
    val decomposed = "café niño"           // e+U+0301, n+U+0303
    val rows = Seq((1L, composed), (2L, decomposed), (3L, "plain ascii"), (4L, null: String))
      .toDF("id", "s")
      .select($"id", Normalize.nfc($"s").as("n"), md5(Normalize.nfc($"s")).as("d"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val byId = rows.map(r => r._1 -> r).toMap
    assert(byId(1L)._2 == byId(2L)._2, "NFC must collapse composed/decomposed")
    assert(byId(1L)._3 == byId(2L)._3)
    assert(byId(1L)._2 == composed, "NFC canonical form is the composed one")
    assert(byId(3L)._2 == "plain ascii")
    assert(byId(4L)._2 == null && byId(4L)._3 == null)
  }

  test("nfc stays inside whole-stage codegen (no fallback project wall)") {
    val df = spark.range(4).select(Normalize.nfc(concat(lit("café x"), $"id".cast("string"))).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    // the starred node prefix IS the WholeStageCodegen span marker; the
    // expression must sit inside one, not behind a fallback wall
    assert(plan.contains("*(1) Project [nfcnormalize"), plan.take(400))
    assert(df.collect().forall(_.getString(0).startsWith("café x")))
  }

  test("normalizeText composes, lowercases, collapses whitespace, trims") {
    val out = Seq("  CAFÉ   du  MONDE \t x ").toDF("s")
      .select(TextOps.normalizeText($"s").as("n")).head().getString(0)
    assert(out == "café du monde x", s"got '$out'")
  }

  test("q_text_normalize gate key: injected docs lose exactly 3 codepoints, others are already canonical") {
    val out = TextOps.qTextNormalize(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.nonEmpty)
    out.foreach { case (id, nRaw, nNorm, digest) =>
      val diff = nRaw - nNorm
      // suffix = 13 codepoints raw -> 10 canonical (2 marks compose, 1
      // double-space collapses); the base corpus is single-spaced ASCII
      if (id % 13 == 0) assert(diff == 3, s"doc $id diff $diff")
      else assert(diff == 0, s"doc $id unexpectedly non-canonical (diff $diff)")
      assert(digest != null && digest.length == 32)
    }
  }
}
