package graft

import graft.ml._
import graft.vec.VectorOps

/** q_linear_predict_int8 — quantized inference: the exact integer code
  * dot replays bit-for-bit from driver-side quantization, and the
  * rescaled probability tracks the float scorer within the int8
  * quantization error. */
class QuantizedScorerSpec extends SparkSpec {
  import spark.implicits._

  private lazy val out = VectorOps.qLinearPredictInt8(spark, sfDir)
    .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

  private lazy val emb = Tables.embeddings(spark, sfDir)
    .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()

  test("the integer code dot replays exactly from driver-side quantization") {
    assert(out.size == emb.length && emb.nonEmpty)
    emb.foreach { case (id, v) =>
      val x = v.map(_.toDouble).toArray
      val mx = x.map(math.abs).max
      val s = if (mx > 0) 127.0 / mx else 0.0
      val q = x.map(xi => math.floor(xi * s + 0.5).toLong)
      val dot = q.zip(VectorOps.int8WeightCodes).map { case (a, b) => a * b }.sum
      assert(out(id)._1 == dot, s"vec $id: dot ${out(id)._1} vs $dot")
    }
  }

  test("prob_int8 tracks the exact float scorer within quantization error") {
    val m = LinearModel(ModelWeights(Seq((1, 65)),
      (VectorOps.demoWeights :+ VectorOps.demoBias).toArray))
    var worst = 0.0
    var disagreements = 0
    emb.foreach { case (id, v) =>
      val exact = m.predictProb(v.map(_.toDouble).toArray)
      val approx = out(id)._2
      worst = math.max(worst, math.abs(exact - approx))
      if ((exact >= 0.5) != (approx >= 0.5)) disagreements += 1
    }
    // symmetric int8 keeps each reconstructed value within half a code
    // cell; through the dot and sigmoid that lands well under 0.05 here
    assert(worst < 0.05, s"worst |exact - int8| = $worst")
    // threshold decisions agree on all but boundary-straddling rows
    assert(disagreements <= emb.length / 100,
      s"$disagreements/${emb.length} threshold disagreements")
  }

  test("quantized scoring stays inside whole-stage codegen") {
    val plan = VectorOps.qLinearPredictInt8(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"))
  }
}
