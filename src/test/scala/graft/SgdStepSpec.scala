package graft

import org.apache.spark.sql.functions._

import graft.ml._
import graft.vec.VectorOps

/** q_sgd_step — the distributed full-batch gradient step as a
  * relational aggregate (the worker-gradient + average heart of the
  * reference's `distkeras/trainers.py` loop [H]): pins the relational
  * step to `LinearModel.gradient`'s mean over the same rows, proves the
  * DECIMAL term-sum is partitioning-invariant (the order-proof claim),
  * and checks the plan shape (single 65-key aggregate, no UDF). */
class SgdStepSpec extends SparkSpec {
  import spark.implicits._

  test("relational step equals the LinearModel mean gradient (within the rounding grids)") {
    val out = VectorOps.qSgdStep(spark, sfDir)
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out.size == 65)
    val rows = Tables.embeddings(spark, sfDir)
      .select(col("embedding"), (col("label") % 2).cast("double").as("y"))
      .as[(Seq[Float], Double)].collect()
    val m = LinearModel(ModelWeights(Seq((1, 65)),
      (VectorOps.demoWeights :+ VectorOps.demoBias).toArray))
    val g = new Array[Double](65)
    rows.foreach { case (v, y) =>
      val gi = m.gradient(v.map(_.toDouble).toArray, y)
      var i = 0
      while (i < 65) { g(i) += gi(i); i += 1 }
    }
    val n = rows.length
    (0 until 65).foreach { i =>
      val wOld = if (i < 64) VectorOps.demoWeights(i) else VectorOps.demoBias
      val expected = wOld - 0.1 * g(i) / n
      val (qOld, qNew) = out(i)
      assert(math.abs(qOld - wOld) < 1e-9, s"w_old at $i")
      // the query rounds p to 6 dp and each term to 9 dp before the
      // exact DECIMAL sum; the unrounded model mean can differ by at
      // most lr·(p-grid error) ≈ 1e-7 per unit feature
      assert(math.abs(qNew - expected) < 1e-6,
        s"w_new at $i: query $qNew vs model $expected")
    }
  }

  test("the stepped weights strictly reduce the full-batch log loss (it IS a descent step)") {
    val out = VectorOps.qSgdStep(spark, sfDir)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    val before = LinearModel(ModelWeights(Seq((1, 65)),
      (VectorOps.demoWeights :+ VectorOps.demoBias).toArray))
    val after = LinearModel(ModelWeights(Seq((1, 65)),
      Array.tabulate(65)(out)))
    val rows = Tables.embeddings(spark, sfDir)
      .select(col("embedding"), (col("label") % 2).cast("double").as("y"))
      .as[(Seq[Float], Double)].collect()
    def loss(m: LinearModel): Double =
      rows.map { case (v, y) => m.logLoss(v.map(_.toDouble).toArray, y) }.sum / rows.length
    assert(loss(after) < loss(before),
      s"step must descend: ${loss(after)} !< ${loss(before)}")
  }

  test("the gradient sum is partitioning-invariant (order-proof DECIMAL device)") {
    // same computation at 1 partition and at 16: the DECIMAL(28,9)
    // term sum is integer-scaled and commutative, so the emitted
    // weights must be BIT-identical, not merely close
    def run(parts: Int): Seq[(Int, Double)] = {
      val base = Tables.embeddings(spark, sfDir).repartition(parts)
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_sgd_$parts").toString
      base.write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
      VectorOps.qSgdStep(spark, tmp)
        .select("idx", "w_new").as[(Int, Double)].collect().toSeq
    }
    assert(run(1) == run(16))
  }

  test("q_softmax_sgd_step equals the SoftmaxMlpModel mean gradient per (class, coord)") {
    val k = VectorOps.smClasses
    val out = VectorOps.qSoftmaxSgdStep(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    assert(out.size == k * 65)
    val m = VectorOps.smModel
    val rows = Tables.embeddings(spark, sfDir)
      .select(col("embedding"), (col("label") % k).cast("double").as("y"))
      .as[(Seq[Float], Double)].collect()
    // flat layout of the no-hidden softmax model: class-major W rows
    // (k*64) then the k biases — map (class, coord) onto it
    val g = new Array[Double](m.weights.flat.length)
    rows.foreach { case (v, y) =>
      val gi = m.gradient(v.map(_.toDouble).toArray, y)
      var i = 0
      while (i < g.length) { g(i) += gi(i); i += 1 }
    }
    val n = rows.length
    for (c <- 0 until k; i <- 0 to 64) {
      val flatIdx = if (i < 64) c * 64 + i else k * 64 + c
      val wOld = if (i < 64) VectorOps.smW(c)(i) else VectorOps.smB(c)
      val expected = wOld - 0.1 * g(flatIdx) / n
      val (qOld, qNew) = out((c, i))
      assert(math.abs(qOld - wOld) < 1e-9, s"w_old at ($c,$i)")
      assert(math.abs(qNew - expected) < 1e-6,
        s"w_new at ($c,$i): query $qNew vs model $expected")
    }
  }

  test("the softmax step strictly reduces the mean cross-entropy") {
    val k = VectorOps.smClasses
    val out = VectorOps.qSoftmaxSgdStep(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(3)).toMap
    val flatNew = Array.tabulate(k * 65) { fi =>
      if (fi < k * 64) out((fi / 64, fi % 64)) else out((fi - k * 64, 64))
    }
    val before = VectorOps.smModel
    val after = before.withWeights(before.weights.copy(flat = flatNew))
    val rows = Tables.embeddings(spark, sfDir)
      .select(col("embedding"), (col("label") % k).cast("double").as("y"))
      .as[(Seq[Float], Double)].collect()
    def loss(m: graft.ml.SoftmaxMlpModel): Double =
      rows.map { case (v, y) => m.logLoss(v.map(_.toDouble).toArray, y) }.sum / rows.length
    assert(loss(after) < loss(before),
      s"softmax step must descend: ${loss(after)} !< ${loss(before)}")
  }

  test("plan shape: one 65-key aggregate, no UDF, codegen end to end") {
    val plan = VectorOps.qSgdStep(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      "the gradient step must be pure Catalyst expressions")
    assert(plan.contains("HashAggregate"), "expected a hash aggregate")
  }
}
