package graft

import graft.ml._
import graft.vec.VectorOps

/** Multi-class softmax head (the reference's `examples/mnist.py`
  * Dense(softmax) shape): cross-entropy backprop gradient-checked,
  * overflow-stable softmax, convergence through the unchanged trainer
  * harness, batched argmax scoring, and the q_softmax_predict
  * expression form pinned to the Scala model. */
class SoftmaxMlpSpec extends SparkSpec {
  import spark.implicits._

  /** 3-class blobs: class k centered at angle 2πk/3, radius 1.2,
    * uniform jitter ±0.35 — cleanly separable, not axis-aligned. */
  private lazy val blobs = {
    val rnd = new scala.util.Random(17)
    val rows = (0 until 330).map { i =>
      val k = i % 3
      val ang = 2 * math.Pi * k / 3
      val x0 = 1.2 * math.cos(ang) + (rnd.nextDouble() - 0.5) * 0.7
      val x1 = 1.2 * math.sin(ang) + (rnd.nextDouble() - 0.5) * 0.7
      (Seq(x0, x1), k.toDouble)
    }
    rows.toDF("features", "label")
  }

  private def accuracy(m: DiffModel): Double = {
    val data = blobs.as[(Seq[Double], Double)].collect()
    data.count { case (x, y) => m.predictLabel(x.toArray) == y }
      .toDouble / data.length
  }

  test("softmax gradient matches finite differences (hidden + linear heads)") {
    for (hiddens <- Seq(Seq(4), Seq.empty[Int])) {
      val m = SoftmaxMlpModel.init(din = 3, hiddens = hiddens, nClasses = 3, seed = 99L)
      val x = Array(0.3, -1.2, 0.7)
      for (y <- Seq(0.0, 1.0, 2.0)) {
        val g = m.gradient(x, y)
        val eps = 1e-6
        (0 until m.weights.flat.length).foreach { i =>
          val up = m.weights.flat.clone(); up(i) += eps
          val dn = m.weights.flat.clone(); dn(i) -= eps
          val num = (m.withWeights(m.weights.copy(flat = up)).logLoss(x, y) -
            m.withWeights(m.weights.copy(flat = dn)).logLoss(x, y)) / (2 * eps)
          assert(math.abs(num - g(i)) < 1e-5,
            s"hiddens=$hiddens y=$y grad mismatch at $i: ${g(i)} vs $num")
        }
      }
    }
  }

  test("softmax is a distribution and survives huge logits without NaN") {
    val m = SoftmaxMlpModel.init(2, Seq.empty, 3, seed = 7L)
    // scale weights 200x: naive exp(z) overflows; max-subtraction must not
    val big = m.withWeights(m.weights.copy(flat = m.weights.flat.map(_ * 200)))
    val rnd = new scala.util.Random(3)
    (0 until 25).foreach { _ =>
      val x = Array.fill(2)(rnd.nextDouble() * 20 - 10)
      for (mm <- Seq(m, big)) {
        val p = mm.predictClassProbs(x)
        assert(p.forall(v => !v.isNaN && v >= 0.0 && v <= 1.0))
        assert(math.abs(p.sum - 1.0) < 1e-9, s"sum ${p.sum}")
        assert(mm.predictLabel(x) == p.indexOf(p.max).toDouble)
      }
    }
  }

  test("3-class blobs converge through the distributed harness (sync + async rule)") {
    for (rule <- Seq(Trainers.Averaging, Trainers.Adag())) {
      val m = Trainers.trainDistributedModel(blobs, "features", "label",
        SoftmaxMlpModel.init(din = 2, hiddens = Seq(6), nClasses = 3, seed = 5L),
        numWorkers = 4, epochs = 40, lr = 0.8, rule = rule)
      val acc = accuracy(m)
      assert(acc > 0.9, s"rule $rule accuracy $acc")
    }
  }

  test("softmax training is deterministic given a seed") {
    def run() = Trainers.trainDistributedModel(blobs, "features", "label",
      SoftmaxMlpModel.init(2, Seq(4), 3, seed = 11L),
      numWorkers = 4, epochs = 3, lr = 0.5).weights.flat.toSeq
    assert(run() == run())
  }

  test("batched argmax scorer matches driver-side predictLabel") {
    val m = Trainers.trainDistributedModel(blobs, "features", "label",
      SoftmaxMlpModel.init(2, Seq(6), 3, seed = 5L),
      numWorkers = 2, epochs = 10, lr = 0.8)
    val bc = spark.sparkContext.broadcast(m)
    val scored = Predictor.predictBatchedLabel(blobs, bc, "features", "pred", batchSize = 32)
      .as[(Seq[Double], Double, Double)].collect()
    scored.foreach { case (x, _, pred) =>
      assert(pred == m.predictLabel(x.toArray))
    }
    bc.destroy()
  }

  test("softmax training report: per-epoch cross-entropy descends") {
    val report = Trainers.trainDistributedWithHistory(blobs, "features", "label",
      SoftmaxMlpModel.init(din = 2, hiddens = Seq(6), nClasses = 3, seed = 5L),
      numWorkers = 4, epochs = 10, lr = 0.8)
    assert(report.epochLoss.length == 10)
    assert(report.epochLoss.last < report.epochLoss.head,
      s"cross-entropy did not decrease: ${report.epochLoss}")
    assert(report.seconds > 0.0)
  }

  test("softmax ensemble: members differ, soft-vote committee accuracy high") {
    val members = Trainers.trainEnsembleModel(blobs, "features", "label",
      SoftmaxMlpModel.init(din = 2, hiddens = Seq(6), nClasses = 3, seed = 5L),
      numModels = 4, epochs = 40, lr = 0.8)
    assert(members.size == 4)
    // partitions see different data, so members must not be identical
    assert(members.map(_.weights.flat.toSeq).distinct.size > 1)
    val data = blobs.as[(Seq[Double], Double)].collect()
    val acc = data.count { case (x, y) =>
      Trainers.ensemblePredictClass(members, x.toArray) == y
    }.toDouble / data.length
    assert(acc > 0.9, s"softmax ensemble accuracy $acc")
  }

  test("q_softmax_predict expression form equals the Scala softmax model") {
    val model = VectorOps.smModel
    val out = VectorOps.qSoftmaxPredict(spark, sfDir).collect()
    val emb = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().toMap
    assert(out.nonEmpty && out.length == emb.size)
    out.foreach { r =>
      val x = emb(r.getAs[Long]("vec_id")).map(_.toDouble).toArray
      val p = model.predictClassProbs(x)
      assert(r.getAs[Int]("pred_class") == model.predictLabel(x).toInt)
      (0 until VectorOps.smClasses).foreach { k =>
        assert(math.abs(r.getAs[Double](s"p$k") - p(k)) < 2e-6,
          s"vec ${r.getAs[Long]("vec_id")} p$k: ${r.getAs[Double](s"p$k")} vs ${p(k)}")
      }
    }
  }

  test("q_multiclass_metrics equals the driver-side one-vs-rest confusion counts") {
    val model = VectorOps.smModel
    val k = VectorOps.smClasses
    val data = Tables.embeddings(spark, sfDir)
      .select("embedding", "label")
      .as[(Seq[Float], Int)].collect()
      .map { case (v, lab) =>
        (model.predictLabel(v.map(_.toDouble).toArray).toInt, lab % k)
      }
    val out = VectorOps.qMulticlassMetrics(spark, sfDir).collect()
    assert(out.length == k)
    out.foreach { r =>
      val c = r.getAs[Int]("class")
      val tp = data.count { case (p, y) => p == c && y == c }.toLong
      val fp = data.count { case (p, y) => p == c && y != c }.toLong
      val fn = data.count { case (p, y) => p != c && y == c }.toLong
      assert(r.getAs[Long]("tp") == tp && r.getAs[Long]("fp") == fp &&
        r.getAs[Long]("fn") == fn, s"class $c counts")
      val f1 = 2.0 * tp / (2 * tp + fp + fn)
      assert(math.abs(r.getAs[Double]("f1") - f1) < 1e-6, s"class $c f1")
    }
  }

  test("q_cross_entropy equals the mean SoftmaxHead logLoss of the demo model") {
    val model = VectorOps.smModel
    val k = VectorOps.smClasses
    val data = Tables.embeddings(spark, sfDir)
      .select("embedding", "label").as[(Seq[Float], Int)].collect()
    val expected = data.map { case (v, lab) =>
      model.logLoss(v.map(_.toDouble).toArray, (lab % k).toDouble)
    }.sum / data.length
    val r = VectorOps.qCrossEntropy(spark, sfDir).head()
    assert(r.getAs[Long]("n") == data.length)
    // per-row 6dp rounding bounds the mean's drift by 5e-7
    assert(math.abs(r.getAs[Double]("mean_ce") - expected) < 1e-6,
      s"mean_ce ${r.getAs[Double]("mean_ce")} vs $expected")
  }

  test("q_topk_accuracy: top-1 equals argmax accuracy, top-2 dominates it") {
    val model = VectorOps.smModel
    val k = VectorOps.smClasses
    val data = Tables.embeddings(spark, sfDir)
      .select("embedding", "label").as[(Seq[Float], Int)].collect()
    val top1 = data.count { case (v, lab) =>
      model.predictLabel(v.map(_.toDouble).toArray).toInt == lab % k
    }.toDouble / data.length
    val r = VectorOps.qTopkAccuracy(spark, sfDir).head()
    assert(math.abs(r.getAs[Double]("top1_acc") - top1) < 1e-6,
      s"top1 ${r.getAs[Double]("top1_acc")} vs argmax-accuracy $top1")
    assert(r.getAs[Double]("top2_acc") >= r.getAs[Double]("top1_acc"))
    assert(r.getAs[Double]("top2_acc") <= 1.0)
  }
}
