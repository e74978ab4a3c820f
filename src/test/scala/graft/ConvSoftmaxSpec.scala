package graft

import graft.ml._
import graft.vec.VectorOps

/** The multi-class convolutional architecture — the EXACT flagship
  * `examples/mnist.py` stack (Conv2D → ReLU → MaxPooling2D → Flatten →
  * Dense(K, softmax) [H]): cross-entropy backprop correctness through
  * the conv/pool block AND the K-way dense head (finite differences),
  * convergence on a 3-class spatial task through the SAME distributed
  * harness as every other model, seed determinism, single-trainer
  * equivalence, persistence, and the pinning of the
  * q_conv_softmax_predict Catalyst expression form to the Scala model. */
class ConvSoftmaxSpec extends SparkSpec {
  import spark.implicits._

  /** 3-class spatial fixture: class 0 = pure low noise; classes 1/2
    * carry a bright 3×3 patch confined to the TOP vs BOTTOM half of the
    * 8×8 image — the conv filter detects the patch, and the pooled 3×3
    * grid (which preserves coarse position) lets the dense softmax head
    * separate top from bottom. */
  private lazy val patches3 = {
    val rnd = new scala.util.Random(29)
    val rows = (0 until 384).map { i =>
      val img = Array.fill(64)(rnd.nextDouble() * 0.3)
      val y = i % 3
      if (y > 0) {
        val r = if (y == 1) rnd.nextInt(2) else 4 + rnd.nextInt(2)
        val c = rnd.nextInt(6)
        for (dr <- 0 until 3; dc <- 0 until 3)
          img((r + dr) * 8 + (c + dc)) = 0.8 + rnd.nextDouble() * 0.2
      }
      (img.toSeq, y.toDouble)
    }
    rows.toDF("features", "label")
  }

  private def accuracy(m: DiffModel, df: org.apache.spark.sql.DataFrame): Double = {
    val data = df.as[(Seq[Double], Double)].collect()
    data.count { case (x, y) => m.predictLabel(x.toArray) == y }
      .toDouble / data.length
  }

  test("conv-softmax gradient matches finite differences (all 3 class labels)") {
    val m = ConvSoftmaxModel.init(h = 8, w = 8, kh = 3, kw = 3, nFilters = 2,
      nClasses = 3, seed = 99L)
    val rnd = new scala.util.Random(3)
    val x = Array.fill(64)(rnd.nextDouble() * 2 - 1)
    for (y <- Seq(0.0, 1.0, 2.0)) {
      val g = m.gradient(x, y)
      val eps = 1e-6
      (0 until m.weights.flat.length).foreach { i =>
        val up = m.weights.flat.clone(); up(i) += eps
        val dn = m.weights.flat.clone(); dn(i) -= eps
        val num = (m.withWeights(m.weights.copy(flat = up)).logLoss(x, y) -
          m.withWeights(m.weights.copy(flat = dn)).logLoss(x, y)) / (2 * eps)
        assert(math.abs(num - g(i)) < 1e-4,
          s"grad mismatch at $i (y=$y): analytic ${g(i)} vs numeric $num")
      }
    }
  }

  test("class probabilities sum to 1 and survive huge logits (max-subtraction)") {
    val m = ConvSoftmaxModel.init(8, 8, 3, 3, 2, nClasses = 4, seed = 5L)
    val x = Array.tabulate(64)(i => (i % 5) * 0.2)
    val p = m.predictClassProbs(x)
    assert(p.length == 4 && math.abs(p.sum - 1.0) < 1e-12 && p.forall(_ >= 0.0))
    // scale the dense head so the logits are huge: naive exp overflows
    val big = m.withWeights(m.weights * 1e4)
    val pb = big.predictClassProbs(x)
    assert(pb.forall(v => !v.isNaN && !v.isInfinite) && math.abs(pb.sum - 1.0) < 1e-9)
  }

  test("predictLabel is the argmax class with ties to the smallest index") {
    val m = ConvSoftmaxModel.init(8, 8, 3, 3, 2, nClasses = 3, seed = 7L)
    val x = Array.tabulate(64)(i => (i % 3) * 0.3)
    val p = m.predictClassProbs(x)
    assert(m.predictLabel(x) == p.indexOf(p.max).toDouble)
    assert(math.abs(m.predictProb(x) - p.max) < 1e-15)
    // all-zero weights → uniform distribution → tie → class 0
    val z = m.withWeights(m.weights * 0.0)
    assert(z.predictLabel(x) == 0.0)
  }

  test("conv-softmax converges on the 3-class spatial task through the distributed harness") {
    val m = Trainers.trainDistributedModel(patches3, "features", "label",
      ConvSoftmaxModel.init(8, 8, 3, 3, nFilters = 2, nClasses = 3, seed = 5L),
      numWorkers = 4, epochs = 40, lr = 0.3)
    val acc = accuracy(m, patches3)
    assert(acc > 0.85, s"conv-softmax accuracy $acc")
  }

  test("conv-softmax training is deterministic given a seed") {
    def run() = Trainers.trainDistributedModel(patches3, "features", "label",
      ConvSoftmaxModel.init(8, 8, 3, 3, 2, 3, seed = 11L),
      numWorkers = 4, epochs = 3, lr = 0.2).weights.flat.toSeq
    assert(run() == run())
  }

  test("distributed conv-softmax with 1 partition == single trainer") {
    val init = ConvSoftmaxModel.init(8, 8, 3, 3, 2, 3, seed = 17L)
    val single = Trainers.trainSingleModel(patches3, "features", "label", init,
      epochs = 3, lr = 0.2)
    val dist = Trainers.trainDistributedModel(patches3, "features", "label", init,
      numWorkers = 1, epochs = 3, lr = 0.2, rule = Trainers.Averaging)
    assert(single.weights.flat.zip(dist.weights.flat).forall {
      case (a, b) => math.abs(a - b) < 1e-12
    })
  }

  test("ModelWeights codec round-trips the conv-softmax layout bit-exactly") {
    val m = ConvSoftmaxModel.init(8, 8, 3, 3, 2, 3, seed = 23L)
    val path = java.nio.file.Files.createTempDirectory("graft_convsm").toString
    ModelIO.save(spark, m.weights, path)
    val back = ModelIO.load(spark, path)
    assert(back.shapes == m.weights.shapes)
    assert(back.flat.toSeq == m.weights.flat.toSeq)
    val rebuilt = ConvSoftmaxModel(back, 8, 8, 3, 3, 2, 3)
    val x = Array.tabulate(64)(i => (i % 7) * 0.1)
    assert(rebuilt.predictClassProbs(x).toSeq == m.predictClassProbs(x).toSeq)
    // arch-inferring loader: (kh, kw, nFilters, K) come from the shape
    // list alone; only the image dims are supplied
    val loaded = ModelIO.loadConvSoftmax(spark, path, 8, 8)
    assert((loaded.h, loaded.w, loaded.kh, loaded.kw, loaded.nFilters,
      loaded.nClasses) == (m.h, m.w, m.kh, m.kw, m.nFilters, m.nClasses))
    assert(loaded.weights.flat.toSeq == m.weights.flat.toSeq)
    // a wrong geometry or the wrong family fails fast, never mis-scores
    intercept[IllegalArgumentException](ModelIO.loadConvSoftmax(spark, path, 8, 10))
    intercept[IllegalArgumentException](ModelIO.loadConvNet(spark, path, 8, 8))
  }

  test("q_conv_softmax_predict expression form equals the Scala ConvSoftmaxModel") {
    val model = VectorOps.convSmModel
    val expr = VectorOps.qConvSoftmaxPredict(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), Seq(r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val emb = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect()
    assert(emb.nonEmpty && expr.size == emb.length)
    emb.foreach { case (id, v) =>
      val x = v.map(_.toDouble).toArray
      val p = model.predictClassProbs(x)
      val (cls, probs) = expr(id)
      assert(cls == model.predictLabel(x).toInt, s"vec $id: class $cls")
      probs.zip(p).foreach { case (e, s) =>
        // identical conv block (exact max/ReLU) + the same softmax form;
        // only the ROUND to the 1e-6 grid separates the two
        assert(math.abs(e - s) < 2e-6, s"vec $id: expr $e vs model $s")
      }
    }
  }

  test("predictions stay inside whole-stage codegen (no UDF stages)") {
    val plan = VectorOps.qConvSoftmaxPredict(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      "conv-softmax scoring must be pure Catalyst expressions")
  }
}
