package graft

import graft.ml._
import graft.vec.VectorOps

/** The convolutional architecture (the reference's flagship
  * `examples/mnist.py` Conv2D → ReLU → MaxPooling2D → Dense model [H]):
  * backprop correctness through the pool argmax and ReLU mask (finite
  * differences), convergence on a patch-detection task through the SAME
  * distributed harness as every other model, seed determinism,
  * single-trainer equivalence, persistence, and the pinning of the
  * q_conv_predict Catalyst expression form to the Scala forward pass. */
class ConvNetSpec extends SparkSpec {
  import spark.implicits._

  /** Patch-detection fixture: class 1 images carry a bright 3×3 patch
    * at a random position over low noise; class 0 is pure low noise —
    * exactly the translation-invariant signal a conv filter + max-pool
    * detects and a plain linear model cannot (position varies). */
  private lazy val patches = {
    val rnd = new scala.util.Random(13)
    val rows = (0 until 256).map { i =>
      val img = Array.fill(64)(rnd.nextDouble() * 0.3)
      val y = i % 2
      if (y == 1) {
        val r = rnd.nextInt(6); val c = rnd.nextInt(6)
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

  test("conv gradient matches finite differences (through pool argmax + ReLU mask)") {
    val m = ConvNetModel.init(h = 8, w = 8, kh = 3, kw = 3, nFilters = 2, seed = 99L)
    val rnd = new scala.util.Random(3)
    val x = Array.fill(64)(rnd.nextDouble() * 2 - 1)
    for (y <- Seq(0.0, 1.0)) {
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

  test("gradient also checks on a second geometry (6x6 input, 3 filters)") {
    val m = ConvNetModel.init(h = 6, w = 6, kh = 3, kw = 3, nFilters = 3, seed = 7L)
    val rnd = new scala.util.Random(8)
    val x = Array.fill(36)(rnd.nextDouble() * 2 - 1)
    val g = m.gradient(x, 1.0)
    val eps = 1e-6
    (0 until m.weights.flat.length).foreach { i =>
      val up = m.weights.flat.clone(); up(i) += eps
      val dn = m.weights.flat.clone(); dn(i) -= eps
      val num = (m.withWeights(m.weights.copy(flat = up)).logLoss(x, 1.0) -
        m.withWeights(m.weights.copy(flat = dn)).logLoss(x, 1.0)) / (2 * eps)
      assert(math.abs(num - g(i)) < 1e-4, s"grad mismatch at $i")
    }
  }

  test("convnet converges on the patch task through the distributed harness") {
    val m = Trainers.trainDistributedModel(patches, "features", "label",
      ConvNetModel.init(8, 8, 3, 3, nFilters = 2, seed = 5L),
      numWorkers = 4, epochs = 30, lr = 0.5)
    val acc = accuracy(m, patches)
    assert(acc > 0.9, s"convnet accuracy $acc")
  }

  test("convnet training is deterministic given a seed") {
    def run() = Trainers.trainDistributedModel(patches, "features", "label",
      ConvNetModel.init(8, 8, 3, 3, 2, seed = 11L),
      numWorkers = 4, epochs = 3, lr = 0.3).weights.flat.toSeq
    assert(run() == run())
  }

  test("distributed convnet with 1 partition == single trainer") {
    val init = ConvNetModel.init(8, 8, 3, 3, 2, seed = 17L)
    val single = Trainers.trainSingleModel(patches, "features", "label", init,
      epochs = 3, lr = 0.3)
    val dist = Trainers.trainDistributedModel(patches, "features", "label", init,
      numWorkers = 1, epochs = 3, lr = 0.3, rule = Trainers.Averaging)
    assert(single.weights.flat.zip(dist.weights.flat).forall {
      case (a, b) => math.abs(a - b) < 1e-12
    })
  }

  test("ModelWeights codec round-trips the conv layout bit-exactly") {
    val m = ConvNetModel.init(8, 8, 3, 3, 2, seed = 23L)
    val path = java.nio.file.Files.createTempDirectory("graft_conv").toString
    ModelIO.save(spark, m.weights, path)
    val back = ModelIO.load(spark, path)
    assert(back.shapes == m.weights.shapes)
    assert(back.flat.toSeq == m.weights.flat.toSeq)
    val rebuilt = ConvNetModel(back, 8, 8, 3, 3, 2)
    val x = Array.tabulate(64)(i => (i % 7) * 0.1)
    assert(rebuilt.predictProb(x) == m.predictProb(x))
    // arch-inferring loader: (kh, kw, nFilters) from the shapes alone
    val loaded = ModelIO.loadConvNet(spark, path, 8, 8)
    assert((loaded.h, loaded.w, loaded.kh, loaded.kw, loaded.nFilters) ==
      (m.h, m.w, m.kh, m.kw, m.nFilters))
    assert(loaded.weights.flat.toSeq == m.weights.flat.toSeq)
    intercept[IllegalArgumentException](ModelIO.loadConvNet(spark, path, 10, 8))
    intercept[IllegalArgumentException](ModelIO.loadConvSoftmax(spark, path, 8, 8))
  }

  test("loader survives the kernel-shape == bias-shape collision (kw=1, kh=nFilters)") {
    // shapes [(2,1),(2,1),(2,1),(1,32),(1,1)]: the conv-bias entry is
    // bit-identical to the kernels — a takeWhile-based filter count
    // absorbed it and rejected this valid saved model (round-13 review)
    val m = ConvNetModel.init(h = 9, w = 8, kh = 2, kw = 1, nFilters = 2, seed = 31L)
    val path = java.nio.file.Files.createTempDirectory("graft_conv_kw1").toString
    ModelIO.save(spark, m.weights, path)
    val loaded = ModelIO.loadConvNet(spark, path, 9, 8)
    assert((loaded.kh, loaded.kw, loaded.nFilters) == (2, 1, 2))
    val x = Array.tabulate(72)(i => (i % 5) * 0.2)
    assert(loaded.predictProb(x) == m.predictProb(x))
  }

  test("q_conv_predict expression form equals the Scala ConvNetModel forward pass") {
    val model = VectorOps.convDemoModel
    val expr = VectorOps.qConvPredict(spark, sfDir)
      .select("vec_id", "conv_prob").as[(Long, Double)].collect().toMap
    val emb = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect()
    assert(emb.nonEmpty && expr.size == emb.length)
    emb.foreach { case (id, v) =>
      val p = model.predictProb(v.map(_.toDouble).toArray)
      // identical left-associated folds + exact max/ReLU; only the ROUND
      // to the 1e-6 grid separates the emitted value from the model's
      assert(math.abs(expr(id) - p) < 2e-6,
        s"vec $id: expr ${expr(id)} vs model $p")
    }
  }

  test("predictions stay inside whole-stage codegen (no UDF stages)") {
    val plan = VectorOps.qConvPredict(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      "conv scoring must be pure Catalyst expressions")
  }
}
