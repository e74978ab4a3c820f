package graft

import graft.ml._

/** Training semantics (SURVEY.md §5.2 item 4): convergence on a
  * linearly-separable fixture, determinism given a seed, and the
  * degenerate equivalences that pin the sync-averaging redesign to the
  * reference's semantics. */
class TrainersSpec extends SparkSpec {
  import spark.implicits._

  /** linsep fixture: y = 1 iff x0 + x1 > 1 (margin 0.2 around boundary). */
  private lazy val linsep = {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 256).map { _ =>
      val x0 = rnd.nextDouble() * 2
      val x1 = rnd.nextDouble() * 2
      val s = x0 + x1
      if (s > 0.9 && s < 1.1) None
      else Some((Seq(x0, x1), if (s >= 1.0) 1.0 else 0.0))
    }.flatten
    rows.toDF("features", "label")
  }

  test("SingleTrainer converges: accuracy > 0.95 on separable data") {
    val m = Trainers.trainSingle(linsep, "features", "label", dim = 2, epochs = 40, lr = 0.8, batchSize = 16)
    val scored = Predictor.predictLinear(linsep, m, "features", "margin")
      .selectExpr("CASE WHEN margin >= 0 THEN 1.0 ELSE 0.0 END AS pred", "label")
    val acc = Evaluator.accuracy(scored, "pred", "label")
    assert(acc > 0.95, s"accuracy $acc")
  }

  test("SingleTrainer loss decreases over epochs") {
    def loss(m: LinearModel): Double = {
      val data = linsep.as[(Seq[Double], Double)].collect()
      data.map { case (x, y) => m.logLoss(x.toArray, y) }.sum / data.length
    }
    val l0 = loss(Trainers.trainSingle(linsep, "features", "label", 2, epochs = 1, lr = 0.5))
    val l5 = loss(Trainers.trainSingle(linsep, "features", "label", 2, epochs = 5, lr = 0.5))
    val l20 = loss(Trainers.trainSingle(linsep, "features", "label", 2, epochs = 20, lr = 0.5))
    assert(l5 < l0 && l20 < l5, s"loss not decreasing: $l0 -> $l5 -> $l20")
  }

  test("distributed averaging with 1 partition == SingleTrainer") {
    val single = Trainers.trainSingle(linsep, "features", "label", 2, epochs = 3, lr = 0.5)
    val dist = Trainers.trainDistributed(linsep, "features", "label", 2,
      numWorkers = 1, epochs = 3, lr = 0.5, rule = Trainers.Averaging)
    assert(single.weights.flat.zip(dist.weights.flat).forall {
      case (a, b) => math.abs(a - b) < 1e-12
    })
  }

  test("every update rule converges on separable data") {
    val rules: Seq[(String, Trainers.UpdateRule)] = Seq(
      "averaging" -> Trainers.Averaging,
      "downpour" -> Trainers.Downpour,
      "elastic" -> Trainers.ElasticAverage(0.5),
      "eamsgd" -> Trainers.ElasticAverageMomentum(0.5, 0.5),
      "adag" -> Trainers.Adag(),
      "dynsgd" -> Trainers.DynSgd)
    rules.foreach { case (name, rule) =>
      val m = Trainers.trainDistributed(linsep, "features", "label", 2,
        numWorkers = 4, epochs = 25, lr = 0.8, rule = rule)
      val scored = Predictor.predictLinear(linsep, m, "features", "margin")
        .selectExpr("CASE WHEN margin >= 0 THEN 1.0 ELSE 0.0 END AS pred", "label")
      val acc = Evaluator.accuracy(scored, "pred", "label")
      assert(acc > 0.9, s"$name accuracy $acc")
    }
  }

  test("training is deterministic given a seed") {
    def run() = Trainers.trainDistributed(linsep, "features", "label", 2,
      numWorkers = 4, epochs = 3, lr = 0.5, seed = 11L).weights.flat.toSeq
    assert(run() == run())
  }

  test("averaging identical models is the identity") {
    val m = ModelWeights(Seq((2, 3)), Array(1.0, 2, 3, 4, 5, 6))
    assert(ModelWeights.average(Seq(m, m, m)).flat.toSeq == m.flat.toSeq)
  }

  test("ModelWeights layer round-trip and serializability") {
    val m = ModelWeights(Seq((2, 3), (1, 2)), Array(1.0, 2, 3, 4, 5, 6, 7, 8))
    val layers = m.layers
    assert(layers.head.map(_.toSeq).toSeq == Seq(Seq(1.0, 2, 3), Seq(4.0, 5, 6)))
    assert(layers(1).head.toSeq == Seq(7.0, 8))
    // closure-serializable (ships into tasks the way broadcasts do)
    val bytes = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bytes).writeObject(m)
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bytes.toByteArray)).readObject().asInstanceOf[ModelWeights]
    assert(back.flat.toSeq == m.flat.toSeq && back.shapes == m.shapes)
  }

  test("ensemble trainer: members differ, ensemble accuracy high") {
    val models = Trainers.trainEnsemble(linsep, "features", "label", 2,
      numModels = 4, epochs = 10, lr = 0.8)
    assert(models.size == 4)
    val data = linsep.as[(Seq[Double], Double)].collect()
    val acc = data.count { case (x, y) =>
      (if (Trainers.ensemblePredict(models, x.toArray) >= 0.5) 1.0 else 0.0) == y
    }.toDouble / data.length
    assert(acc > 0.9, s"ensemble accuracy $acc")
  }

  test("batched predictor matches expression predictor") {
    val m = Trainers.trainSingle(linsep, "features", "label", 2, epochs = 3, lr = 0.5)
    val bc = spark.sparkContext.broadcast(m)
    val viaExpr = Predictor.predictLinear(linsep, m, "features", "margin")
      .selectExpr("1.0/(1.0+exp(-margin)) AS p").as[Double].collect().sorted
    val viaBatch = Predictor.predictBatched(linsep, bc, "features", "p")
      .select("p").as[Double].collect().sorted
    viaExpr.zip(viaBatch).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
  }
}
