package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.MapPartitions
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._

import graft.ml._
import graft.vec.VectorOps

/** The composed end-to-end pipeline — the reference's defining artifact
  * (`examples/mnist.py ~L40-120 [H]`, SURVEY.md §3.3): CSV → assemble →
  * min-max scale → one-hot → reshape metadata → distributed train →
  * batched predict → argmax → accuracy, as ONE flow.
  *
  * Beyond convergence, this suite proves the §3.3 architecture headline:
  * in the reference every transformer is an `rdd.map` + `toDF()` that
  * breaks the lineage into opaque RDD scans (SURVEY §3.2); here the
  * whole flow outside the training/scoring island is a single unbroken
  * Catalyst plan rooted at the CSV relation — so column pruning,
  * pushdown and whole-stage codegen see through the entire pipeline.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  /** mnist.py-shaped fixture: 4 "pixel" features in [0,255], binary
    * label, linearly separable with a wide margin. Written as a real
    * CSV file so the pipeline starts from a genuine file source, the
    * way the reference example starts from CSV on HDFS. */
  private lazy val csvDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_pipeline").toString
    val rnd = new scala.util.Random(31)
    val rows = (0 until 400).flatMap { _ =>
      val px = Array.fill(4)(rnd.nextDouble() * 255)
      val s = px(0) + px(1) - px(2) - px(3)
      if (math.abs(s) < 40) None // margin band excluded → separable
      else Some(f"${px(0)}%.3f,${px(1)}%.3f,${px(2)}%.3f,${px(3)}%.3f,${if (s > 0) 1 else 0}")
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "digits.csv"),
      ("p0,p1,p2,p3,label" +: rows).mkString("\n").getBytes)
    dir
  }

  /** Stages 1-4 of the flow — everything before the ML island, built as
    * one DataFrame expression chain (no action, no RDD round-trip). */
  private def prepped: DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .schema("p0 DOUBLE, p1 DOUBLE, p2 DOUBLE, p3 DOUBLE, label INT")
      .csv(csvDir)
    val assembled = raw.select(
      VectorOps.assemble(col("p0"), col("p1"), col("p2"), col("p3")).as("features"),
      col("label"))
    val scaled = assembled.withColumn("features",
      VectorOps.minMaxScale(col("features"), lit(0.0), lit(255.0)))
    // one-hot the label as mnist.py does for training, then recover the
    // scalar class via argmax — exercising the round trip inside the plan
    val labeled = scaled
      .withColumn("label_vec", VectorOps.oneHot(col("label"), 2))
      .withColumn("y", VectorOps.argMax(col("label_vec")).cast("double"))
    VectorOps.withShape(labeled, "features", Seq(2, 2))
  }

  test("pipeline composes: CSV->assemble->scale->onehot->train->predict->argmax->accuracy > 0.95") {
    val data = prepped
    // ML island 1 (training): iterates outside the plan by contract
    val model = Trainers.trainDistributed(data, "features", "y", dim = 4,
      numWorkers = 4, epochs = 30, lr = 0.8, batchSize = 16)
    // ML island 2 (scoring): a single MapPartitions node inside the plan
    val bc = spark.sparkContext.broadcast(model)
    val scored = Predictor.predictBatched(data, bc, "features", "p")
      .withColumn("prob_vec", array(lit(1.0) - col("p"), col("p")))
      .withColumn("pred", VectorOps.argMax(col("prob_vec")))
    val acc = Evaluator.accuracy(
      scored.withColumn("pred", col("pred").cast("int")), "pred", "label")
    assert(acc > 0.95, s"end-to-end accuracy $acc")
  }

  /** 10-class fixture, the reference example's REAL output shape
    * (`examples/mnist.py` ends in Dense(10, softmax) [H]): ten Gaussian
    * blobs in 4-D pixel space (equal covariance → linearly separable,
    * so the multinomial-logistic head is realizable; nearest-center
    * accuracy of the generator is 0.99). Written as CSV like the binary
    * fixture so the flow starts from a genuine file source. */
  private lazy val csv10Dir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_pipeline10").toString
    val rnd = new scala.util.Random(31)
    def gauss(): Double = {
      // Box-Muller from the seeded uniform stream (deterministic fixture)
      val (u1, u2) = (rnd.nextDouble() max 1e-12, rnd.nextDouble())
      math.sqrt(-2.0 * math.log(u1)) * math.cos(2 * math.Pi * u2)
    }
    val rows = for (k <- 0 until 10; _ <- 0 until 60) yield {
      val px = Array.tabulate(4) { i =>
        val c = 2.0 * math.cos(2 * math.Pi * k / 10 + i * 1.7)
        (c + gauss() * 0.35 + 4.0) * 32.0 // shift into [0, 255] pixel range
      }
      f"${px(0)}%.3f,${px(1)}%.3f,${px(2)}%.3f,${px(3)}%.3f,$k"
    }
    // shuffle before writing — the reference does the same before
    // training (`distkeras/utils.py › shuffle [H]`): sequential
    // minibatch SGD over CLASS-SORTED rows oscillates (each batch is
    // single-class) and measurably stalls at ~0.74 where shuffled
    // order reaches ~0.99
    val shuffled = rnd.shuffle(rows)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "digits10.csv"),
      ("p0,p1,p2,p3,label" +: shuffled).mkString("\n").getBytes)
    dir
  }

  test("10-class pipeline: CSV->assemble->scale->softmax train->batched argmax->accuracy > 0.9") {
    val raw = spark.read
      .option("header", "true")
      .schema("p0 DOUBLE, p1 DOUBLE, p2 DOUBLE, p3 DOUBLE, label INT")
      .csv(csv10Dir)
    val data = raw.select(
      VectorOps.minMaxScale(
        VectorOps.assemble(col("p0"), col("p1"), col("p2"), col("p3")),
        lit(0.0), lit(255.0)).as("features"),
      col("label"), col("label").cast("double").as("y"))
    // the mnist.py head: a 10-way softmax trained through the same
    // distributed harness as every other DiffModel
    val model = Trainers.trainDistributedModel(data, "features", "y",
      SoftmaxMlpModel.init(din = 4, hiddens = Seq.empty, nClasses = 10, seed = 5L),
      numWorkers = 4, epochs = 100, lr = 0.8, batchSize = 16)
    val bc = spark.sparkContext.broadcast(model)
    val scored = Predictor.predictBatchedLabel(data, bc, "features", "pred")
    val acc = Evaluator.accuracy(
      scored.withColumn("pred", col("pred").cast("int")), "pred", "label")
    bc.destroy()
    assert(acc > 0.9, s"10-class end-to-end accuracy $acc")
  }

  /** Image-shaped fixture for the FULL flagship stack: 8×8 single-channel
    * "pixels" in [0,255], 3 spatial classes (no patch / patch in the top
    * half / patch in the bottom half — the ConvSoftmaxSpec fixture in
    * pixel range), written as a real parquet file so the flow starts
    * from a genuine file source. */
  private lazy val imgDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_pipeline_img").toString
    val rnd = new scala.util.Random(41)
    val rows = rnd.shuffle((0 until 384).map { i =>
      val img = Array.fill(64)(rnd.nextDouble() * 0.3)
      val y = i % 3
      if (y > 0) {
        val r = if (y == 1) rnd.nextInt(2) else 4 + rnd.nextInt(2)
        val c = rnd.nextInt(6)
        for (dr <- 0 until 3; dc <- 0 until 3)
          img((r + dr) * 8 + (c + dc)) = 0.8 + rnd.nextDouble() * 0.2
      }
      (img.map(_ * 255.0).toSeq, y)
    })
    rows.toDF("pixels", "label")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  test("flagship pipeline: parquet->scale->conv-softmax train->batched argmax->accuracy > 0.85") {
    // the EXACT examples/mnist.py flow at fixture scale: file source →
    // pixel scaling → Conv2D→ReLU→MaxPool→Dense(K, softmax) trained
    // through the same distributed harness → batched argmax scoring
    val data = spark.read.parquet(imgDir).select(
      VectorOps.minMaxScale(col("pixels"), lit(0.0), lit(255.0)).as("features"),
      col("label"), col("label").cast("double").as("y"))
    val model = Trainers.trainDistributedModel(data, "features", "y",
      ConvSoftmaxModel.init(8, 8, 3, 3, nFilters = 2, nClasses = 3, seed = 5L),
      numWorkers = 4, epochs = 40, lr = 0.3)
    val bc = spark.sparkContext.broadcast(model)
    val scored = Predictor.predictBatchedLabel(data, bc, "features", "pred")
    val acc = Evaluator.accuracy(
      scored.withColumn("pred", col("pred").cast("int")), "pred", "label")
    bc.destroy()
    assert(acc > 0.85, s"flagship conv-softmax end-to-end accuracy $acc")
  }

  test("everything outside the ML island is ONE unbroken Catalyst plan (SURVEY 3.3)") {
    val data = prepped
    val model = LinearModel.init(4, seed = 3L)
    val bc = spark.sparkContext.broadcast(model)
    val finalDf = Predictor.predictBatched(data, bc, "features", "p")
      .withColumn("pred", VectorOps.argMax(array(lit(1.0) - col("p"), col("p"))))
      .groupBy(col("pred")).agg(Evaluator.accuracyExpr(col("pred").cast("int"), col("label")).as("acc"))
    val analyzed = finalDf.queryExecution.analyzed

    // exactly one leaf relation: the CSV file source the flow started from
    val relations = analyzed.collect { case r: LogicalRelation => r }
    assert(relations.size == 1, s"expected 1 file relation, got ${relations.size}")

    // zero RDD scans: no transformer broke the lineage the way the
    // reference's rdd.map + toDF() stages do (SURVEY 3.2)
    val rddScans = analyzed.collect { case r: LogicalRDD => r }
    assert(rddScans.isEmpty, s"plan broken by RDD round-trips: $rddScans")

    // the scoring island is exactly one MapPartitions node
    val islands = analyzed.collect { case m: MapPartitions => m }
    assert(islands.size == 1, s"expected 1 scoring island, got ${islands.size}")
  }

  test("reshape metadata survives the whole pipeline to the scored frame") {
    val data = prepped
    val bc = spark.sparkContext.broadcast(LinearModel.init(4, seed = 3L))
    val scored = Predictor.predictBatched(data, bc, "features", "p")
    assert(VectorOps.shapeOf(scored, "features").contains(Seq(2L, 2L)))
  }
}
