package graft

import org.apache.spark.sql.functions._

import graft.vec.VectorOps

/** The binned evaluator curves behind the scalar metrics: ROC points
  * (q_roc_curve) and cumulative lift/capture (q_lift_curve) — both
  * reduced to 256 fixed score cells before any windowing, so the curve
  * costs one scan at any corpus size. */
class EvalCurvesSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side mirror of the shared scored frame. */
  private lazy val scored: Seq[(Int, Int)] = {
    val m = graft.ml.LinearModel(graft.ml.ModelWeights(Seq((1, 65)),
      (VectorOps.demoWeights :+ VectorOps.demoBias).toArray))
    Tables.embeddings(spark, sfDir)
      .select("embedding").as[Seq[Float]].collect().toSeq
      .map { v =>
        val x = v.map(_.toDouble).toArray
        val p = BigDecimal(m.predictProb(x))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val y = x.indexOf(x.max) % 2
        (math.min(math.floor(p * 256).toInt, 255), y)
      }
  }

  test("q_roc_curve: exact per-bin counts, monotone curve, (1,1) endpoint") {
    val rows = VectorOps.qRocCurve(spark, sfDir).collect()
    val byBin = scored.groupBy(_._1)
    rows.foreach { r =>
      val bin = r.getAs[Int]("bin")
      val cell = byBin(bin)
      assert(r.getAs[Long]("n_pos") == cell.count(_._2 == 1).toLong, s"bin $bin pos")
      assert(r.getAs[Long]("n_neg") == cell.count(_._2 == 0).toLong, s"bin $bin neg")
    }
    assert(rows.map(_.getAs[Int]("bin")).toSeq == byBin.keys.toSeq.sorted.reverse)
    // rows come threshold-descending: tpr and fpr must be non-decreasing
    val tpr = rows.map(_.getAs[Double]("tpr")).toSeq
    val fpr = rows.map(_.getAs[Double]("fpr")).toSeq
    assert(tpr.zip(tpr.tail).forall { case (a, b) => b >= a })
    assert(fpr.zip(fpr.tail).forall { case (a, b) => b >= a })
    // at the lowest cutoff everything is predicted positive
    assert(tpr.last == 1.0 && fpr.last == 1.0)
  }

  test("q_lift_curve: lift ends at the base rate (1.0) with full capture") {
    val rows = VectorOps.qLiftCurve(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n")).sum == scored.size.toLong)
    val capture = rows.map(_.getAs[Double]("capture")).toSeq
    assert(capture.zip(capture.tail).forall { case (a, b) => b >= a })
    assert(capture.last == 1.0)
    assert(rows.last.getAs[Double]("lift") == 1.0)
    // every lift value replays exactly from the driver-side tallies
    // (the demo scorer is near-random on this label, so no sign
    // assumption on the top bins — just exact agreement)
    val totN = scored.size.toDouble
    val totPos = scored.count(_._2 == 1).toDouble
    rows.foreach { r =>
      val bin = r.getAs[Int]("bin")
      val above = scored.filter(_._1 >= bin)
      val lift = (above.count(_._2 == 1) / above.size.toDouble) / (totPos / totN)
      assert(math.abs(r.getAs[Double]("lift") - lift) < 1e-6, s"bin $bin lift")
    }
  }

  test("the windows run over bin rows, not data (bounded-frame plan)") {
    // the only data-sized operation is the per-bin count aggregate; the
    // cumulative window partitions by a constant over <= 256 rows —
    // assert no window appears BEFORE the first aggregate in the plan
    val plan = VectorOps.qRocCurve(spark, sfDir)
      .queryExecution.optimizedPlan.toString
    val aggIdx = plan.indexOf("Aggregate")
    val winIdx = plan.indexOf("Window")
    assert(aggIdx >= 0 && winIdx >= 0)
    // optimizedPlan prints top-down: the Window node must sit ABOVE the
    // data aggregate (appear earlier), i.e. it consumes aggregate rows
    assert(winIdx < aggIdx,
      s"window must consume aggregate rows, not data:\n$plan")
  }
}
