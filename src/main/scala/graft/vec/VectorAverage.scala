package graft.vec

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Element-wise vector average as a typed Aggregator (SURVEY.md §4.2:
  * the merge operation of data-parallel training as a first-class
  * aggregate — `distkeras/trainers.py › AveragingTrainer [H]` does this
  * driver-side over collected ndarrays; here it runs distributed with
  * map-side partial aggregation and O(dim) buffer state, so averaging a
  * billion vectors shuffles one (sum, count) pair per partition).
  *
  * Usage: `df.groupBy("label").agg(VectorAverage.avgVec(col("embedding")))`.
  */
object VectorAverage extends Aggregator[Seq[Double], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Double]): (Array[Double], Long) = {
    val acc = if (b._1.isEmpty) new Array[Double](v.length) else b._1
    var i = 0
    while (i < v.length && i < acc.length) { acc(i) += v(i); i += 1 }
    (acc, b._2 + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      var i = 0
      while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
  }

  override def finish(r: (Array[Double], Long)): Seq[Double] =
    if (r._2 == 0) Seq.empty else r._1.map(_ / r._2).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    ExpressionEncoder[(Array[Double], Long)]()
  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()

  /** Column form usable in any DataFrame aggregation. */
  def avgVec(c: Column): Column = udaf(VectorAverage).apply(c)
}
