package graft.ml

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, Encoder, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructType}

import graft.vec.VectorOps

/** Model scoring as a column-appending operator — ModelPredictor
  * (`distkeras/predictors.py ~L20-80 [H]`), minus its pathologies
  * (SURVEY.md §3.2): the reference scored ROW-AT-A-TIME through a
  * Python worker and re-inferred the output schema via `rdd.toDF()`.
  *
  * Two paths here:
  *  - [[predictLinear]]: the model is a Catalyst expression (HOF dot
  *    product) — stays inside whole-stage codegen, zero serialization.
  *  - [[predictBatched]]: arbitrary Scala model via `mapPartitions` with
  *    explicit batch size and a PRE-RESOLVED output schema (StructType
  *    append — lineage and column pruning stay intact). This is the
  *    pattern for any black-box model; swap `LinearModel` for a real
  *    network scorer without touching the plumbing.
  */
object Predictor {

  /** Linear scorer as a pure expression. */
  def predictLinear(df: DataFrame, model: LinearModel,
                    featuresCol: String, outputCol: String): DataFrame =
    df.withColumn(outputCol,
      VectorOps.dotLit(col(featuresCol), model.w.toSeq) + lit(model.b))

  /** Batched black-box scorer. Batches amortize per-call model overhead
    * (for a real NN: one forward pass per `batchSize` rows). The model
    * ships once per executor via broadcast, not once per task closure. */
  def predictBatched[M <: DiffModel](df: DataFrame, modelBc: Broadcast[M],
                     featuresCol: String, outputCol: String,
                     batchSize: Int = 1024): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      org.apache.spark.sql.types.StructField(outputCol, DoubleType, nullable = false))
    val featIdx = df.schema.fieldIndex(featuresCol)
    val enc: Encoder[Row] = RowEncoder.encoderFor(outSchema)
    val mapped = df.mapPartitions { it =>
      val model = modelBc.value
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary = where a real implementation hands the whole
        // feature block to the native scorer in one call
        batch.map { r =>
          val x = r.getSeq[Any](featIdx).map {
            case f: Float => f.toDouble
            case d: Double => d
            case o => o.toString.toDouble
          }.toArray
          Row.fromSeq(r.toSeq :+ model.predictProb(x))
        }
      }
    }(enc)
    // the row encoder drops column metadata (e.g. ReshapeTransformer's
    // shape annotation) — re-attach it; a plan-level Project only, the
    // MapPartitions island stays a single node
    df.schema.fields.filter(_.metadata != org.apache.spark.sql.types.Metadata.empty)
      .foldLeft(mapped) { (d, f) =>
        d.withColumn(f.name, col(f.name).as(f.name, f.metadata))
      }
  }
}

/** AccuracyEvaluator (`distkeras/evaluators.py ~L15-60 [H]`): fraction of
  * rows where prediction equals label — a single Catalyst aggregate, not
  * the reference's `rdd.filter().count()` pair (which scanned twice). */
object Evaluator {
  def accuracy(df: DataFrame, predictionCol: String, labelCol: String): Double =
    df.agg(avg(when(col(predictionCol) === col(labelCol), 1.0).otherwise(0.0)))
      .head().getDouble(0)

  def accuracyExpr(predictionCol: Column, labelCol: Column): Column =
    avg(when(predictionCol === labelCol, 1.0).otherwise(0.0))
}
