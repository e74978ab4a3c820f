package graft.vec

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Vector/ML data-prep operators — the dist-keras transformer surface
  * (`distkeras/transformers.py [H]`, SURVEY.md §2.A) re-expressed as pure
  * Catalyst column expressions over `ArrayType` columns.
  *
  * The reference implements each of these as an `rdd.map` over Python
  * `Row`s (exiting Tungsten per operator, re-inferring schema on the way
  * back — SURVEY.md §3.2). Here every op is a higher-order-function
  * expression, so a pipeline of them stays inside one whole-stage-codegen
  * region and never materializes intermediate rows.
  */
object VectorOps {

  /** MinMaxTransformer (`distkeras/transformers.py ~L40-80 [H]`):
    * rescale from observed [oMin,oMax] to [nMin,nMax], element-wise. */
  def minMaxScale(v: Column, oMin: Column, oMax: Column,
                  nMin: Double = 0.0, nMax: Double = 1.0): Column =
    transform(v, x =>
      lit(nMin) + (x.cast("double") - oMin) * (nMax - nMin) / (oMax - oMin))

  /** Scalar variant used by q_minmax_scale (range from a 1-row stats DF,
    * broadcast-joined — no `collect()`, scales to any table size). */
  def minMaxScaleScalar(x: Column, oMin: Column, oMax: Column): Column =
    (x.cast("double") - oMin) / (oMax - oMin)

  /** OneHotTransformer (`transformers.py ~L120-160 [H]`): class index →
    * indicator vector of dimension n. Pure Catalyst: sequence+transform. */
  def oneHot(label: Column, n: Int): Column =
    transform(sequence(lit(0), lit(n - 1)),
      i => when(i === label, 1.0).otherwise(0.0))

  /** LabelIndexTransformer (`transformers.py ~L170-220 [H]`): probability
    * vector → predicted class index (0-based argmax; first max wins on
    * ties, matching both engines' 1-based position semantics). */
  def argMax(v: Column): Column =
    (array_position(v, array_max(v)) - 1).cast("long")

  /** argmax with the reference's activation_threshold behavior [M]:
    * if max activation < threshold, emit defaultIdx. */
  def argMaxThreshold(v: Column, threshold: Double, defaultIdx: Long): Column =
    when(array_max(v).cast("double") < threshold, lit(defaultIdx))
      .otherwise(argMax(v))

  /** VectorAssembler usage (`examples/mnist.py ~L60-90 [H]`): N numeric
    * columns → one dense array column (Catalyst CreateArray). */
  def assemble(cols: Column*): Column = array(cols: _*)

  /** Dense representation of a sparse (indices, values, size) struct —
    * DenseTransformer (`transformers.py ~L90-115 [H]`): scatter values
    * into a zero vector. Backed by the native codegen expression
    * [[graft.plans.ScatterToDense]] — one fused O(sz + nnz) loop; the
    * best pure-HOF form ([[sparseToDenseHof]], kept as the semantic
    * spec) must probe `array_position(indices, i)` per dense slot,
    * O(sz × nnz) comparisons per row. Equivalence is property-tested
    * incl. duplicate and out-of-range indices. */
  def sparseToDense(indices: Column, values: Column, sz: Column): Column =
    graft.plans.ScatterToDense(indices, values, sz.cast("int"))

  /** HOF reference formulation of [[sparseToDense]] — the semantic spec
    * (array_position = first occurrence wins; out-of-range ignored).
    * A map_from_arrays inside the lambda would be even worse than the
    * probe: Catalyst re-evaluates lambda bodies per element, so the map
    * build would be reconstructed sz times per row. */
  def sparseToDenseHof(indices: Column, values: Column, sz: Column): Column =
    transform(sequence(lit(0), sz - 1), i => {
      val pos = array_position(indices, i)
      when(pos > 0, element_at(values, pos.cast("int"))).otherwise(lit(0.0))
    })

  /** Sequential dot product of a vector column against literal weights —
    * the oracle-able linear special case of ModelPredictor
    * (`distkeras/predictors.py ~L20-80 [H]`). Backed by the fused
    * codegen expression [[graft.plans.DotProduct]]; the fold is
    * left-to-right in array order, bit-identical to the HOF chain
    * `aggregate(zip_with(...))` and to DuckDB's `list_aggregate` fold
    * (SURVEY.md §2 rule 5), so oracled queries are unaffected. */
  def dotLit(v: Column, w: Seq[Double]): Column =
    graft.plans.DotProduct(v, typedLit(w))

  /** Dot product of two vector columns (used by similarity search). */
  def dot(a: Column, b: Column): Column =
    graft.plans.DotProduct(a, b)

  /** Reference HOF formulation of [[dot]] — kept as the semantic spec
    * the codegen expression is tested against (VectorOpsSpec). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** ReshapeTransformer (`distkeras/transformers.py ~L230-260 [H]`):
    * tensors stay as flat arrays with the shape carried in column
    * metadata (representation-only — the physical layout never changes,
    * so reshape is free at plan time; materialize nested form only at
    * the ML boundary via [[reshape2d]]). */
  def withShape(df: org.apache.spark.sql.DataFrame, colName: String,
                shape: Seq[Int]): org.apache.spark.sql.DataFrame = {
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLongArray("shape", shape.map(_.toLong).toArray).build()
    df.withColumn(colName, col(colName).as(colName, meta))
  }

  def shapeOf(df: org.apache.spark.sql.DataFrame, colName: String): Option[Seq[Long]] = {
    val m = df.schema(colName).metadata
    if (m.contains("shape")) Some(m.getLongArray("shape").toSeq) else None
  }

  /** Physical 2-D reshape (row-major) for consumers that need nested
    * arrays — pure Catalyst (sequence + slice), no UDF. */
  def reshape2d(v: Column, rows: Int, cols: Int): Column =
    transform(sequence(lit(0), lit(rows - 1)),
      r => slice(v, r * cols + 1, lit(cols)))

  /** Deterministic demo weights for q_linear_predict — shared between the
    * Spark query and the generated DuckDB oracle SQL. */
  val demoWeights: Seq[Double] = (1 to 64).map(i => ((i * 37) % 19 - 9) / 10.0)
  val demoBias: Double = 0.05

  /** Deterministic MLP demo weights (din=64, hidden=4) — formula-derived
    * (no RNG) so the Spark query and the DuckDB oracle interpolate the
    * SAME literals; layout matches [[graft.ml.MlpModel]]
    * ([W1 row-major, b1, w2, b2], MlpDemoSpec pins the equivalence). */
  val mlpHidden: Int = 4
  val mlpW1: Seq[Seq[Double]] = (0 until mlpHidden).map(j =>
    (0 until 64).map(i => ((i * 37 + j * 101) % 19 - 9) / 10.0))
  val mlpB1: Seq[Double] = (0 until mlpHidden).map(j => ((j * 53) % 7 - 3) / 10.0)
  val mlpW2: Seq[Double] = (0 until mlpHidden).map(j => ((j * 29) % 11 - 5) / 10.0)
  val mlpB2: Double = 0.05

  /** Deterministic TWO-hidden-layer MLP demo weights (din=64, 4→3→1) —
    * formula-derived like [[mlpW1]]; layout matches
    * [[graft.ml.DeepMlpModel]] ([W1,b1,W2,b2,w3,b3] per-layer row-major),
    * DeepMlpSpec pins the expression form to the Scala backprop model. */
  val mlp2Hidden1: Int = 4
  val mlp2Hidden2: Int = 3
  val mlp2W1: Seq[Seq[Double]] = (0 until mlp2Hidden1).map(j =>
    (0 until 64).map(i => ((i * 41 + j * 97) % 17 - 8) / 10.0))
  val mlp2B1: Seq[Double] = (0 until mlp2Hidden1).map(j => ((j * 31) % 5 - 2) / 10.0)
  val mlp2W2: Seq[Seq[Double]] = (0 until mlp2Hidden2).map(k =>
    (0 until mlp2Hidden1).map(j => ((j * 13 + k * 57) % 9 - 4) / 10.0))
  val mlp2B2: Seq[Double] = (0 until mlp2Hidden2).map(k => ((k * 43) % 7 - 3) / 10.0)
  val mlp2W3: Seq[Double] = (0 until mlp2Hidden2).map(k => ((k * 23) % 11 - 5) / 10.0)
  val mlp2B3: Double = -0.1

  /** Deterministic 3-class SOFTMAX demo weights (multinomial logistic
    * head over the 64-dim embedding) — formula-derived; layout matches
    * [[graft.ml.SoftmaxMlpModel]] with no hidden layers ([W row-major,
    * b]); SoftmaxMlpSpec pins the expression form to the Scala model. */
  val smClasses: Int = 3
  val smW: Seq[Seq[Double]] = (0 until smClasses).map(k =>
    (0 until 64).map(i => ((i * 43 + k * 89) % 21 - 10) / 10.0))
  val smB: Seq[Double] = (0 until smClasses).map(k => ((k * 37) % 9 - 4) / 10.0)

  /** The [[smW]]/[[smB]] literals as one [[graft.ml.SoftmaxMlpModel]]. */
  def smModel: graft.ml.SoftmaxMlpModel = {
    val flat = (smW.flatten ++ smB).toArray
    graft.ml.SoftmaxMlpModel(
      graft.ml.ModelWeights(
        graft.ml.SoftmaxMlpModel.shapes(64, Seq.empty, smClasses), flat),
      64, Seq.empty, smClasses)
  }

  /** The [[mlp2*]] literals as one [[graft.ml.DeepMlpModel]] flat vector
    * (single source of truth for the spec equivalence). */
  def mlp2Model: graft.ml.DeepMlpModel = {
    val flat = (mlp2W1.flatten ++ mlp2B1 ++ mlp2W2.flatten ++ mlp2B2 ++
      mlp2W3 ++ Seq(mlp2B3)).toArray
    graft.ml.DeepMlpModel(
      graft.ml.ModelWeights(
        graft.ml.DeepMlpModel.shapes(64, Seq(mlp2Hidden1, mlp2Hidden2)), flat),
      64, Seq(mlp2Hidden1, mlp2Hidden2))
  }

  /** Deterministic CONVNET demo weights (the flagship `examples/mnist.py`
    * Conv2D→ReLU→MaxPool→Dense architecture [H], scaled to the 8×8
    * row-major view of the 64-dim embedding): 2 valid 3×3 filters with
    * bias + ReLU → 6×6 maps, 2×2/stride-2 max-pool → 3×3, dense sigmoid
    * over the 18 pooled features. Formula-derived literals; layout
    * matches [[graft.ml.ConvNetModel]] (ConvNetSpec pins the Catalyst
    * expression form to the Scala forward pass). */
  val convFilters: Int = 2
  val convKernel: Seq[Seq[Double]] = (0 until convFilters).map(f =>
    (0 until 9).map(i => ((i * 29 + f * 53) % 13 - 6) / 10.0))
  val convBias: Seq[Double] = (0 until convFilters).map(f => ((f * 37) % 5 - 2) / 10.0)
  val convPooled: Int = convFilters * 3 * 3
  val convDenseW: Seq[Double] = (0 until convPooled).map(k => ((k * 19) % 15 - 7) / 10.0)
  val convDenseB: Double = 0.05

  /** The conv literals as one [[graft.ml.ConvNetModel]] (8×8 input). */
  def convDemoModel: graft.ml.ConvNetModel = {
    val flat = (convKernel.flatten ++ convBias ++ convDenseW ++
      Seq(convDenseB)).toArray
    graft.ml.ConvNetModel(
      graft.ml.ModelWeights(graft.ml.ConvNetModel.shapes(8, 8, 3, 3, convFilters), flat),
      8, 8, 3, 3, convFilters)
  }

  /** q_conv_predict — the CONVNET forward pass as pure Catalyst
    * expressions, completing the architecture ladder (linear → MLP →
    * deep MLP → softmax → conv) of expression-only scorers: stage 1
    * computes the 72 ReLU'd valid-conv cells (each an explicit
    * left-associated 9-term weighted sum over the 8×8 row-major view of
    * the embedding, `greatest(·, 0.0)` as ReLU), stage 2 max-pools 2×2
    * blocks via `greatest` (max is exact in doubles, so pooling carries
    * no float-fold risk), stage 3 is the dense sigmoid. Three chained
    * projections — zero shuffles before the display sort, whole-stage
    * codegen end to end; the staged form keeps each generated function
    * small instead of inlining a ~2k-node tree per output column. */
  def qConvPredict(spark: SparkSession, dir: String): DataFrame = {
    val p = convPooledFrame(spark, dir)
    val logit = (0 until convPooled).map(k => col(s"p$k") * lit(convDenseW(k)))
      .reduce(_ + _) + lit(convDenseB)
    p.select(col("vec_id"),
        round(lit(1.0) / (lit(1.0) + exp(-logit)), 6).as("conv_prob"))
      .orderBy("vec_id")
  }

  /** The shared conv block of the conv-family scorers as two chained
    * projections: (vec_id, p0..p17) where p_k is the 2×2 max-pool of
    * the ReLU'd valid-conv cells (stage 1: 72 explicit left-associated
    * 9-term weighted sums over the 8×8 row-major embedding view; stage
    * 2: `greatest`-of-4 pooling — max is exact in doubles, so pooling
    * carries no float-fold risk). [[qConvPredict]] hangs the sigmoid
    * head off this; [[qConvSoftmaxPredict]] the K-way softmax head. */
  private def convPooledFrame(spark: SparkSession, dir: String): DataFrame = {
    val x = col("embedding")
    def cell(f: Int, r: Int, c: Int): Column = {
      val terms = for { i <- 0 until 3; j <- 0 until 3 } yield
        x.getItem((r + i) * 8 + (c + j)).cast("double") * lit(convKernel(f)(i * 3 + j))
      greatest(terms.reduce(_ + _) + lit(convBias(f)), lit(0.0))
    }
    val zCols = for { f <- 0 until convFilters; r <- 0 until 6; c <- 0 until 6 }
      yield cell(f, r, c).as(s"z_${f}_${r}_$c")
    val z = Tables.embeddings(spark, dir).select(col("vec_id") +: zCols: _*)
    val pCols = for { f <- 0 until convFilters; pr <- 0 until 3; pc <- 0 until 3 }
      yield greatest(
        col(s"z_${f}_${2 * pr}_${2 * pc}"), col(s"z_${f}_${2 * pr}_${2 * pc + 1}"),
        col(s"z_${f}_${2 * pr + 1}_${2 * pc}"), col(s"z_${f}_${2 * pr + 1}_${2 * pc + 1}"))
        .as(s"p${f * 9 + pr * 3 + pc}")
    z.select(col("vec_id") +: pCols: _*)
  }

  /** Deterministic 3-class CONV-SOFTMAX demo weights — the dense head
    * of the exact `examples/mnist.py` architecture (Conv2D → ReLU →
    * MaxPool → Dense(K, softmax) [H]) over the [[convKernel]] conv
    * block: per-class rows over the 18 pooled features, formula-derived;
    * layout matches [[graft.ml.ConvSoftmaxModel]] (class-major dense
    * rows, then the K biases); ConvSoftmaxSpec pins the expression form
    * to the Scala model. */
  val csmClasses: Int = 3
  val csmDenseW: Seq[Seq[Double]] = (0 until csmClasses).map(k =>
    (0 until convPooled).map(j => ((j * 23 + k * 71) % 17 - 8) / 10.0))
  val csmDenseB: Seq[Double] = (0 until csmClasses).map(k => ((k * 29) % 7 - 3) / 10.0)

  /** The conv + [[csm*]] literals as one [[graft.ml.ConvSoftmaxModel]]. */
  def convSmModel: graft.ml.ConvSoftmaxModel = {
    val flat = (convKernel.flatten ++ convBias ++ csmDenseW.flatten ++
      csmDenseB).toArray
    graft.ml.ConvSoftmaxModel(
      graft.ml.ModelWeights(
        graft.ml.ConvSoftmaxModel.shapes(8, 8, 3, 3, convFilters, csmClasses), flat),
      8, 8, 3, 3, convFilters, csmClasses)
  }

  /** q_conv_softmax_predict — the FULL flagship architecture
    * (`examples/mnist.py`: Conv2D → ReLU → MaxPool → Dense(K, softmax)
    * [H]) as pure Catalyst expressions, joining the conv block of
    * [[qConvPredict]] to the softmax head device of
    * [[qSoftmaxPredict]]: per-class logits as left-associated weighted
    * sums over the pooled features, max-subtracted exponentials,
    * normalized probabilities, argmax class with ties to the smallest
    * index. Three chained projections — zero shuffles before the
    * display sort, whole-stage codegen end to end. */
  def qConvSoftmaxPredict(spark: SparkSession, dir: String): DataFrame = {
    val p = convPooledFrame(spark, dir)
    val z = (0 until csmClasses).map(k =>
      (0 until convPooled).map(j => col(s"p$j") * lit(csmDenseW(k)(j)))
        .reduce(_ + _) + lit(csmDenseB(k)))
    val mx = greatest(z: _*)
    val e = z.map(zk => exp(zk - mx))
    val tot = e.reduce(_ + _)
    val cls = smArgmax(z)
    p.select(col("vec_id") +: cls.as("pred_class") +:
        (0 until csmClasses).map(k => round(e(k) / tot, 6).as(s"cp$k")): _*)
      .orderBy("vec_id")
  }

  /** q_sgd_step — ONE full-batch gradient-descent step of the logistic
    * model as a pure relational aggregate: the distributed heart of the
    * reference's training loop (`distkeras/trainers.py` workers compute
    * gradients over their partition and the driver averages them [H])
    * with Spark's map-side partial aggregation playing the worker role
    * and the 65-key final aggregate the parameter average — no
    * mapPartitions, no driver loop, ORACLE-CHECKABLE in SQL.
    *
    * Per row: p = σ(w·x + b) rounded to the 1e-6 grid (both engines
    * agree on every per-row decision — the q_eval_metrics device);
    * err = p − y with y = label mod 2. Per coordinate i (the bias rides
    * along as a constant-1 65th feature): the mean-gradient sum
    * Σ err·x_i runs with each term rounded to 9 dp and summed as
    * DECIMAL(28,9) — integer-scaled, commutative, ADDITION-ORDER-PROOF,
    * so any partitioning of a 100 TB corpus produces the bit-identical
    * update (a raw double sum would drift per plan). Output: one row
    * per coordinate with the old and stepped weight (lr = 0.1).
    *
    * Scale shape: one scan → per-row projection → posexplode to
    * (coordinate, term) → 65-key hash aggregate (partial agg does the
    * per-partition work; the shuffle carries 65 rows per partition). */
  def qSgdStep(spark: SparkSession, dir: String): DataFrame = {
    val lr = 0.1
    val margin = dotLit(col("embedding"), demoWeights) + lit(demoBias)
    val p = round(lit(1.0) / (lit(1.0) + exp(-margin)), 6)
    val e = Tables.embeddings(spark, dir).select(
      concat(transform(col("embedding"), v => v.cast("double")),
        array(lit(1.0))).as("xs"),
      (p - (col("label") % 2)).as("err"))
    val wOld = (demoWeights :+ demoBias).map(lit)
    val g = e.select(col("err"), posexplode(col("xs")).as(Seq("idx", "x")))
      .groupBy(col("idx"))
      .agg(sum(round(col("err") * col("x"), 9).cast("decimal(28,9)")).as("gsum"),
        count(lit(1)).as("n"))
    g.select(col("idx"),
        round(element_at(array(wOld: _*), col("idx") + 1), 6).as("w_old"),
        round(element_at(array(wOld: _*), col("idx") + 1) -
          lit(lr) * (col("gsum").cast("double") / col("n")), 6).as("w_new"))
      .orderBy("idx")
  }

  /** q_softmax_sgd_step — the [[qSgdStep]] device extended to the
    * MULTI-CLASS head the flagship example actually trains
    * (`examples/mnist.py`'s Dense(10, softmax) layer under
    * cross-entropy [H]): the full-batch gradient of the multinomial
    * logistic model as ONE (class × coordinate) relational aggregate.
    * Per row: stable softmax probabilities rounded to the 1e-6 grid
    * (engines agree on every per-row delta), δ_k = p_k − [y = k]; per
    * cell (k, i): Σ δ_k·x_i with terms rounded 9 dp and summed
    * DECIMAL(28,9) — addition-order-proof, bit-identical update under
    * any partitioning. The bias rides as the constant-1 65th
    * coordinate; output is the K·65-row stepped weight table.
    *
    * Scale shape: one scan → per-row delta vector → two chained
    * posexplodes (class, then coordinate) → K·65-key hash aggregate
    * with map-side partial agg doing the per-partition worker pass. */
  def qSoftmaxSgdStep(spark: SparkSession, dir: String): DataFrame = {
    val lr = 0.1
    val z = smLogits
    val mx = greatest(z: _*)
    val e = z.map(zk => exp(zk - mx))
    val tot = e.reduce(_ + _)
    val y = col("label") % smClasses
    val deltas = (0 until smClasses).map(k =>
      round(e(k) / tot, 6) - when(y === k, 1.0).otherwise(0.0))
    val rows = Tables.embeddings(spark, dir).select(
      concat(transform(col("embedding"), v => v.cast("double")),
        array(lit(1.0))).as("xs"),
      array(deltas: _*).as("ds"))
    val g = rows
      .select(col("xs"), posexplode(col("ds")).as(Seq("k", "d")))
      .select(col("k"), col("d"), posexplode(col("xs")).as(Seq("idx", "x")))
      .groupBy(col("k"), col("idx"))
      .agg(sum(round(col("d") * col("x"), 9).cast("decimal(28,9)")).as("gsum"),
        count(lit(1)).as("n"))
    val wall = array((0 until smClasses).map(k =>
      array((smW(k) :+ smB(k)).map(lit): _*)): _*)
    val wOld = element_at(element_at(wall, col("k") + 1), (col("idx") + 1).cast("int"))
    g.select(col("k"), col("idx"),
        round(wOld, 6).as("w_old"),
        round(wOld - lit(lr) * (col("gsum").cast("double") / col("n")), 6).as("w_new"))
      .orderBy("k", "idx")
  }

  /** StringIndexer usage (`examples/mnist.py`/`workflow.ipynb` index
    * string labels before one-hot [M]): category → dense index by
    * frequency (most frequent = 0), ties broken by value — MLlib's
    * default `frequencyDesc` order made deterministic. The index table
    * is one aggregate over the DISTINCT categories (tiny by definition)
    * and broadcasts back onto the data; the window runs over category
    * rows, never data rows. */
  def stringIndexTable(df: DataFrame, catCol: String,
                       idxCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0)) // intent: the input is the category set, not data
      .orderBy(col("__n").desc, col(catCol))
    df.groupBy(col(catCol)).agg(count(lit(1)).as("__n"))
      .withColumn(idxCol, (row_number().over(w) - 1).cast("long"))
      .drop("__n")
  }

  /** Bucketizer usage (feature discretization in the example pipelines
    * [M]): value → bucket index for ascending split boundaries
    * [s0, s1), [s1, s2), …, [s_{n-1}, s_n] — the LAST interval is closed
    * at the upper boundary, exactly like MLlib's Bucketizer, so a value
    * equal to the final split lands in the last bucket rather than
    * falling out. Values outside [s0, s_n] get -1 (MLlib throws
    * instead — a 100 TB job must not die on one outlier). */
  def bucketize(x: Column, splits: Seq[Double]): Column = {
    require(splits.sizeIs >= 2 && splits == splits.sorted, s"bad splits: $splits")
    val xs = x.cast("double")
    val last = splits.size - 2
    splits.sliding(2).zipWithIndex.foldLeft(lit(-1L)) {
      case (acc, (Seq(lo, hi), i)) =>
        val hiCond = if (i == last) xs <= hi else xs < hi
        when(xs >= lo && hiCond, lit(i.toLong)).otherwise(acc)
    }
  }

  // ------------------------------------------------------------- queries

  /** q_minmax_scale: scalar min-max over l_quantity. Table stats come
    * from a 1-row aggregate cross-joined (broadcast) — two scans but no
    * global window, so it parallelizes at any scale. */
  def qMinMaxScale(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val stats = li.agg(
      min(col("l_quantity")).as("q_min"), max(col("l_quantity")).as("q_max"))
    li.crossJoin(broadcast(stats))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(minMaxScaleScalar(col("l_quantity"), col("q_min"), col("q_max")), 6)
          .as("scaled"))
      // non-unique lineitem key → include the value for a total order
      .orderBy("l_orderkey", "l_linenumber", "scaled")
  }

  /** Driver-gated shape: exploded long form (vec_id, label, idx, ind) —
    * raw array columns crash the driver's pandas sort (round-1 verdict),
    * and the long form needs no cross-engine float-string formatting.
    * The array-typed [[oneHot]] stays as the library function. */
  def qOneHot(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
        posexplode(oneHot(col("label"), 10)).as(Seq("pos", "ind")))
      .select(col("vec_id"), col("label"), (col("pos") + 1).as("idx"), col("ind"))
      .orderBy("vec_id", "idx")

  def qArgMax(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), argMax(col("embedding")).as("pred"))
      .orderBy("vec_id")

  /** Driver-gated shape: exploded long form (see [[qOneHot]] note).
    * The array-typed [[assemble]] stays as the library function. */
  def qVectorAssemble(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        posexplode(assemble(col("l_quantity"), col("l_discount"), col("l_tax")))
          .as(Seq("pos", "fval")))
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("pos") + 1).as("idx"), col("fval"))
      // non-unique lineitem key → include the value for a total order
      .orderBy("l_orderkey", "l_linenumber", "idx", "fval")

  def qLinearPredict(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(
        col("vec_id"),
        round(dotLit(col("embedding"), demoWeights) + demoBias, 6).as("pred"))
      .orderBy("vec_id")

  /** Driver-side int8 quantization of the demo weight vector: scale =
    * 127/max|w|, codes = ⌊w·s + 0.5⌋ — the weight-side twin of
    * [[graft.sim.Similarity.quantized]]'s per-vector device. */
  lazy val int8WeightScale: Double = 127.0 / demoWeights.map(math.abs).max
  lazy val int8WeightCodes: Seq[Long] =
    demoWeights.map(w => math.floor(w * int8WeightScale + 0.5).toLong)

  /** q_linear_predict_int8 — QUANTIZED inference, the serving form a
    * 100 TB scorer actually runs (4× less scan bandwidth, integer
    * multiply-adds): both sides symmetric-int8 (weights quantized once
    * driver-side to literal codes; each embedding per-row by the
    * [[graft.sim.Similarity.quantized]] device), the code dot product
    * is an EXACT 64-term integer sum (≤ 64·127² ≈ 1.03e6 — far inside
    * BIGINT, no float fold at all), and only the final rescale
    * margin ≈ dot_q/(s_x·s_w) + b touches doubles. Emits the exact
    * integer dot beside the approximate probability so the driver
    * hashes an exact column too. One projection over the quantized
    * frame — no shuffle before the display sort, codegen end to end. */
  def qLinearPredictInt8(spark: SparkSession, dir: String): DataFrame = {
    val qd = graft.sim.Similarity.quantized(Tables.embeddings(spark, dir))
    val intDot = (0 until 64)
      .map(i => col("q").getItem(i).cast("long") * lit(int8WeightCodes(i)))
      .reduce(_ + _)
    val margin = when(col("scale") > 0,
        col("dot_q").cast("double") / (col("scale") * lit(int8WeightScale)))
      .otherwise(lit(0.0)) + lit(demoBias)
    qd.select(col("vec_id"), col("scale"), intDot.as("dot_q"))
      .select(col("vec_id"), col("dot_q"),
        round(lit(1.0) / (lit(1.0) + exp(-margin)), 6).as("prob_int8"))
      .orderBy("vec_id")
  }

  /** q_mlp_predict — the general ModelPredictor case
    * (`distkeras/predictors.py ~L20-80 [H]`) for a NONLINEAR net,
    * expressed entirely as Catalyst expressions: hidden unit j is
    * tanh(dot(W1_j, x) + b1_j) (each dot is the fused codegen
    * [[graft.plans.DotProduct]]), the output is a sigmoid over the
    * explicit left-associated weighted sum — so even a neural scorer
    * stays inside whole-stage codegen, no UDF, no mapPartitions. The
    * same weights drive [[graft.ml.MlpModel]] in MlpDemoSpec, pinning
    * the expression form to the Scala backprop model. */
  def qMlpPredict(spark: SparkSession, dir: String): DataFrame = {
    // tanh written via exp — the oracle engine has no tanh builtin, and
    // using the SAME formula on both sides keeps the fold comparable
    def tanhViaExp(x: Column): Column =
      lit(1.0) - lit(2.0) / (exp(lit(2.0) * x) + lit(1.0))
    val h = (0 until mlpHidden).map { j =>
      tanhViaExp(dotLit(col("embedding"), mlpW1(j)) + lit(mlpB1(j)))
    }
    val z = h.zip(mlpW2).map { case (hj, w) => hj * lit(w) }
      .reduce(_ + _) + lit(mlpB2)
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        round(lit(1.0) / (lit(1.0) + exp(-z)), 6).as("mlp_prob"))
      .orderBy("vec_id")
  }

  /** q_mlp2_predict — the DEEP (2-hidden-layer) forward pass as pure
    * Catalyst expressions: layer 1 is 4 tanh units over the fused
    * codegen dot product, layer 2 is 3 tanh units over the layer-1
    * columns (each weighted sum left-associated), output a sigmoid —
    * the [[qMlpPredict]] device extended one layer down, proving the
    * expression-only scoring path generalizes to arbitrary depth
    * (round-13 verdict ask #5). Same scale shape: one projection, zero
    * shuffles before the display sort, whole-stage codegen end to end.
    * DeepMlpSpec pins these expressions to [[graft.ml.DeepMlpModel]]'s
    * Scala forward pass on the same literals. */
  def qMlp2Predict(spark: SparkSession, dir: String): DataFrame = {
    def tanhViaExp(x: Column): Column =
      lit(1.0) - lit(2.0) / (exp(lit(2.0) * x) + lit(1.0))
    val h1 = (0 until mlp2Hidden1).map { j =>
      tanhViaExp(dotLit(col("embedding"), mlp2W1(j)) + lit(mlp2B1(j)))
    }
    val h2 = (0 until mlp2Hidden2).map { k =>
      tanhViaExp(h1.zip(mlp2W2(k)).map { case (h, w) => h * lit(w) }
        .reduce(_ + _) + lit(mlp2B2(k)))
    }
    val z = h2.zip(mlp2W3).map { case (h, w) => h * lit(w) }
      .reduce(_ + _) + lit(mlp2B3)
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        round(lit(1.0) / (lit(1.0) + exp(-z)), 6).as("mlp2_prob"))
      .orderBy("vec_id")
  }

  /** q_softmax_predict — the K-WAY SOFTMAX head as pure Catalyst
    * expressions (the output layer of the reference's flagship
    * `examples/mnist.py` Dense(softmax) model): per-class logits from
    * the fused codegen dot product, max-subtracted exponentials (the
    * overflow-stable form, mirrored literally in SQL), probabilities
    * normalized by the left-associated sum, argmax class with ties to
    * the smallest index — the exact `SoftmaxMlpModel.predictLabel`
    * semantics, spec-pinned. One projection, zero shuffles before the
    * display sort, whole-stage codegen end to end. */
  /** Per-class softmax-demo logits over the embedding column. */
  private def smLogits: Seq[Column] =
    (0 until smClasses).map(k => dotLit(col("embedding"), smW(k)) + lit(smB(k)))

  /** Argmax class with ties to the smallest index, generated for ANY
    * class count (a hardcoded K-way CASE was a silent-wrongness trap if
    * the class count ever changed; the SQL twin generates identically).
    * Delegates to the single shared implementation. */
  private def smArgmax(z: Seq[Column]): Column =
    graft.ml.ModelExpressions.argmaxC(z)

  def qSoftmaxPredict(spark: SparkSession, dir: String): DataFrame = {
    val z = smLogits
    val mx = greatest(z: _*)
    val e = z.map(zk => exp(zk - mx))
    val tot = e.reduce(_ + _)
    val cls = smArgmax(z)
    Tables.embeddings(spark, dir)
      .select(col("vec_id") +: cls.as("pred_class") +:
        (0 until smClasses).map(k =>
          round(e(k) / tot, 6).as(s"p$k")): _*)
      .orderBy("vec_id")
  }

  /** q_string_index — StringIndexer over customer market segments:
    * frequency-ordered dense indices broadcast back onto the rows. */
  def qStringIndex(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val idx = stringIndexTable(cust, "c_mktsegment", "seg_idx")
    cust.join(broadcast(idx), Seq("c_mktsegment"))
      .select(col("c_custkey"), col("c_mktsegment"), col("seg_idx"))
      .orderBy("c_custkey")
  }

  /** q_bucketize — Bucketizer over order totals with literal splits;
    * -1 = outside all buckets (here: nothing, splits cover the range). */
  def qBucketize(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        bucketize(col("o_totalprice"),
          Seq(0.0, 100000.0, 200000.0, 300000.0, 1e9)).as("price_bucket"))
      .orderBy("o_orderkey")

  /** q_eval_metrics — the full binary-evaluator surface
    * (precision/recall/F1 + binned AUC, [[graft.ml.Evaluator
    * .binaryMetrics]]) over a deterministic scoring: prob =
    * sigmoid(linear demo model), label = argmax(embedding) mod 2. */
  def qEvalMetrics(spark: SparkSession, dir: String): DataFrame = {
    val margin = dotLit(col("embedding"), demoWeights) + lit(demoBias)
    val scored = Tables.embeddings(spark, dir).select(
      (lit(1.0) / (lit(1.0) + exp(-margin))).as("prob"),
      (argMax(col("embedding")) % 2).cast("int").as("y"))
    graft.ml.Evaluator.binaryMetrics(scored, "prob", "y")
  }

  /** The shared scored frame of the binary-evaluator family: prob =
    * sigmoid(linear demo margin) ROUNDED to the 1e-6 grid (both engines
    * agree on every binning decision — the q_eval_metrics device),
    * y = argmax(embedding) mod 2. */
  private def binaryScored(spark: SparkSession, dir: String): DataFrame = {
    val margin = dotLit(col("embedding"), demoWeights) + lit(demoBias)
    Tables.embeddings(spark, dir).select(
      round(lit(1.0) / (lit(1.0) + exp(-margin)), 6).as("p"),
      (argMax(col("embedding")) % 2).cast("int").as("y"))
  }

  /** q_roc_curve — the full binned ROC curve behind q_eval_metrics'
    * scalar AUC (the evaluator artifact a model-selection workflow
    * plots): scores bin to 256 fixed cells, per-bin (pos, neg) counts
    * are the ONLY data-sized aggregate, then descending-threshold
    * cumulative tpr/fpr come from a window over the ≤256 bin rows —
    * never over data, so the curve costs one scan at any corpus size.
    * Counts are exact longs; tpr/fpr are single divisions of exact
    * longs, deterministic at any partitioning. */
  def qRocCurve(spark: SparkSession, dir: String): DataFrame = {
    val bins = binaryScored(spark, dir)
      .select(least(floor(col("p") * 256), lit(255)).cast("int").as("bin"), col("y"))
      .groupBy("bin")
      .agg(sum(col("y")).cast("long").as("n_pos"),
        sum(lit(1) - col("y")).cast("long").as("n_neg"))
    // the window runs over <= 256 aggregate rows (intent: bounded frame)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0)).orderBy(col("bin").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tot = bins.agg(sum(col("n_pos")).as("tot_pos"), sum(col("n_neg")).as("tot_neg"))
    bins
      .select(col("bin"), col("n_pos"), col("n_neg"),
        sum(col("n_pos")).over(w).as("cum_pos"),
        sum(col("n_neg")).over(w).as("cum_neg"))
      .crossJoin(broadcast(tot))
      // NULLIF guards: an all-one-class corpus zeroes a total, where
      // Spark emits NULL and DuckDB inf — the q_multiclass_metrics
      // divide-by-zero alignment (round-13 review)
      .select(col("bin"), col("n_pos"), col("n_neg"),
        round(col("cum_pos").cast("double") / nullif(col("tot_pos"), lit(0L)), 6).as("tpr"),
        round(col("cum_neg").cast("double") / nullif(col("tot_neg"), lit(0L)), 6).as("fpr"))
      .orderBy(col("bin").desc)
  }

  /** q_lift_curve — cumulative lift/capture at descending score
    * cutoffs (the targeting artifact: "scoring the top X% of the
    * corpus captures Y% of the positives at Z× the base rate"): same
    * 256-bin reduction as [[qRocCurve]], lift = precision-above-cutoff
    * over the base positive rate, capture = recall-above-cutoff. Same
    * scale shape: one data-sized aggregate, windows over bin rows. */
  def qLiftCurve(spark: SparkSession, dir: String): DataFrame = {
    val bins = binaryScored(spark, dir)
      .select(least(floor(col("p") * 256), lit(255)).cast("int").as("bin"), col("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("y")).cast("long").as("n_pos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0)).orderBy(col("bin").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tot = bins.agg(sum(col("n")).as("tot_n"), sum(col("n_pos")).as("tot_pos"))
    bins
      .select(col("bin"), col("n"), col("n_pos"),
        sum(col("n")).over(w).as("cum_n"),
        sum(col("n_pos")).over(w).as("cum_pos"))
      .crossJoin(broadcast(tot))
      // NULLIF on the positive total: a positive-free corpus zeroes the
      // base rate — see qRocCurve's guard note
      .select(col("bin"), col("n"), col("n_pos"),
        round((col("cum_pos").cast("double") / col("cum_n")) /
          nullif(col("tot_pos").cast("double") / col("tot_n"), lit(0.0)), 6).as("lift"),
        round(col("cum_pos").cast("double") / nullif(col("tot_pos"), lit(0L)), 6).as("capture"))
      .orderBy(col("bin").desc)
  }

  /** q_multiclass_metrics — the MULTI-CLASS evaluator surface
    * (`distkeras/evaluators.py` evaluates categorical predictions [H];
    * per-class precision/recall/F1 is its production extension): the
    * softmax demo head's argmax class vs truth = label mod K, reduced
    * to the K×K confusion aggregate FIRST (the only data-sized op —
    * K² rows leave the shuffle regardless of corpus size), then
    * one-vs-rest tp/fp/fn per class unpivoted from the tiny grid.
    * Zero-denominator guards via NULLIF on both engines (Spark emits
    * NULL on x/0, DuckDB emits inf — the guard makes them agree). */
  def qMulticlassMetrics(spark: SparkSession, dir: String): DataFrame = {
    val conf = Tables.embeddings(spark, dir)
      .select(smArgmax(smLogits).as("pred"),
        (col("label") % smClasses).as("y"))
      .groupBy(col("y"), col("pred")).agg(count(lit(1)).as("n"))
    val m = conf
      .select(explode(array((0 until smClasses).map(lit): _*)).as("class"),
        col("y"), col("pred"), col("n"))
      .groupBy(col("class"))
      .agg(
        sum(when(col("y") === col("class") && col("pred") === col("class"), col("n"))
          .otherwise(lit(0L))).as("tp"),
        sum(when(col("y") =!= col("class") && col("pred") === col("class"), col("n"))
          .otherwise(lit(0L))).as("fp"),
        sum(when(col("y") === col("class") && col("pred") =!= col("class"), col("n"))
          .otherwise(lit(0L))).as("fn"))
    m.select(col("class"), col("tp"), col("fp"), col("fn"),
        round(col("tp").cast("double") / nullif(col("tp") + col("fp"), lit(0L)), 6).as("prec"),
        round(col("tp").cast("double") / nullif(col("tp") + col("fn"), lit(0L)), 6).as("recall"),
        round(lit(2.0) * col("tp") / nullif(lit(2L) * col("tp") + col("fp") + col("fn"), lit(0L)), 6).as("f1"))
      .orderBy("class")
  }

  /** q_cross_entropy — the categorical cross-entropy the reference's
    * flagship model COMPILES as its loss (`examples/mnist.py`:
    * `categorical_crossentropy` [H]) as a corpus-level evaluation
    * aggregate: per row, the stable softmax probability of the true
    * class (max-subtracted exponentials, p_y picked by element_at so
    * the data-dependent label stays inside codegen), −ln clamped at
    * 1e-12 (the `DiffModel.logLoss` floor), ROUNDED TO 6 DP and summed
    * as DECIMAL(28,6) — the order-proof device, since a raw double AVG
    * of transcendental terms drifts per partitioning. One scan, one
    * single-row aggregate. */
  def qCrossEntropy(spark: SparkSession, dir: String): DataFrame = {
    val z = smLogits
    val mx = greatest(z: _*)
    val e = z.map(zk => exp(zk - mx))
    val tot = e.reduce(_ + _)
    val y = col("label") % smClasses
    val py = element_at(array(e: _*), (y + 1).cast("int")) / tot
    val ce = round(-log(greatest(py, lit(1e-12))), 6)
    Tables.embeddings(spark, dir)
      .agg(
        round(sum(ce.cast("decimal(28,6)")).cast("double") / count(lit(1)), 6)
          .as("mean_ce"),
        count(lit(1)).as("n"))
  }

  /** q_topk_accuracy — `top_k_categorical_accuracy`, the other metric
    * the reference's flagship compile step tracks [H]: the true class
    * counts as a hit when fewer than k classes strictly beat its logit
    * (ties resolved toward smaller class indices, exactly the
    * [[smArgmax]] convention, so top-1 here ≡ argmax accuracy — the SQL
    * twin mirrors the same tie-break). Hits are 0/1 integers, so the
    * corpus AVG is exact at any partitioning; reported beside top-1 as
    * one aggregate row. */
  def qTopkAccuracy(spark: SparkSession, dir: String): DataFrame = {
    val z = smLogits
    val y = col("label") % smClasses
    val zy = element_at(array(z: _*), (y + 1).cast("int"))
    // rank of the true class = strictly-greater logits + equal logits
    // at smaller class indices (the deterministic tie-break)
    val rank = (0 until smClasses).map { j =>
      when(z(j) > zy || (z(j) === zy && lit(j) < y), lit(1L)).otherwise(lit(0L))
    }.reduce(_ + _)
    Tables.embeddings(spark, dir)
      .select(rank.as("r"))
      .agg(
        round(avg(when(col("r") < 1, 1.0).otherwise(0.0)), 6).as("top1_acc"),
        round(avg(when(col("r") < 2, 1.0).otherwise(0.0)), 6).as("top2_acc"),
        count(lit(1)).as("n"))
  }

  /** q_accuracy — AccuracyEvaluator (`distkeras/evaluators.py ~L15-60
    * [H]`) as a single-row aggregate; "prediction" is argmax(embedding)
    * mod 10 for a deterministic, model-free oracle. */
  def qAccuracy(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .agg(round(
        avg(when(argMax(col("embedding")) % 10 === col("label").cast("long"), 1.0)
          .otherwise(0.0)), 6).as("acc"))

  /** q_reshape — ReshapeTransformer made driver-checkable: 8×8 row-major
    * reshape of the 64-dim embedding via [[reshape2d]], exploded to
    * (vec_id, r, c, v) long form. */
  def qReshape(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), posexplode(reshape2d(col("embedding"), 8, 8)).as(Seq("r", "rowv")))
      .select(col("vec_id"), col("r"), posexplode(col("rowv")).as(Seq("c", "v")))
      .select(col("vec_id"), col("r"), col("c"),
        round(col("v").cast("double"), 6).as("v"))
      .orderBy("vec_id", "r", "c")

  /** q_dense_vec — DenseTransformer made driver-checkable: extract a
    * sparse (indices, values) view of the embedding (elements > 0.15,
    * positions 0-based), scatter back to dense via [[sparseToDense]],
    * and emit the exploded long form. Round-trips the sparse↔dense
    * contract end to end inside one Catalyst plan. */
  def qDenseVec(spark: SparkSession, dir: String): DataFrame = {
    val pairs = filter(
      zip_with(sequence(lit(0), lit(63)), col("embedding"),
        (i, x) => struct(i.as("i"), x.as("x"))),
      p => p.getField("x") > lit(0.15))
    val idx = transform(pairs, _.getField("i"))
    val vals = transform(pairs, p => round(p.getField("x").cast("double"), 6))
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        posexplode(sparseToDense(idx, vals, lit(64))).as(Seq("pos", "v")))
      .orderBy("vec_id", "pos")
  }

  /** q_vec_avg_by_label — the element-wise weight-average merge at the
    * heart of the reference's data-parallel trainers
    * (`distkeras/trainers.py ~L150-260 [H]`), in long form:
    * posexplode → groupBy(label, idx) → avg. The assembled-array form
    * (collect back to vectors) is in graft.ml.Trainers via a typed
    * Aggregator; this long form is the DuckDB-checkable shape. */
  def qVecAvgByLabel(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), (col("pos") + 1).as("idx"))
      .agg(round(avg(col("v").cast("double")), 6).as("avg_v"))
      .orderBy("label", "idx")

  /** q_confusion_matrix — the full (label × prediction) contingency
    * grid for the deterministic mod-10 demo predictor, with per-row
    * (true-label) recall shares: the standard eval artifact q_accuracy
    * collapses to one number and q_eval_metrics to binary P/R/F1 —
    * multiclass error STRUCTURE (which classes confuse with which)
    * lives here.
    *
    * Scale shape: per-row codegen scoring into one map-side-combined
    * ≤ |labels|²-cell aggregate; the row totals are a window over that
    * tiny grid. */
  def qConfusionMatrix(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grid = Tables.embeddings(spark, dir)
      .select(col("label").cast("long").as("label"),
        (argMax(col("embedding")) % 10).as("pred"))
      .groupBy(col("label"), col("pred")).agg(count(lit(1)).as("n"))
    val rowT = Window.partitionBy(col("label"))
    grid
      .select(col("label"), col("pred"), col("n"),
        round(col("n").cast("double") /
          sum(col("n")).over(rowT).cast("double"), 6).as("row_share"))
      .orderBy("label", "pred")
  }

  /** q_embedding_norm_audit — L2-norm hygiene per label: count, mean,
    * min and max vector norm — the collapsed/exploding-embedding screen
    * run before any cosine machinery trusts the vectors (a near-zero
    * norm makes cosine meaningless; an outlier norm dominates dot
    * products). Norms are computed with a SEQUENTIAL higher-order fold
    * (both engines reduce the array left-to-right, so the float sum is
    * bit-identical), rounded to 6 dp, then aggregated through the
    * DECIMAL device.
    *
    * Scale shape: pure per-row codegen + one map-side-combined
    * ≤ |labels|-row aggregate. */
  def qEmbeddingNormAudit(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val norm = round(sqrt(aggregate(col("embedding"), lit(0.0),
      (acc, v) => acc + v.cast("double") * v.cast("double"))), 6)
    Tables.embeddings(spark, dir)
      .select(col("label"), norm.cast(DecimalType(18, 6)).as("nrm"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("nrm")).cast("double") / count(lit(1)).cast("double"), 6)
          .as("mean_norm"),
        min(col("nrm")).cast("double").as("min_norm"),
        max(col("nrm")).cast("double").as("max_norm"))
      .orderBy("label")
  }

  /** q_robust_scale — median/IQR robust scaling of order totals: the
    * outlier-immune sibling of q_minmax_scale (a single fat-finger row
    * drags min/max and flattens everything else; the median and IQR do
    * not move). scaled = (x − median) / (p75 − p25). The §2.A
    * transformer family's robust member.
    *
    * Scale shape: ONE exact-percentile aggregate (the GK sketch at
    * 100 TB, q_approx_percentile's swap) broadcast back over a per-row
    * codegen transform. Money is 2-dp-exact; interpolated percentiles
    * of 2-dp values are exact at ≤ 6 dp, so ROUND(,6) is stable. */
  def qRobustScale(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_totalprice"))
    val cuts = o.agg(
      percentile(col("o_totalprice"), lit(0.25)).as("p25"),
      percentile(col("o_totalprice"), lit(0.5)).as("p50"),
      percentile(col("o_totalprice"), lit(0.75)).as("p75"))
    o.crossJoin(broadcast(cuts))
      .select(col("o_orderkey"), col("o_totalprice"),
        round((col("o_totalprice") - col("p50")) / (col("p75") - col("p25")), 6)
          .as("scaled"))
      .orderBy("o_orderkey")
  }

  /** q_leakage_corr — per-dimension feature↔target correlation screen
    * over the embeddings: the train-time leakage audit (a feature
    * correlating suspiciously hard with the label is either leakage or
    * the whole model; either way you look BEFORE training). The
    * q_corr_matrix power-sum device grouped by dimension — embedding
    * floats are ROUND(,6)→DECIMAL before summing so the 64 per-dim
    * folds are addition-order-proof (floats are NOT 2-dp money; raw
    * double sums would wiggle with partitioning).
    *
    * Scale shape: one posexplode (×64 of narrow rows) into a
    * map-side-combined 64-group aggregate; everything after runs on 64
    * rows. */
  def qLeakageCorr(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val x = round(col("v").cast("double"), 6).cast(DecimalType(18, 6))
    val y = col("label").cast("long").cast(DecimalType(18, 0))
    val sums = Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("dim"), x.as("x"), y.as("y"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("y")).cast("double").as("sy"),
        sum((col("x") * col("x")).cast(DecimalType(30, 12))).cast("double").as("sxx"),
        sum((col("y") * col("y")).cast(DecimalType(30, 0))).cast("double").as("syy"),
        sum((col("x") * col("y")).cast(DecimalType(30, 6))).cast("double").as("sxy"))
    val nd = col("n").cast("double")
    sums.select(col("dim"), col("n"),
        round((col("sxy") - col("sx") * col("sy") / nd) /
          sqrt((col("sxx") - col("sx") * col("sx") / nd) *
            (col("syy") - col("sy") * col("sy") / nd)), 6).as("corr_with_label"))
      .orderBy("dim")
  }

  /** Calibration bins (equal-width over [0, 1]). */
  val calibBins = 10

  /** q_calibration — the reliability diagram behind [[qEvalMetrics]]'s
    * AUC: scores bucketed into [[calibBins]] equal-width bins, each
    * bin reporting its size, mean predicted probability, observed
    * positive rate, and the |gap| between them (the per-bin term of
    * expected calibration error). AUC measures RANKING; this measures
    * whether 0.8 MEANS 80% — the property a downstream filter
    * thresholding on model scores (quality gates, q_knn_label_noise
    * adjudication) actually depends on. Same deterministic scoring as
    * q_eval_metrics: prob = sigmoid(linear demo model) rounded to
    * 6 dp, label = argmax(embedding) mod 2.
    *
    * Scale shape: per-row codegen scoring, then ONE map-side-combined
    * aggregate into ≤ [[calibBins]] rows; probability sums are
    * DECIMAL(18,6)-exact (the rounded prob is exactly representable)
    * before the final double divisions. */
  /** q_gains_curve — cumulative-gains (lift) table over the demo
    * scorer: rows ranked by predicted probability, cut into deciles,
    * each reporting its positive count, the cumulative share of ALL
    * positives captured so far, and the lift vs random targeting —
    * [[qCalibration]] asks whether scores are honest probabilities;
    * this asks the deployment question ("contact the top 20%, catch
    * what fraction?"). Decile ties are broken by vec_id so the rank is
    * total on both engines.
    *
    * Scale shape: per-row codegen scoring; the decile score is the
    * range-bucketed [[graft.rel.ScalableRank.rangeNtile]] device (r14)
    * over the narrow (p, id) frame — bit-identical to the naive
    * unpartitioned ntile but never a single-reducer sort over ALL
    * embedding rows at 100 TB; the cumulative window then runs over
    * the 10-row decile aggregate only. */
  def qGainsCurve(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val margin = dotLit(col("embedding"), demoWeights) + lit(demoBias)
    val scored = Tables.embeddings(spark, dir).select(
      col("vec_id"),
      round(lit(1.0) / (lit(1.0) + exp(-margin)), 6).as("p"),
      (argMax(col("embedding")) % 2).cast("int").as("y"))
    val deciles = graft.rel.ScalableRank.rangeNtile(scored, -col("p"),
        Seq(col("p").desc, col("vec_id")), 10, "decile")
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"), sum(col("y").cast("long")).as("n_pos"))
    val w = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val capture = sum(col("n_pos")).over(w).cast("double") /
      sum(col("n_pos")).over(all).cast("double")
    deciles
      .select(col("decile"), col("n"), col("n_pos"),
        round(capture, 6).as("cum_capture"),
        round(capture / (col("decile").cast("double") / lit(10.0)), 6).as("lift"))
      .orderBy("decile")
  }

  /** q_auc_exact — EXACT ROC AUC via the tie-corrected Mann-Whitney
    * identity (q_eval_metrics reports a 10-bin Riemann AUC — a biased
    * estimate; this is the number it approximates). AUC = P(score⁺ >
    * score⁻) + ½·P(tie), computed WITHOUT ranking the corpus: scores
    * group to ≤ 10⁶+1 distinct 6-dp values, and over that bounded
    * frame Σₚ n1ₚ·(cum_n0_below + n0ₚ/2) / (n1·n0) needs one window.
    * Doubling every term keeps the numerator a pure BIGINT (ties
    * contribute exact halves) — float error cannot reorder anything
    * before the single final division.
    *
    * Scale shape: per-row codegen scoring → ONE map-side-combined
    * aggregate into the distinct-score frame; the cumulative window
    * and 1-row summary run on ≤ 10⁶ rows regardless of corpus size
    * (the q_vocab_growth device, vs q_gains_curve's global ntile which
    * genuinely needs the corpus-wide sort). */
  def qAucExact(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val margin = dotLit(col("embedding"), demoWeights) + lit(demoBias)
    val scored = Tables.embeddings(spark, dir).select(
      round(lit(1.0) / (lit(1.0) + exp(-margin)), 6).as("p"),
      (argMax(col("embedding")) % 2).cast("int").as("y"))
    val byP = scored.groupBy(col("p"))
      .agg(sum(col("y").cast("long")).as("n1"),
        sum(lit(1L) - col("y").cast("long")).as("n0"))
    val below = Window.orderBy(col("p"))
      .rowsBetween(Window.unboundedPreceding, -1)
    byP
      .withColumn("cum0", coalesce(sum(col("n0")).over(below), lit(0L)))
      .agg(sum(col("n1")).as("n_pos"), sum(col("n0")).as("n_neg"),
        sum(col("n1") * (lit(2L) * col("cum0") + col("n0"))).as("num2"))
      .select(col("n_pos"), col("n_neg"),
        round(col("num2").cast("double") /
          (lit(2.0) * col("n_pos").cast("double") * col("n_neg").cast("double")),
          9).as("auc"))
  }

  def qCalibration(spark: SparkSession, dir: String): DataFrame = {
    val margin = dotLit(col("embedding"), demoWeights) + lit(demoBias)
    val scored = Tables.embeddings(spark, dir).select(
      round(lit(1.0) / (lit(1.0) + exp(-margin)), 6).as("p"),
      (argMax(col("embedding")) % 2).cast("int").as("y"))
    val nd = col("n").cast("double")
    scored
      .select(least(floor(col("p") * calibBins), lit((calibBins - 1).toDouble))
        .cast("int").as("bin"), col("p"), col("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("p").cast(org.apache.spark.sql.types.DecimalType(18, 6))).as("sp"),
        sum(col("y").cast("long")).as("sy"))
      .select(col("bin"), col("n"),
        round(col("sp").cast("double") / nd, 6).as("mean_p"),
        round(col("sy").cast("double") / nd, 6).as("frac_pos"),
        round(abs(col("sp").cast("double") / nd - col("sy").cast("double") / nd), 6)
          .as("gap"))
      .orderBy("bin")
  }
}
