package graft.ml

/** Model weight codec — the Spark-native replacement for the reference's
  * `utils.serialize_keras_model`/`deserialize_keras_model`
  * (`distkeras/utils.py ~L20-45 [H]`), which shipped (arch JSON, ndarray
  * list) pickles over TCP. Here a model is a flat double vector plus
  * shapes; it travels as a `Broadcast` into closures and back through
  * Spark's serializer — no side-channel transport.
  */
final case class ModelWeights(shapes: Seq[(Int, Int)], flat: Array[Double]) {
  require(shapes.map { case (r, c) => r * c }.sum == flat.length,
    s"shape/flat mismatch: $shapes vs ${flat.length}")

  def nParams: Int = flat.length

  /** Materialize layer matrices (row-major). */
  def layers: Seq[Array[Array[Double]]] = {
    var off = 0
    shapes.map { case (r, c) =>
      val m = Array.tabulate(r, c)((i, j) => flat(off + i * c + j))
      off += r * c
      m
    }
  }

  def zipMap(other: ModelWeights)(f: (Double, Double) => Double): ModelWeights = {
    require(other.flat.length == flat.length)
    copy(flat = Array.tabulate(flat.length)(i => f(flat(i), other.flat(i))))
  }

  def +(o: ModelWeights): ModelWeights = zipMap(o)(_ + _)
  def -(o: ModelWeights): ModelWeights = zipMap(o)(_ - _)
  def *(s: Double): ModelWeights = copy(flat = flat.map(_ * s))
}

object ModelWeights {
  def zeros(shapes: Seq[(Int, Int)]): ModelWeights =
    ModelWeights(shapes, Array.fill(shapes.map { case (r, c) => r * c }.sum)(0.0))

  /** `utils.uniform_weights` (`distkeras/utils.py [H]`): deterministic
    * uniform init in [lo, hi] from an explicit seed. */
  def uniform(shapes: Seq[(Int, Int)], lo: Double, hi: Double, seed: Long): ModelWeights = {
    val rnd = new scala.util.Random(seed)
    ModelWeights(shapes,
      Array.fill(shapes.map { case (r, c) => r * c }.sum)(lo + rnd.nextDouble() * (hi - lo)))
  }

  /** Element-wise average of per-partition models — the merge step of
    * data-parallel training (`distkeras/trainers.py › AveragingTrainer
    * ~L150-260 [H]`). */
  def average(ms: Seq[ModelWeights]): ModelWeights = {
    require(ms.nonEmpty)
    val n = ms.size.toDouble
    ms.reduce(_ + _) * (1.0 / n)
  }
}

/** Linear/logistic model — the oracle-able special case of a Keras model
  * used throughout the training and prediction operators. Weights layout:
  * [w_0..w_{d-1}, b].
  */
final case class LinearModel(weights: ModelWeights) {
  private val d = weights.flat.length - 1
  def w: Array[Double] = weights.flat.take(d)
  def b: Double = weights.flat(d)

  def margin(x: Array[Double]): Double = {
    var s = b
    var i = 0
    while (i < d) { s += weights.flat(i) * x(i); i += 1 }
    s
  }

  def predictProb(x: Array[Double]): Double = 1.0 / (1.0 + math.exp(-margin(x)))
  def predictLabel(x: Array[Double]): Double = if (predictProb(x) >= 0.5) 1.0 else 0.0

  /** Logistic-loss gradient contribution of one example, added into acc
    * (scaled by -lr when used as an SGD step). */
  def gradient(x: Array[Double], y: Double): Array[Double] = {
    val p = predictProb(x)
    val g = new Array[Double](d + 1)
    val err = p - y
    var i = 0
    while (i < d) { g(i) = err * x(i); i += 1 }
    g(d) = err
    g
  }

  def logLoss(x: Array[Double], y: Double): Double = {
    val p = math.min(math.max(predictProb(x), 1e-12), 1 - 1e-12)
    -(y * math.log(p) + (1 - y) * math.log(1 - p))
  }
}

object LinearModel {
  def init(dim: Int, seed: Long = 42L): LinearModel =
    LinearModel(ModelWeights.uniform(Seq((1, dim + 1)), -0.1, 0.1, seed))
}
