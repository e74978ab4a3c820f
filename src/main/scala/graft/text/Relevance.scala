package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Term-relevance scoring over the document corpus: TF-IDF term
  * profiles and BM25 ranked retrieval — the text-analysis layer a
  * training-data pipeline uses for corpus exploration, keyword-based
  * filtering, and quality-weighted sampling.
  *
  * Scale shape (both operators): tokenize → explode → two-phase hash
  * aggregation. The explosion is absorbed map-side (each document lives
  * in one input partition, so partial aggregation reduces to per-doc
  * term counts before anything shuffles); the only wide exchanges carry
  * (doc_id, term, count) triples — corpus-size-independent per row. The
  * document-frequency table is term-level (vocabulary-sized, ≪ corpus)
  * and joins back keyed on term; the corpus-level scalars (N, total
  * length) are one-row aggregates broadcast via cross-join, never
  * collected to the driver.
  */
object Relevance {

  /** Per-(doc, term) frequencies from whitespace tokens, lowercased. */
  private def termFreq(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(TextOps.tokens(lower(col("text")))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Top `k` TF-IDF terms per document. Smoothed idf =
    * ln((N+1)/(df+1)) + 1 (the sklearn "smooth_idf" form — never zero,
    * never divides by zero). Rank is over the ROUNDED score (ties then
    * broken by term) so both engines rank the same values. */
  def tfidfTopTerms(docs: DataFrame, k: Int): DataFrame = {
    val tf = termFreq(docs)
    val dfTable = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val idf = log((col("n_docs") + lit(1)).cast("double") / (col("df") + lit(1)).cast("double")) + lit(1.0)
    val scored = tf
      .join(dfTable, "term")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), col("tf"),
        round(col("tf").cast("double") * idf, 6).as("score"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
    scored
      .withColumn("rn", row_number().over(w).cast("int"))
      .where(col("rn") <= k)
  }

  def qTfidf(spark: SparkSession, dir: String): DataFrame =
    tfidfTopTerms(Tables.documents(spark, dir), 3)
      .select("doc_id", "term", "tf", "score", "rn")
      .orderBy("doc_id", "rn")

  /** BM25 (Robertson/Sparck Jones) parameters — the standard defaults. */
  val bm25K1 = 1.2
  val bm25B = 0.75

  /** Demo query for the gate key: three discriminative corpus terms. */
  val demoQuery: Seq[String] = Seq("hash", "join", "merge")

  /** Top `k` documents for `query` by BM25.
    *
    * Determinism contract: each term's contribution is rounded to 6 dp
    * and summed as DECIMAL(18,6), so the per-document score is exact and
    * addition-order-independent — the ranking cannot flip on float
    * summation order (Spark's aggregation order is nondeterministic;
    * DuckDB's differs again). Derived constants (k1+1, 1-b) are computed
    * once here and interpolated into the oracle, so both engines parse
    * the identical double. */
  def bm25Search(docs: DataFrame, query: Seq[String], k: Int): DataFrame = {
    val toks = docs.select(col("doc_id"), TextOps.tokens(lower(col("text"))).as("toks"))
    val dl = toks.select(col("doc_id"), size(col("toks")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = toks
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .where(col("term").isin(query: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfTable = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val idf = log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val w = idf * (col("tf") * lit(bm25K1 + 1.0)) /
      (col("tf") + lit(bm25K1) * (lit(1.0 - bm25B) + lit(bm25B) * col("dl") / avgdl))
    tf
      .join(broadcast(dfTable), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), round(w, 6).cast(DecimalType(18, 6)).as("wd"))
      .groupBy(col("doc_id"))
      .agg(sum(col("wd")).as("score_dec"), count(lit(1)).as("n_terms_matched"))
      .orderBy(col("score_dec").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("score_dec").cast("double").as("score"), col("n_terms_matched"))
  }

  def qBm25Search(spark: SparkSession, dir: String): DataFrame =
    bm25Search(Tables.documents(spark, dir), demoQuery, 10)

  /** RRF constant (Cormack/Clarke/Buettcher 2009's k = 60) and list
    * depth for [[rankFusion]]. */
  val rrfK = 60
  val rrfPerList = 20
  val rrfTopK = 10

  /** Vector-space-model ranking for [[rankFusion]]'s second list:
    * score = Σ_t tf·idf² (query tf = 1, sklearn-smoothed idf) — the
    * classic dot-product relevance WITHOUT BM25's saturation or length
    * normalization, so the two lists genuinely disagree and fusion has
    * something to reconcile. Same determinism device as BM25: per-term
    * contributions rounded to 6 dp, summed as DECIMAL(18,6). */
  private def vsmSearch(docs: DataFrame, query: Seq[String], k: Int): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(TextOps.tokens(lower(col("text")))).as("term"))
      .where(col("term").isin(query: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfTable = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val idf = log((col("n_docs") + lit(1)).cast("double") / (col("df") + lit(1)).cast("double")) + lit(1.0)
    tf
      .join(broadcast(dfTable), "term")
      .crossJoin(broadcast(n))
      .select(col("doc_id"),
        round(col("tf").cast("double") * idf * idf, 6).cast(DecimalType(18, 6)).as("wd"))
      .groupBy(col("doc_id"))
      .agg(sum(col("wd")).as("score_dec"))
      .orderBy(col("score_dec").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("score_dec").cast("double").as("score"))
  }

  /** Reciprocal-rank fusion — the HYBRID retrieval primitive RAG
    * serving runs (lexical list ⊕ second-signal list →
    * rrf = Σ 1/(k₀+rank) over the candidate union): fuses [[bm25Search]]
    * with [[vsmSearch]] here; in a full deployment the second list is
    * the ANN top-k (q_ann_topk/q_ivf_pq_topk) and fusion joins the SAME
    * bounded per-query frames, so this plan shape IS the production
    * one.
    *
    * Scale shape: each list is its own bounded top-k (the heavy
    * lifting); fusion itself touches ≤ 2·perList rows per query — a
    * full-outer join on doc_id + one window. Missing-in-one-list
    * candidates contribute 0 from that list (standard RRF over the
    * union).
    *
    * Determinism: ranks are ROW_NUMBER over (6-dp-rounded score DESC,
    * doc_id); rrf = two one-shot IEEE divisions added in fixed
    * expression order then ROUND(,9) — no aggregation-order float sums
    * anywhere. */
  def rankFusion(docs: DataFrame, query: Seq[String]): DataFrame = {
    val lex = bm25Search(docs, query, rrfPerList)
      .withColumn("rank_lex", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))))
      .select(col("doc_id"), col("rank_lex"))
    val vsm = vsmSearch(docs, query, rrfPerList)
      .withColumn("rank_vsm", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))))
      .select(col("doc_id"), col("rank_vsm"))
    val rrf = round(
      coalesce(lit(1.0) / (lit(rrfK) + col("rank_lex")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(rrfK) + col("rank_vsm")), lit(0.0)), 9)
    lex.join(vsm, Seq("doc_id"), "full_outer")
      .withColumn("rrf", rrf)
      .withColumn("rn", row_number().over(
        Window.orderBy(col("rrf").desc, col("doc_id"))).cast("int"))
      .where(col("rn") <= rrfTopK)
      .select(col("doc_id"), col("rank_lex"), col("rank_vsm"), col("rrf"), col("rn"))
      .orderBy("rn")
  }

  def qRankFusion(spark: SparkSession, dir: String): DataFrame =
    rankFusion(Tables.documents(spark, dir), demoQuery)

  /** Hashed feature space width (buckets). */
  val featureHashBuckets = 64

  /** q_feature_hashing — the hashing-trick vectorizer (Weinberger et
    * al., ICML'09): each token maps to bucket `h(t) mod B` with a sign
    * drawn from an independent hash bit, and a document's feature
    * vector is the signed count per bucket. Unlike TF-IDF this needs
    * NO vocabulary pass, no term table, and no join — the feature id
    * is a pure per-row expression, which is the whole point at 100 TB:
    * a fixed-width, collision-tolerant, join-free vectorizer whose
    * output width is independent of corpus vocabulary. The sign bit
    * makes collisions cancel in expectation instead of accumulating.
    *
    * One map-side-combined aggregate on (doc_id, bucket); hash =
    * [[TextOps.baseHash60]] (the cross-engine md5-prefix device), sign
    * from the next bit above the bucket field. Zero-sum buckets are
    * kept (they are real vector coordinates). */
  def featureHashing(docs: DataFrame): DataFrame = {
    require(Integer.bitCount(featureHashBuckets) == 1, "bucket count must be a power of 2")
    val b = lit(featureHashBuckets)
    val signShift = Integer.numberOfTrailingZeros(featureHashBuckets)
    val h = TextOps.baseHash60(concat(lit("fh:"), col("term")))
    docs
      .select(col("doc_id"), explode(TextOps.tokens(lower(col("text")))).as("term"))
      .select(col("doc_id"),
        pmod(h, b).cast("int").as("bucket"),
        // sign = the bit just above the bucket field; shiftright keeps
        // the arithmetic exact on the 60-bit hash (a double division
        // would lose low bits above 2^53)
        (pmod(shiftright(h, signShift), lit(2L)) * lit(2L) - lit(1L)).as("sign"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(sum(col("sign")).as("feature_val"), count(lit(1)).as("n_terms"))
      .orderBy("doc_id", "bucket")
  }

  def qFeatureHashing(spark: SparkSession, dir: String): DataFrame =
    featureHashing(Tables.documents(spark, dir))

  /** Train fraction for [[naiveBayes]]'s hash split (the
    * [[Sampling.inSample]] 80% cut; oracle interpolates the same hex
    * literal via [[Sampling.cutHex]]). */
  val nbTrainFraction = 0.8

  /** q_naive_bayes — multinomial Naive Bayes language classifier,
    * trained and scored in ONE declarative plan: add-1-smoothed token
    * likelihoods from the 80% hash-split train docs, argmax log-score
    * over the 20% held-out docs. NB is the canonical distributed text
    * classifier because training IS an aggregation — per-class token
    * counts — with no iterations at all (contrast the gradient loop a
    * logistic model needs); at 100 TB this trains in exactly one
    * corpus pass.
    *
    * Scale shape: ONE tokenize/explode pass feeds both splits; train
    * side ends at the (class, token) count agg; the likelihood grid is
    * vocabulary × classes (vocab-sized — the q_domain_shift grid
    * device; classes are a tiny broadcast, so the cross is bounded by
    * construction); scoring joins test tokens to the grid on token
    * (equi-join, corpus-linear) and ends at a (doc, class) agg over
    * ≤ |classes| rows per doc.
    *
    * Determinism: each log-likelihood ln((c+1)/(nₗ+V)) and log-prior
    * ln(n_docs/N) is ROUND(,9) → DECIMAL(18,9), so per-doc class
    * scores are exact decimal sums (addition-order-proof) and the
    * argmax total order (score DESC, class ASC) is identical on both
    * engines. OOV test tokens (absent from the train vocabulary) drop
    * from the inner grid join — the standard NB treatment, applied
    * symmetrically to every class; a test doc with NO in-vocab tokens
    * drops entirely (deterministic on both engines, none at the gate
    * SFs). */
  def naiveBayes(docs: DataFrame): DataFrame = {
    val d9 = DecimalType(18, 9)
    val isTrain = Sampling.inSample(col("doc_id"), nbTrainFraction)
    val tok = docs.select(col("doc_id"), col("lang"), isTrain.as("tr"),
      explode(TextOps.tokens(lower(col("text")))).as("tok"))
    val trainTok = tok.filter(col("tr"))
    val ct = trainTok.groupBy(col("lang").as("cl"), col("tok"))
      .agg(count(lit(1)).as("c"))
    val cls = trainTok.groupBy(col("lang").as("cl"))
      .agg(count(lit(1)).as("ntok"), countDistinct(col("doc_id")).as("ndocs"))
    val nTrain = cls.agg(sum(col("ndocs")).as("n_train"))
    val vocab = ct.select(col("tok")).distinct()
    val vSize = vocab.agg(count(lit(1)).as("vsize"))
    val grid = vocab
      .crossJoin(broadcast(cls))
      .crossJoin(broadcast(vSize))
      .join(ct, Seq("tok", "cl"), "left")
      .select(col("tok"), col("cl"),
        round(log((coalesce(col("c"), lit(0L)).cast("double") + lit(1.0)) /
          (col("ntok") + col("vsize")).cast("double")), 9).cast(d9).as("ll"))
    val prior = cls.crossJoin(broadcast(nTrain))
      .select(col("cl"),
        round(log(col("ndocs").cast("double") / col("n_train").cast("double")), 9)
          .cast(d9).as("lp"))
    val scored = tok.filter(!col("tr"))
      .join(grid, "tok")
      .groupBy(col("doc_id"), col("lang"), col("cl"))
      .agg(sum(col("ll")).as("sll"))
      .join(broadcast(prior), "cl")
      .select(col("doc_id"), col("lang"), col("cl"),
        (col("sll") + col("lp")).as("score"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("cl"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang").as("lang_true"),
        col("cl").as("lang_pred"),
        round(col("score").cast("double"), 6).as("logprob"),
        (col("lang") === col("cl")).cast("int").as("correct"))
      .orderBy("doc_id")
  }

  def qNaiveBayes(spark: SparkSession, dir: String): DataFrame =
    naiveBayes(Tables.documents(spark, dir))
}
