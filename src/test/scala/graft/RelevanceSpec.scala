package graft

import org.apache.spark.sql.functions._

import graft.text.Relevance

class RelevanceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "apple banana apple cherry"),
    (1L, "apple banana banana durian"),
    (2L, "apple cherry cherry cherry"),
    (3L, "apple zebra zebra zebra zebra")
  ).toDF("doc_id", "text")

  test("tfidf: a term in every doc scores below an equally-frequent rare term") {
    val top = Relevance.tfidfTopTerms(docs, 10)
      .select("doc_id", "term", "score").as[(Long, String, Double)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    // doc 0: 'apple' tf=2 but df=4 (all docs); 'cherry' tf=1, df=2.
    // idf(apple) = ln(5/5)+1 = 1 → score 2.0; idf(cherry) = ln(5/3)+1.
    assert(math.abs(top((0L, "apple")) - 2.0) < 1e-9)
    assert(top((2L, "cherry")) > top((2L, "apple")),
      "3x rare term must outrank 1x ubiquitous term")
  }

  test("tfidf: at most k terms per doc, ranked by score then term") {
    val out = Relevance.tfidfTopTerms(docs, 2)
      .select("doc_id", "rn", "score").as[(Long, Int, Double)].collect()
    assert(out.groupBy(_._1).forall(_._2.length <= 2))
    out.groupBy(_._1).values.foreach { rows =>
      val byRn = rows.sortBy(_._2)
      assert(byRn.map(_._3).sameElements(byRn.map(_._3).sortBy(-_: Double)),
        "rank must be score-descending")
    }
  }

  test("bm25: docs matching more query mass rank first; non-matching docs absent") {
    val out = Relevance.bm25Search(docs, Seq("cherry", "durian"), 10)
      .select("doc_id", "score", "n_terms_matched").as[(Long, Double, Long)].collect()
    val ids = out.map(_._1).toSet
    assert(!ids.contains(3L), "doc without any query term must not appear")
    assert(ids == Set(0L, 1L, 2L))
    // doc 2 has cherry x3; doc 0 cherry x1 — same single term, higher tf wins
    val score = out.map(t => t._1 -> t._2).toMap
    assert(score(2L) > score(0L))
    // doc 1 matches the rarer 'durian' (df=1) → beats the cherry-only docs
    assert(out.head._1 == 1L || score(1L) > score(0L))
  }

  test("q_rank_fusion: rrf recomputes from the member ranks; union semantics; top-k bounded") {
    val out = Relevance.qRankFusion(spark, sfDir).collect()
      .map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Int]),
        Option(r.get(2)).map(_.asInstanceOf[Int]),
        r.getDouble(3), r.getInt(4)))
    assert(out.nonEmpty && out.length <= Relevance.rrfTopK)
    assert(out.map(_._5).toSeq == (1 to out.length), "rn is a dense 1..k")
    out.foreach { case (id, rl, rv, rrf, _) =>
      assert(rl.isDefined || rv.isDefined, s"doc $id in neither list")
      val exp = rl.map(r => 1.0 / (Relevance.rrfK + r)).getOrElse(0.0) +
        rv.map(r => 1.0 / (Relevance.rrfK + r)).getOrElse(0.0)
      assert(math.abs(rrf - BigDecimal(exp).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12,
        s"doc $id rrf $rrf vs $exp")
    }
    // fusion order is rrf desc (ties by doc_id — monotone rn already asserted)
    val rrfs = out.map(_._4)
    assert(rrfs.sameElements(rrfs.sortBy(-_: Double)))
    // a doc ranked #1 in BOTH lists must be fused #1
    out.find(o => o._2.contains(1) && o._3.contains(1))
      .foreach(o => assert(o._5 == 1))
  }

  test("bm25 gate key is deterministic across runs and bounded by k") {
    val d = Tables.documents(spark, sfDir)
    val a = Relevance.bm25Search(d, Relevance.demoQuery, 10).collect()
    val b = Relevance.bm25Search(d, Relevance.demoQuery, 10).collect()
    assert(a.sameElements(b), "ranking must be run-stable (decimal score sums)")
    assert(a.length <= 10 && a.nonEmpty)
    val scores = a.map(_.getDouble(1))
    assert(scores.sameElements(scores.sortBy(-_: Double)))
  }

  test("feature hashing: fixed-width signed counts that conserve tokens") {
    import graft.text.Relevance
    val out = Relevance.qFeatureHashing(spark, sfDir).cache()
    try {
      // buckets live in [0, B)
      assert(out.filter(col("bucket") < 0 || col("bucket") >= Relevance.featureHashBuckets)
        .count() == 0)
      // |signed sum| <= n_terms and they share parity (sum of ±1s)
      assert(out.filter(abs(col("feature_val")) > col("n_terms")).count() == 0)
      assert(out.filter(pmod(abs(col("feature_val")), lit(2)) =!= pmod(col("n_terms"), lit(2)))
        .count() == 0)
      // token conservation: per-doc n_terms sums to the doc's token count
      val toks = Tables.documents(spark, sfDir)
        .select(col("doc_id"), size(split(lower(col("text")), " ")).cast("long").as("nt"))
      val sums = out.groupBy("doc_id").agg(sum("n_terms").as("s"))
      assert(sums.join(toks, "doc_id").filter(col("s") =!= col("nt")).count() == 0)
      // same token always lands in the same bucket: deterministic re-run
      val again = Relevance.qFeatureHashing(spark, sfDir)
      assert(out.exceptAll(again).count() == 0 && again.exceptAll(out).count() == 0)
    } finally out.unpersist()
  }

  test("naive bayes: separable vocabularies classify perfectly") {
    // two langs with DISJOINT vocabularies — whatever docs the 80/20
    // hash split sends to test, their tokens only ever carry evidence
    // for the true class (the other class sees them at smoothing mass)
    val fixture = (0L until 100L).map { i =>
      if (i % 2 == 0) (i, "aa", "alpha beta alpha gamma")
      else (i, "bb", "delta epsilon delta zeta")
    }.toDF("doc_id", "lang", "text")
    val out = Relevance.naiveBayes(fixture).collect()
    assert(out.nonEmpty, "hash split must land some docs in test")
    out.foreach { r =>
      assert(r.getAs[String]("lang_pred") == r.getAs[String]("lang_true"),
        s"doc ${r.getAs[Long]("doc_id")} misclassified")
      assert(r.getAs[Int]("correct") == 1)
      assert(r.getAs[Double]("logprob") < 0.0, "log-probability must be negative")
    }
  }

  test("naive bayes: gate key covers the held-out split, flag consistent") {
    val out = Relevance.qNaiveBayes(spark, sfDir).collect()
    val nTest = Tables.documents(spark, sfDir)
      .filter(!graft.text.Sampling.inSample(col("doc_id"), Relevance.nbTrainFraction))
      .count()
    // every test doc appears unless ALL its tokens are OOV (none at
    // the gate SFs — assert full coverage so a silent drop regresses)
    assert(out.length == nTest, s"${out.length} scored vs $nTest held out")
    val langs = Tables.documents(spark, sfDir)
      .select("lang").distinct().as[String].collect().toSet
    out.foreach { r =>
      assert(langs.contains(r.getAs[String]("lang_pred")))
      assert((r.getAs[Int]("correct") == 1) ==
        (r.getAs[String]("lang_true") == r.getAs[String]("lang_pred")))
    }
  }
}
