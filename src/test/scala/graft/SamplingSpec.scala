package graft

import org.apache.spark.sql.functions._

import graft.text.Sampling

/** Content-hash sampling semantics: reproducibility is the whole point,
  * so every property here is about stability — same rows across runs,
  * across repartitioning, and membership consistency between the sample
  * and the split ops. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sfDir)

  test("hashSample keeps ~fraction of rows, exactly the same rows every run") {
    val n = docs.count().toDouble
    val s1 = Sampling.hashSample(docs, $"doc_id", 0.10)
      .select("doc_id").as[Long].collect().toSet
    val s2 = Sampling.hashSample(docs.repartition(13), $"doc_id", 0.10)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2, "sample must not depend on partitioning")
    // 2-hex granularity + 500-doc corpus: generous tolerance band
    assert(s1.size / n > 0.03 && s1.size / n < 0.25,
      s"10% sample kept ${s1.size} of $n")
    // fraction monotonicity: a bigger sample contains the smaller one
    val s3 = Sampling.hashSample(docs, $"doc_id", 0.30)
      .select("doc_id").as[Long].collect().toSet
    assert(s1.subsetOf(s3))
    // boundary cases
    assert(Sampling.hashSample(docs, $"doc_id", 0.0).count() == 0)
    assert(Sampling.hashSample(docs, $"doc_id", 1.0).count() == n.toLong)
  }

  test("splitAssign is disjoint, exhaustive, and roughly proportioned") {
    val split = docs.select($"doc_id",
      Sampling.splitAssign($"doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
    val counts = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    val total = counts.values.sum
    assert(total == docs.count(), "every row must get exactly one label")
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train").toDouble / total > 0.7, s"$counts")
    // splits agree with hashSample: the 10%-sample rows are exactly the
    // rows below the same hash cut, so sample ⊆ is consistent by cut
    val cut80 = Sampling.hashSample(docs, $"doc_id", 0.8)
      .select("doc_id").as[Long].collect().toSet
    val train = split.filter($"split" === "train")
      .select("doc_id").as[Long].collect().toSet
    assert(train == cut80, "train split must equal the 80% hash sample")
  }

  test("splitAssign with a cut that rounds to 256 (0.999/0.001) assigns by the guard, not hex '100'") {
    // round(0.999·256) = 256: hexOf(256) is the 3-char "100", which is
    // lexicographically above only "00".."0f" — without the always-true
    // guard ~94% of rows would silently land in "val"
    val split = docs.select($"doc_id",
      Sampling.splitAssign($"doc_id",
        Seq("train" -> 0.999, "val" -> 0.001)).as("split"))
    val counts = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.getOrElse("train", 0L) == docs.count(),
      s"0.999 rounds to cut 256 → every row is train at 1/256 granularity; got $counts")
  }

  test("splitAssign rejects fractions not summing to 1") {
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(lit(1L), Seq("a" -> 0.5, "b" -> 0.3))
    }
  }

  test("stratified sample applies per-stratum fractions independently") {
    val out = Sampling.stratifiedHashSample(docs, $"lang", $"doc_id",
      Map("en" -> 1.0, "de" -> 0.0, "fr" -> 0.5))
    val byLang = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    val full = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang.getOrElse("de", 0L) == 0L)
    assert(byLang("en") == full("en"), "fraction 1.0 keeps the whole stratum")
    assert(!byLang.contains("es") && !byLang.contains("zh"),
      "strata absent from the map are dropped")
    val frFrac = byLang.getOrElse("fr", 0L).toDouble / full("fr")
    assert(frFrac > 0.2 && frFrac < 0.8, s"fr kept $frFrac")
    // deterministic across runs
    val again = Sampling.stratifiedHashSample(docs, $"lang", $"doc_id",
      Map("en" -> 1.0, "de" -> 0.0, "fr" -> 0.5))
      .select("doc_id").as[Long].collect().toSet
    assert(again == out.select("doc_id").as[Long].collect().toSet)
  }

  test("shufflePositions is a permutation equal to the global hash order, partition-independent") {
    val n = docs.count()
    val got = Sampling.shufflePositions(docs, $"doc_id")
      .select("doc_id", "pos").as[(Long, Long)].collect().sortBy(_._1)
    // a permutation of 1..n
    assert(got.map(_._2).sorted.toSeq == (1L to n).toSeq)
    // bucketed two-phase rank ≡ naive global window rank
    val naive = docs.select($"doc_id",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(md5($"doc_id".cast("string").cast("binary")), $"doc_id"))
          .cast("long").as("pos"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == naive.toSeq, "bucketed plan must reproduce the global order")
    // and it actually shuffles: positions are not monotone in doc_id
    assert(got.sliding(2).exists(w => w(1)._2 < w(0)._2))
    // stable under repartitioning
    val re = Sampling.shufflePositions(docs.repartition(13), $"doc_id")
      .select("doc_id", "pos").as[(Long, Long)].collect().sortBy(_._1)
    assert(re.toSeq == got.toSeq)
    // bucket granularity is a pure scale knob: positions identical at
    // 16 and 4096 buckets (re-tuning for scale can never change data)
    Seq(1, 3).foreach { hc =>
      val alt = Sampling.shufflePositions(docs, $"doc_id", hexChars = hc)
        .select("doc_id", "pos").as[(Long, Long)].collect().sortBy(_._1)
      assert(alt.toSeq == got.toSeq, s"hexChars=$hc changed the permutation")
    }
    intercept[IllegalArgumentException] {
      Sampling.shufflePositions(docs, $"doc_id", hexChars = 5)
    }
  }

  test("shufflePositions refuses reserved column names; domainMixPlan validates targets") {
    intercept[IllegalArgumentException] {
      Sampling.shufflePositions(docs.withColumn("pos", lit(1)), $"doc_id")
    }
    intercept[IllegalArgumentException] {
      Sampling.domainMixPlan(docs, $"lang", Seq("en" -> 0.5, "en" -> 0.5))
    }
    intercept[IllegalArgumentException] {
      Sampling.domainMixPlan(docs, $"lang", Seq("en" -> 0.0))
    }
  }

  test("domainMixPlan: binding domain rate 1.0, others scaled, keep counts floor'd") {
    val plan = Sampling.domainMixPlan(docs, $"lang", Sampling.domainMixTargets)
      .as[(String, Long, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    val avail = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val tcap = Sampling.domainMixTargets
      .map { case (s, f) => avail(s) / f }.min
    // the binding domain samples at (rounded) rate 1.0
    val binding = Sampling.domainMixTargets.minBy { case (s, f) => avail(s) / f }._1
    assert(plan(binding)._4 == 1.0, s"binding domain $binding: ${plan(binding)}")
    // unlisted domain: rate 0, keep 0
    assert(plan("es")._3 == 0.0 && plan("es")._4 == 0.0 && plan("es")._5 == 0L)
    // every listed domain: rate = round(target*T/n, 6), keep = floor(rate*n)
    Sampling.domainMixTargets.foreach { case (s, f) =>
      val (_, n, _, rate, keep) = plan(s)
      val expect = math.rint(math.min(1.0, f * tcap / n) * 1e6) / 1e6
      assert(math.abs(rate - expect) < 1e-12, s"$s rate $rate vs $expect")
      assert(keep == math.floor(rate * n).toLong)
      assert(keep <= n)
    }
    // the realized mixture hits the targets: keep_s / total ≈ target_s
    val total = Sampling.domainMixTargets.map(t => plan(t._1)._5).sum.toDouble
    Sampling.domainMixTargets.foreach { case (s, f) =>
      assert(math.abs(plan(s)._5 / total - f) < 0.01, s"$s mixture off-target")
    }
  }

  test("temperatureMixPlan: q sums to ~1, flattens toward uniform, boosts the tail") {
    val rows = Sampling.qDomainMixTemperature(spark, sfDir).collect()
      .map(r => (r.getAs[String]("domain"), r.getAs[Long]("n_docs"),
        r.getAs[Double]("p_nat"), r.getAs[Double]("q_mix"), r.getAs[Double]("boost")))
    assert(rows.nonEmpty)
    // shares are distributions (up to 6-dp rounding per domain)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4)
    // α<1 compresses the mix: every below-average domain is boosted,
    // every above-average one damped, and ordering is preserved
    val sorted = rows.sortBy(_._3)
    assert(sorted.map(_._4).toSeq == sorted.map(_._4).sortBy(identity).toSeq,
      "temperature scaling must preserve the size ordering")
    val (head, tail) = (sorted.last, sorted.head)
    assert(tail._5 > 1.0, s"smallest domain not boosted: $tail")
    assert(head._5 < 1.0, s"largest domain not damped: $head")
    // exact per-row relation: q = round(round(sqrt(p),6)/Z, 6)
    val z = rows.map(r => BigDecimal(math.rint(math.sqrt(r._3) * 1e6) / 1e6)).sum
    rows.foreach { case (d, _, p, q, boost) =>
      val expect = math.rint((math.rint(math.sqrt(p) * 1e6) / 1e6) / z.toDouble * 1e6) / 1e6
      assert(math.abs(q - expect) < 1e-12, s"$d q_mix $q vs $expect")
      val expB = math.rint(q / p * 1e6) / 1e6
      assert(math.abs(boost - expB) < 1e-12, s"$d boost $boost vs $expB")
    }
  }

  test("q_sample_weighted: DLT priorities match a driver-side recompute; heavy docs overrepresented") {
    val got = Sampling.qSampleWeighted(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(got.nonEmpty)
    // driver-side reference: same md5-derived u, same w/u priority
    val docs = graft.Tables.documents(spark, sfDir)
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def u(id: Long): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ws:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      (java.lang.Long.parseLong(hex, 16) % 999983L + 1L).toDouble / 999984.0
    }
    val expected = docs.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      rows.sortBy { case (_, id, nc) => (-(math.max(nc, 1L).toDouble / u(id)), id) }
        .take(Sampling.weightedK).zipWithIndex
        .map { case ((s, id, nc), i) => (s, id, nc, i + 1) }
    }.sortBy(r => (r._1, r._4))
    assert(got.toSeq == expected)
    // weight bias: the sampled docs' mean length must exceed the corpus
    // mean (priority rises with weight — that is the operator's point)
    val corpusMean = docs.map(_._3).sum.toDouble / docs.length
    val sampleMean = got.map(_._3).sum.toDouble / got.length
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean not above corpus mean $corpusMean")
  }

  test("kfold covers every doc and folds are roughly balanced per language") {
    val out = text.Sampling.qKfold(spark, sfDir).collect()
    assert(out.map(_.getAs[Long]("n")).sum ==
      Tables.documents(spark, sfDir).count())
    out.foreach { r =>
      val f = r.getAs[Int]("fold")
      assert(f >= 0 && f < text.Sampling.kFolds)
    }
    // each (fold, lang) share should sit near 1/k — wide tolerance for
    // small strata, but no fold may swallow a language
    out.foreach { r =>
      assert(r.getAs[Double]("lang_share") < 0.5,
        s"fold ${r.getAs[Int]("fold")} owns ${r.getAs[Double]("lang_share")} of ${r.getString(1)}")
    }
  }

  test("bootstrap SE: point estimate exact, SE positive and plausibly scaled") {
    val out = text.Sampling.qBootstrapSe(spark, sfDir).collect()
    val srcStats = Tables.documents(spark, sfDir)
      .groupBy("source").agg(count(lit(1)).as("n"), avg(col("n_chars")).as("m"),
        stddev(col("n_chars")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(out.length == srcStats.size)
    out.foreach { r =>
      val (n, m, s) = srcStats(r.getString(0))
      assert(r.getAs[Long]("n_docs") == n)
      assert(math.abs(r.getAs[Double]("mean_chars") - m) < 1e-4)
      val se = r.getAs[Double]("boot_se")
      // the bootstrap SE estimates s/sqrt(n); with 8 replicates allow a
      // wide band, but it must be positive and the right order of
      // magnitude (not ~s, not ~s/n)
      val ref = s / math.sqrt(n.toDouble)
      assert(se > 0.0 && se > ref / 4 && se < ref * 4, s"se $se vs s/sqrt(n) $ref")
    }
  }
}
