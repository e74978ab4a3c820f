package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sim.Similarity
import graft.text.TextOps

/** The LLM-training-data counterpart of PipelineSpec: every cleaning
  * stage a 100 TB corpus pipeline runs, composed over the real test
  * tables instead of tested in isolation —
  *
  *   quality filter → language filter → exact dedup → near-dup cluster
  *   survivors → embedding near-dup prune
  *
  * Asserts the stages agree where they overlap (every exact dup is a
  * near-dup cluster member), the survivor set shrinks monotonically,
  * the result is deterministic across runs, and the composed plan stays
  * free of cartesian products.
  */
class LlmPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sfDir)

  /** Stage 1+2: quality + language gate (pure Catalyst, one scan). */
  private def gated: DataFrame = {
    val toks = split(col("text"), " ")
    val distinctRatio = size(array_distinct(toks)).cast("double") / size(toks)
    docs.filter(col("lang").isin("en", "de", "fr") && distinctRatio > 0.1)
  }

  test("stages compose: survivors shrink monotonically and deterministically") {
    val n0 = docs.count()
    val afterGate = gated
    val n1 = afterGate.count()
    assert(n1 > 0 && n1 <= n0, s"gate: $n0 -> $n1")

    // stage 3: exact dedup survivors (min doc_id per md5)
    val exactSurvivors = afterGate
      .groupBy(md5(col("text")).as("h")).agg(min(col("doc_id")).as("doc_id"))
      .drop("h")
    val n2 = exactSurvivors.count()
    assert(n2 <= n1, s"exact dedup: $n1 -> $n2")

    // stage 4: near-dup cluster over the gated corpus, keep one per cluster
    val clusters = {
      val edges = TextOps.nearDupPairs(afterGate, 3, 0.6)
        .select(col("id_a").as("src"), col("id_b").as("dst"))
      graph.ConnectedComponents.run(edges, afterGate.select(col("doc_id").as("id")))
    }
    val nearSurvivors = clusters.filter(col("id") === col("lbl"))
      .select(col("id").as("doc_id"))
      .join(exactSurvivors, Seq("doc_id"), "left_semi")
    val n3 = nearSurvivors.count()
    assert(n3 <= n2 && n3 > 0, s"near-dup cluster: $n2 -> $n3")

    // every exact duplicate pair must also be in one near-dup cluster
    // (identical text => jaccard 1.0 > any threshold)
    val exactPairs = afterGate
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("a"), max(col("doc_id")).as("b"), count(lit(1)).as("n"))
      .filter(col("n") > 1)
    val clusterOf = clusters.as[(Long, Long)].collect().toMap
    exactPairs.select("a", "b").as[(Long, Long)].collect().foreach { case (a, b) =>
      assert(clusterOf(a) == clusterOf(b),
        s"identical docs $a,$b landed in different near-dup clusters")
    }

    // stage 5: embedding near-dup prune over the survivors' vectors
    val emb = Tables.embeddings(spark, sfDir)
      .join(nearSurvivors, col("vec_id") === col("doc_id"), "left_semi")
      .select(col("vec_id"), col("embedding"))
    val dropIds = Similarity.embeddingNearDupPairsCapped(emb, 0.95,
        targetBucketSize = 64L, cap = 128L)
      .select(col("id_b").as("vec_id")).distinct()
    val finalSurvivors = emb.join(dropIds, Seq("vec_id"), "left_anti")
    val n4 = finalSurvivors.count()
    assert(n4 <= n3 && n4 > 0, s"embedding prune: $n3 -> $n4")

    // determinism: the whole composed pipeline yields the same survivor
    // set on a second evaluation
    val ids1 = finalSurvivors.select("vec_id").as[Long].collect().sorted.toSeq
    val ids2 = finalSurvivors.select("vec_id").as[Long].collect().sorted.toSeq
    assert(ids1 == ids2)
  }

  test("round-5 stages extend the chain: decontaminate → repetition gate → split → pack") {
    // stage 0: the eval split is carved out first (the decontamination
    // reference), then the train side flows through the cleaning chain
    val isEval = text.Sampling.inSample(col("doc_id"), TextOps.decontamEvalFraction)

    // decontamination report over the gated corpus
    val decon = TextOps.decontaminationReport(gated, isEval, w = 3)
    val cleanTrain = gated.filter(!isEval)
      .join(decon.filter(!col("flagged")).select("doc_id"), Seq("doc_id"), "left_semi")
    val nTrain = gated.filter(!isEval).count()
    val nClean = cleanTrain.count()
    assert(nClean > 0 && nClean <= nTrain, s"decontaminate: $nTrain -> $nClean")

    // repetition gate composes on the same side
    val unflagged = TextOps.repetitionReport(cleanTrain).filter(!col("flagged"))
    val kept = cleanTrain.join(unflagged.select("doc_id"), Seq("doc_id"), "left_semi")
    val nKept = kept.count()
    assert(nKept > 0 && nKept <= nClean, s"repetition gate: $nClean -> $nKept")

    // split assignment is disjoint+exhaustive over the kept set
    val split = kept.select(col("doc_id"), col("source"), col("text"),
      text.Sampling.splitAssign(col("doc_id"),
        Seq("train" -> 0.9, "val" -> 0.1)).as("split"))
    assert(split.count() == nKept)

    // packing offsets close the pipeline: per (split, source) streams,
    // exact prefix sums — total tokens must equal the sum of doc tokens
    val packed = TextOps.packChunks(
      split.filter(col("split") === "train"),
      concat_ws("/", col("split"), col("source")), col("doc_id"))
    val byStream = packed.groupBy("stream")
      .agg(max(col("tok_offset") + col("n_tokens")).as("stream_toks"),
        sum(col("n_tokens")).as("sum_toks"))
      .as[(String, Long, Long)].collect()
    assert(byStream.nonEmpty)
    byStream.foreach { case (s, end, total) =>
      assert(end == total, s"stream $s: packed end $end != token sum $total")
    }
  }

  test("round-5 relevance stage: BM25 domain gate composes with the cleaning chain") {
    // domain filtering by keyword relevance — keep only documents that
    // rank for the target-domain query (how a pipeline carves a
    // domain-specific subcorpus out of a general crawl). BM25 over the
    // GATED corpus, so the stage composes downstream of the cleaners.
    val ranked = text.Relevance.bm25Search(gated, text.Relevance.demoQuery, 50)
    val domain = gated.join(ranked.select("doc_id"), Seq("doc_id"), "left_semi")
    val nDomain = domain.count()
    assert(nDomain > 0 && nDomain <= 50, s"bm25 gate kept $nDomain")
    // every kept doc really contains at least one query term
    val misses = domain.filter(!text.Relevance.demoQuery
        .map(t => col("text").contains(t)).reduce(_ || _))
      .count()
    assert(misses == 0, s"$misses kept docs lack every query term")
    // and the stage composes with tf-idf profiling of the kept set
    val profiled = text.Relevance.tfidfTopTerms(domain, 3)
    assert(profiled.count() == nDomain * 3)
  }

  test("q_llm_pipeline gate key ≡ hand-composed stages") {
    val out = TextOps.qLlmPipeline(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty, "pipeline produced no survivors")

    // recompose from the individual gate-key operators: the quality and
    // repetition gates come from the GATE KEYS' own outputs (so this
    // cross-checks that the pipeline stage really is the same operator)
    val docs = Tables.documents(spark, sfDir)
    val isEval = text.Sampling.inSample(col("doc_id"), TextOps.decontamEvalFraction)
    val qualOk = TextOps.qQualityScore(spark, sfDir)
      .filter(col("quality") >= TextOps.pipelineMinQuality).select("doc_id")
    val repOk = TextOps.qQualityRepetition(spark, sfDir)
      .filter(!col("flagged")).select("doc_id")
    val deconOk = TextOps.decontaminationReport(docs, isEval, 3,
        threshold = TextOps.pipelineContamMax)
      .filter(!col("flagged")).select("doc_id")
    val cleaned = docs.filter(!isEval)
      .join(qualOk, Seq("doc_id"), "left_semi")
      .join(repOk, Seq("doc_id"), "left_semi")
      .join(deconOk, Seq("doc_id"), "left_semi")
    val exact = cleaned.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    val deduped = cleaned.join(exact, Seq("doc_id"), "left_semi")
    val edges = TextOps.ngramJaccardPairs(deduped, 3,
        TextOps.pipelineClusterJaccard, scala.None)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val keep = graph.ConnectedComponents
      .run(edges, deduped.select(col("doc_id").as("id")))
      .filter(col("id") === col("lbl")).select(col("id").as("doc_id"))
    val survivors = deduped.join(keep, Seq("doc_id"), "left_semi")
    val withSplit = survivors.select(col("doc_id"), col("source"), col("text"),
      text.Sampling.splitAssign(col("doc_id"), TextOps.pipelineSplits).as("split"))
    val packed = TextOps.packChunks(withSplit,
      concat_ws("/", col("split"), col("source")), col("doc_id")).orderBy("doc_id")

    assert(out.columns.toSeq == packed.columns.toSeq)
    assert(rows.toSeq == packed.collect().toSeq,
      "gate key diverged from the hand-composed stage chain")

    // packing integrity: per stream the last offset+len equals the sum
    val bad = out.groupBy("stream")
      .agg(max(col("tok_offset") + col("n_tokens")).as("end"),
        sum(col("n_tokens")).as("total"))
      .filter(col("end") =!= col("total")).count()
    assert(bad == 0, "stream packing offsets are not exact prefix sums")
  }

  test("q_llm_pipeline_v2 gate key ≡ hand-composed stages (round-6 ops included)") {
    val out = TextOps.qLlmPipelineV2(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty, "v2 pipeline produced no survivors")

    // recompose from the individual operators, each the gate key's own
    // shape: scrub first, then every gate over the SCRUBBED text
    val injected = when(col("doc_id") % 7 === 0,
      concat(lit("contact user"), col("doc_id").cast("string"),
        lit("@example.com via https://example.org/u/"),
        col("doc_id").cast("string"), lit(" "), col("text")))
      .otherwise(col("text"))
    val cleanedText = regexp_replace(
      regexp_replace(injected, TextOps.emailRe, "<EMAIL>"), TextOps.urlRe, "<URL>")
    val scrubbed = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), cleanedText.as("text"))

    val isEval = text.Sampling.inSample(col("doc_id"), TextOps.decontamEvalFraction)
    val toks = split(col("text"), " ")
    val nTok = size(toks).cast("double")
    val quality = round((size(array_distinct(toks)).cast("double") / nTok) * 0.5 +
      (lit(1.0) - size(filter(toks, t =>
        array_contains(typedLit(TextOps.stopwords), t))).cast("double") / nTok) * 0.5, 6)

    val gopherOk = TextOps.gopherRules(scrubbed).filter(col("keep")).select("doc_id")
    val tailOk = TextOps.qualityTails(scrubbed)
      .filter(col("tail") === "mid").select("doc_id")
    val repOk = TextOps.repetitionReport(scrubbed).filter(!col("flagged")).select("doc_id")
    val deconOk = TextOps.decontaminationReport(scrubbed, isEval, 3,
        threshold = TextOps.pipelineContamMax)
      .filter(!col("flagged")).select("doc_id")
    val cleaned = scrubbed.filter(!isEval && quality >= TextOps.pipelineMinQuality)
      .join(gopherOk, Seq("doc_id"), "left_semi")
      .join(tailOk, Seq("doc_id"), "left_semi")
      .join(repOk, Seq("doc_id"), "left_semi")
      .join(deconOk, Seq("doc_id"), "left_semi")
    val exact = cleaned.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    val deduped = cleaned.join(exact, Seq("doc_id"), "left_semi")
    val subDropped = TextOps.substringDupPairs(deduped)
      .select(col("id_b").as("doc_id")).distinct()
    val subKept = deduped.join(subDropped, Seq("doc_id"), "left_anti")
    val edges = TextOps.ngramJaccardPairs(subKept, 3,
        TextOps.pipelineClusterJaccard, scala.None)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val keep = graph.ConnectedComponents
      .run(edges, subKept.select(col("doc_id").as("id")))
      .filter(col("id") === col("lbl")).select(col("id").as("doc_id"))
    val survivors = subKept.join(keep, Seq("doc_id"), "left_semi")
    val withSplit = survivors.select(col("doc_id"), col("source"), col("text"),
      text.Sampling.splitAssign(col("doc_id"), TextOps.pipelineSplits).as("split"))
    val packed = TextOps.packChunks(withSplit,
      concat_ws("/", col("split"), col("source")), col("doc_id")).orderBy("doc_id")

    assert(out.columns.toSeq == packed.columns.toSeq)
    assert(rows.toSeq == packed.collect().toSeq,
      "v2 gate key diverged from the hand-composed stage chain")

    // the v2 survivor set is a subset of v1's (v2 only adds gates) —
    // except the scrub changes text, so compare counts loosely: v2 must
    // gate at least as hard as v1 modulo the scrub's token edits
    val v1n = TextOps.qLlmPipeline(spark, sfDir).count()
    assert(rows.length <= v1n, s"v2 kept ${rows.length} > v1 $v1n")

    // no PII survives: every surviving doc's text is scrub-clean
    val leaked = survivors
      .filter(col("text").rlike(TextOps.emailRe) || col("text").rlike(TextOps.urlRe))
      .count()
    assert(leaked == 0, s"$leaked survivors still contain raw emails/URLs")
  }

  test("composed gate+exact-dedup plan has no cartesian product") {
    val exactSurvivors = gated
      .groupBy(md5(col("text")).as("h")).agg(min(col("doc_id")).as("doc_id"))
      .drop("h")
    val joined = Tables.embeddings(spark, sfDir)
      .join(exactSurvivors, col("vec_id") === col("doc_id"), "left_semi")
    assert(!PlanAudit.hasCross(PlanAudit.executedPlan(joined)),
      "pipeline join planned a cartesian product")
  }
}
