package graft

import org.apache.spark.sql.functions._

import graft.sim.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine top-k: scores descend, ranks contiguous, k respected") {
    val out = Similarity.qCosineTopK(spark, sfDir).collect()
    val byQ = out.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size == 8)
    byQ.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("rn"))
      assert(sorted.map(_.getAs[Int]("rn")).toSeq == (1 to rows.length))
      assert(rows.length <= 3)
      val scores = sorted.map(_.getAs[Double]("score"))
      assert(scores.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    }
  }

  test("ANN via LSH recalls most brute-force neighbors (multi-probe)") {
    val exact = Similarity.qCosineTopK(spark, sfDir)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val ann = Similarity.qAnnTopK(spark, sfDir)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val recall = exact.count(ann.contains).toDouble / exact.size
    assert(recall >= 0.4, s"recall $recall too low") // LSH on near-random vectors
  }

  test("lshBuckets assigns equal vectors to equal buckets") {
    val emb = Tables.embeddings(spark, sfDir).limit(10)
      .select($"vec_id", $"embedding")
    val planes = Similarity.hyperplanes(6, 64)
    val b1 = emb.select($"vec_id", Similarity.lshBuckets($"embedding", planes).as("b"))
      .as[(Long, Int)].collect().toMap
    val b2 = emb.select($"vec_id", Similarity.lshBuckets($"embedding", planes).as("b"))
      .as[(Long, Int)].collect().toMap
    assert(b1 == b2)
    assert(b1.values.forall(b => b >= 0 && b < 64))
  }

  test("IVF ANN recalls most brute-force neighbors") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    val cands = emb.filter($"vec_id" >= 8)
      .select($"vec_id".as("cid"), $"embedding".as("ce"))
    val exact = Similarity.cosineTopK(queries, cands, 3)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(queries, cands, 3, nCentroids = 8, nProbe = 3)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val recall = exact.count(ivf.contains).toDouble / exact.size
    assert(recall >= 0.3, s"IVF recall $recall too low")
  }

  test("IVF returns full top-k even when candidates < 2x centroids") {
    // regression: the old stride-sampled seeding produced ZERO seeds
    // (and silently zero results) whenever the corpus was smaller than
    // ~2x nCentroids
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter($"vec_id" < 4)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    val cands = emb.filter($"vec_id" >= 4 && $"vec_id" < 24)  // 20 cands, 16 centroids
      .select($"vec_id".as("cid"), $"embedding".as("ce"))
    val ivf = Similarity.ivfTopK(queries, cands, 3, nCentroids = 16, nProbe = 16)
    assert(ivf.count() == 4 * 3, "IVF dropped results on a small corpus")
  }

  test("VectorAverage aggregator averages element-wise, distributed") {
    val df = Seq(
      (0, Seq(1.0, 2.0, 3.0)), (0, Seq(3.0, 4.0, 5.0)),
      (1, Seq(10.0, 0.0, 0.0))).toDF("g", "v").repartition(4)
    val got = df.groupBy($"g")
      .agg(graft.vec.VectorAverage.avgVec($"v").as("avg"))
      .as[(Int, Seq[Double])].collect().toMap
    assert(got(0) == Seq(2.0, 3.0, 4.0))
    assert(got(1) == Seq(10.0, 0.0, 0.0))
  }

  test("embedding near-dup pairs are symmetric-free (a<b) and thresholded") {
    val rows = Similarity.qDedupEmbedding(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
      assert(r.getAs[Double]("score") > 0.25)
    }
  }
}
