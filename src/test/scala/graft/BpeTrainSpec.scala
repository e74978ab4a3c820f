package graft

import graft.text.TextOps

/** Iterated BPE training (the loop whose single step q_bpe_merge
  * oracles): pinned against an independent in-memory reference
  * implementation of Sennrich-style BPE, plus structural properties. */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: plain-Scala BPE over a (word -> count) map,
    * written without looking at the Spark fold (argmax by (count desc,
    * pair asc), greedy left-to-right non-overlap re-segmentation). */
  private def referenceBpe(words: Map[String, Long],
                           nMerges: Int): Seq[(String, String, Long)] = {
    var vocab: Map[Vector[String], Long] =
      words.map { case (w, c) => w.map(_.toString).toVector -> c }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var i = 0
    var exhausted = false
    while (i < nMerges && !exhausted) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + c
          case _ => ()
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ((a, b), pc) = counts.toSeq
          .sortBy { case ((a, b), pc) => (-pc, a, b) }.head
        out += ((a, b, pc))
        vocab = vocab.map { case (syms, c) =>
          val ns = scala.collection.mutable.ArrayBuffer.empty[String]
          syms.foreach { s =>
            if (ns.nonEmpty && ns.last == a && s == b) ns(ns.length - 1) = a + b
            else ns += s
          }
          ns.toVector -> c
        }
        i += 1
      }
    }
    out.toSeq
  }

  private val corpus = Seq(
    "the theme of the gathering was the weather",
    "another gathering gathered there",
    "the weather was rather fair there",
    "rather a fair theme for another day",
    "low lower lowest newer newest wider")

  private lazy val docs = corpus.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  private def wordCounts: Map[String, Long] = corpus
    .flatMap(_.toLowerCase.split("\\s+")).filter(_.length >= 2)
    .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }

  test("bpeTrain merges equal the independent reference for 12 rounds") {
    val got = TextOps.bpeTrain(docs, 12).merges
    val want = referenceBpe(wordCounts, 12)
    assert(got == want,
      s"merge lists differ:\n got: $got\nwant: $want")
  }

  test("final segmentation equals replaying the merges driver-side, and conserves words") {
    val res = TextOps.bpeTrain(docs, 8)
    val rows = res.vocab.select("w", "syms").as[(String, Seq[String])].collect()
    assert(rows.map(_._1).toSet == wordCounts.keySet)
    val replay = res.merges.map { case (a, b, _) => (a, b) }
    rows.foreach { case (w, syms) =>
      // concatenating the symbols reconstructs the word exactly
      assert(syms.mkString == w, s"$w lost characters: $syms")
      // and the distributed fold agrees with the driver-side replay
      assert(syms == TextOps.bpeSegment(w, replay),
        s"$w: $syms vs ${TextOps.bpeSegment(w, replay)}")
    }
  }

  test("first merge equals q_bpe_merge's rank-1 pair (the oracled step)") {
    val first = TextOps.bpeTrain(docs, 1).merges.head
    val top = TextOps.bpeMergePairs(docs, topN = 1).collect().head
    assert(top.getAs[String]("pair") == first._1 + first._2)
    assert(top.getAs[Long]("pc") == first._3)
  }

  test("merge list is deterministic across partitionings") {
    val a = TextOps.bpeTrain(docs.repartition(1), 6).merges
    val b = TextOps.bpeTrain(docs.repartition(7), 6).merges
    assert(a == b)
  }

  test("exhausting all pairs stops early instead of looping") {
    val tiny = Seq((0L, "ab ab")).toDF("doc_id", "text")
    // "ab" (count 2) has one pair; after merging it there is nothing left
    val res = TextOps.bpeTrain(tiny, 10)
    assert(res.merges == Seq(("a", "b", 2L)))
  }
}
