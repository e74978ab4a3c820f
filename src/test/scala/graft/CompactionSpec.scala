package graft

import org.apache.spark.sql.functions._

import graft.plans.Compaction

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("plan packs a hand manifest by contiguous first-fit (no file split, bins close past target)") {
    // one partition, files 0..5 of 60/50/40/90/10/30 bytes, target 100:
    // cum-bytes starts 0/60/110/150/240/250 -> bins 0/0/1/1/2/2
    val m = Seq(
      ("p", 0L, 60L), ("p", 1L, 50L), ("p", 2L, 40L),
      ("p", 3L, 90L), ("p", 4L, 10L), ("p", 5L, 30L)
    ).toDF("part", "file_id", "bytes")
    val got = Compaction.plan(m, lit(100L))
      .select($"file_id", $"bin").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 2L))
  }

  test("plan scopes bins per partition and honors a per-row (per-partition) target") {
    val m = Seq(
      ("a", 0L, 80L, 100L), ("a", 1L, 80L, 100L),   // a: 80+80 -> bins 0,0? cum-80=0,80 -> 0,0
      ("b", 0L, 80L, 50L), ("b", 1L, 80L, 50L)      // b target 50: cum-80=0,80 -> bins 0,1
    ).toDF("part", "file_id", "bytes", "target")
    val got = Compaction.plan(m, $"target")
      .select($"part", $"file_id", $"bin").as[(String, Long, Long)].collect().sorted
    assert(got.toSeq == Seq(("a", 0L, 0L), ("a", 1L, 0L), ("b", 0L, 0L), ("b", 1L, 1L)))
  }

  test("q_compaction_plan gate key: bins bounded by the target count, non-decreasing, non-degenerate") {
    val rows = Compaction.qCompactionPlan(spark, sfDir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("file_id"),
        r.getAs[Long]("n_rows"), r.getAs[Long]("bytes"), r.getAs[Long]("bin")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (src, fs) =>
      val byFile = fs.sortBy(_._2)
      // target = ceil(total/4) so bin indices can never reach 4
      assert(byFile.forall(f => f._5 >= 0 && f._5 < Compaction.gateBinsPerPart), s"$src bins out of range")
      // contiguous first-fit: bin is non-decreasing in manifest order
      assert(byFile.map(_._5).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)), s"$src bins not monotone")
      // non-degenerate packing: fewer bins than files (files DO merge)
      assert(byFile.map(_._5).distinct.length < byFile.length, s"$src no merging happened")
      // every bin except the partition's last closes at/above target
      val total = byFile.map(_._4).sum
      val target = (total + Compaction.gateBinsPerPart - 1) / Compaction.gateBinsPerPart
      val lastBin = byFile.map(_._5).max
      byFile.groupBy(_._5).foreach { case (bin, bf) =>
        val upTo = byFile.filter(_._5 <= bin).map(_._4).sum
        if (bin < lastBin) assert(upTo >= (bin + 1) * target, s"$src bin $bin closed early")
      }
    }
  }
}
