package graft

import org.apache.spark.sql.functions._

import graft.plans.ZOrder

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference interleave, independent of the column impl. */
  private def zRef(xs: Seq[Long], bits: Int): Long = {
    var z = 0L
    for (j <- xs.indices; i <- 0 until bits)
      z |= ((xs(j) >> i) & 1L) << (i * xs.size + j)
    z
  }

  test("zvalue matches the reference interleave over the full 2x8-bit domain") {
    val df = spark.range(0, 256 * 256)
      .select(($"id" % 256).as("x"), ($"id" / 256).cast("long").as("y"))
    val got = df.select($"x", $"y", ZOrder.zvalue(Seq($"x", $"y"), 8).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == zRef(Seq(x, y), 8), s"($x,$y) -> $z != ${zRef(Seq(x, y), 8)}")
    }
    // bijective on the domain: 65536 distinct z-values
    assert(got.map(_._3).distinct.length == 256 * 256)
  }

  test("z-order bounds BOTH dimensions per chunk; single-column sort does not") {
    // 4096 points on a 64x64 grid; cut the sorted order into 16 chunks
    // and measure each chunk's bounding box in x and y
    val pts = spark.range(0, 64 * 64)
      .select(($"id" % 64).as("x"), ($"id" / 64).cast("long").as("y"))
    def maxSpread(ordered: Array[(Long, Long)]): (Long, Long) =
      ordered.grouped(256).map { chunk =>
        val (xs, ys) = (chunk.map(_._1), chunk.map(_._2))
        (xs.max - xs.min, ys.max - ys.min)
      }.toSeq.unzip match { case (a, b) => (a.max, b.max) }

    val byZ = pts.select($"x", $"y", ZOrder.zvalue(Seq($"x", $"y"), 6).as("z"))
      .orderBy("z").as[(Long, Long, Long)].collect().map(t => (t._1, t._2))
    val byX = pts.orderBy("x", "y").as[(Long, Long)].collect()

    val (zx, zy) = maxSpread(byZ)
    val (xx, xy) = maxSpread(byX)
    // z-order: each 256-point chunk is a 16x16 tile → both spreads small
    assert(zx <= 16 && zy <= 16, s"z-order chunk spreads ($zx, $zy) not tile-bounded")
    // x-sort: x is tightly bounded but y spans the whole domain
    assert(xx <= 4 && xy == 63, s"x-sort spreads ($xx, $xy) unexpected")
  }

  test("clusterBy range-partitions by z and sorts within partitions") {
    val df = Tables.part(spark, sfDir)
      .select($"p_partkey", ZOrder.partZValue.as("z"))
    val clustered = ZOrder.clusterBy(df, $"z", 4)
    // within each partition z is non-decreasing, and partition z-ranges
    // are disjoint (range exchange), so the whole frame is z-ordered
    val perPart = clustered.select($"z").rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val zs = it.map(_.getLong(0)).toArray
        Iterator((pid, zs.sameElements(zs.sorted),
          if (zs.isEmpty) (0L, -1L) else (zs.head, zs.last)))
      }.collect()
    assert(perPart.forall(_._2), "z not sorted within a partition")
    val ranges = perPart.filter(p => p._3._2 >= p._3._1).map(_._3).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi <= lo, "partition z-ranges overlap")
      case _ =>
    }
  }

  test("zvalueSql mirrors zvalue (same bit layout) via Spark's SQL parser") {
    // evaluate the generated SQL string in Spark itself: if the string
    // form and the Column form ever disagree, the oracle would drift
    val df = spark.range(0, 1000)
      .select(($"id" % 50 + 1).as("p_size"), ($"id" * 7 % 256).as("kb"))
    val sqlExpr = ZOrder.zvalueSql(Seq("p_size", "kb"), 8)
    val diff = df.select(
        ZOrder.zvalue(Seq($"p_size", $"kb"), 8).as("a"),
        expr(sqlExpr).as("b"))
      .where($"a" =!= $"b").count()
    assert(diff == 0L)
  }
}
