package graft

import graft.plans.Pruning

class PruningSpec extends SparkSpec {

  test("q_manifest_prune: clustered layout prunes, arrival cannot; statuses match a driver recompute") {
    val rows = Pruning.qManifestPrune(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getString(5)))
    assert(rows.length == 2 * Pruning.pruneFiles)
    assert(rows.count(_._1 == "arrival") == Pruning.pruneFiles)
    // every status recomputes from (mn, mx) and the band
    rows.foreach { case (_, _, n, mn, mx, st) =>
      assert(n > 0 && mn <= mx)
      val exp =
        if (mx < Pruning.pruneLo || mn > Pruning.pruneHi) "skipped"
        else if (mn >= Pruning.pruneLo && mx <= Pruning.pruneHi) "full"
        else "partial"
      assert(st == exp, s"($mn,$mx) -> $st != $exp")
    }
    // the measured ROI: value-clustering must skip files the arrival
    // layout cannot (orders' totalprice is uncorrelated with orderkey,
    // so arrival files all straddle the band; clustered files are
    // value-contiguous so all but the band's neighbors skip or match)
    def skipped(l: String) = rows.count(r => r._1 == l && r._6 == "skipped")
    def opened(l: String) = rows.filter(r => r._1 == l && r._6 == "partial").map(_._3).sum
    assert(skipped("clustered") > skipped("arrival"),
      s"clustered ${skipped("clustered")} !> arrival ${skipped("arrival")}")
    assert(opened("clustered") < opened("arrival"),
      "clustered layout must row-filter fewer rows than arrival")
    // clustered files are value-disjoint (ranges tile the domain)
    val c = rows.filter(_._1 == "clustered").sortBy(_._2)
    c.sliding(2).foreach {
      case Array(f1, f2) => assert(f1._5 <= f2._4, s"files ${f1._2},${f2._2} overlap")
      case _ =>
    }
  }

  test("partition audit accounts for every row and ranks candidates sanely") {
    val out = plans.Pruning.qPartitionAudit(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.size == 4)
    out.values.foreach { r =>
      assert(r.getAs[Double]("skew") >= 1.0 - 1e-9, "max >= avg by definition")
      assert(r.getAs[Long]("max_rows") * r.getAs[Long]("n_partitions") >=
        r.getAs[Long]("n_rows"), "max * parts bounds the total")
    }
    assert(out(("orders", "o_orderdate_day")).getAs[Long]("n_rows") ==
      Tables.orders(spark, sfDir).count())
    assert(out(("events", "event_type")).getAs[Long]("n_partitions") ==
      Tables.events(spark, sfDir).select("event_type").distinct().count())
    // a day key yields far more partitions than the low-cardinality type
    assert(out(("events", "event_day")).getAs[Long]("n_partitions") >
      out(("events", "event_type")).getAs[Long]("n_partitions"))
  }
}
