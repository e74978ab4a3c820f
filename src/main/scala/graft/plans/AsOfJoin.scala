package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed backward as-of join, built from a union + keyed window scan.
  *
  * Spark has no native as-of join, so we express it as a single keyed
  * window pass (SURVEY.md §7.2): tag build rows 0 and probe rows 1,
  * union them, and for each probe row take `last(payload, ignoreNulls)`
  * over `(key) ORDER BY (time, tag) ROWS UNBOUNDED PRECEDING`. A build
  * row with time == probe time sorts *before* the probe row (tag 0 < 1),
  * giving inclusive `buildTime <= probeTime` semantics — the same
  * contract as DuckDB's `ASOF JOIN ... ON p.t >= b.t`.
  *
  * Scale: exactly one shuffle of each side, hash-partitioned by the join
  * key (the window's partitionBy); per-key state is O(1) (the running
  * `last`), so this survives arbitrary key cardinality and 100 TB inputs
  * as long as single keys aren't pathologically hot. No broadcast, no
  * cross product, no driver collect. The build side should be
  * pre-aggregated to one row per (key, time) for deterministic output.
  */
object AsOfJoin {

  /** @param probe        left side; every row is kept iff a match exists
    * @param build        right side, unique per (buildKey, buildTime)
    * @param probeKey     equi-join key column on probe
    * @param buildKey     equi-join key column on build
    * @param probeTime    probe ordering column (timestamp)
    * @param buildTime    build ordering column (timestamp); carried to the
    *                     output and used as the match indicator
    * @return probe columns + build payload columns (null-free: unmatched
    *         probe rows are dropped, i.e. inner as-of semantics)
    */
  /** @param tolerance optional maximum probe−build gap (e.g. "30 minutes");
    *                   matches older than the tolerance are dropped */
  def backward(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      probeTime: String,
      buildTime: String,
      tolerance: Option[String] = None): DataFrame = {
    // A build row with NULL time must never match: nulls sort FIRST in
    // the window order, so an unfiltered null-time row would act as a
    // -infinity match for every probe row (pandas merge_asof drops such
    // rows). Filter before the union so it can't participate at all.
    val buildNN = build.filter(col(buildTime).isNotNull)
    val payload = build.columns.filterNot(_ == buildKey).toSeq
    val probeCols = probe.columns.filterNot(c => c == probeKey).toSeq

    // All payload columns travel as ONE struct filled by ONE
    // last(ignoreNulls) — per-column fills could mix fields from
    // different build rows when the latest match has a legitimately
    // NULL field (round-1 advice). Probe rows contribute a NULL struct;
    // build rows a non-null struct that preserves inner nulls.
    val bStruct = org.apache.spark.sql.types.StructType(
      payload.map(c => org.apache.spark.sql.types.StructField(
        c, build.schema(c).dataType, nullable = true)))

    val pSide = probe.select(
      (col(probeKey).as("__k") +: col(probeTime).cast("timestamp").as("__t") +: lit(1).as("__tag") +:
        probeCols.map(col)) :+
        lit(null).cast(bStruct).as("__b"): _*)
    val bSide = buildNN.select(
      (col(buildKey).as("__k") +: col(buildTime).cast("timestamp").as("__t") +: lit(0).as("__tag") +:
        probeCols.map(c => lit(null).cast(probe.schema(c).dataType).as(c))) :+
        struct(payload.map(col): _*).as("__b"): _*)

    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = pSide.unionByName(bSide)
      .select(
        (col("__k").as(probeKey) +: col("__tag") +: probeCols.map(col)) :+
          last(col("__b"), ignoreNulls = true).over(w).as("__b"): _*)

    val matched = filled
      .filter(col("__tag") === 1 && col("__b").isNotNull)
      .select(
        (col(probeKey) +: probeCols.map(col)) ++
          payload.map(c => col("__b").getField(c).as(c)): _*)
    tolerance.fold(matched) { t =>
      matched.filter(
        col(probeTime).cast("timestamp") <=
          col(buildTime).cast("timestamp") + expr(s"INTERVAL $t"))
    }
  }
}
