// Ad-hoc A/B probe (not part of the sbt build): times nearDupPairs at a
// given SF dir under (a) the r15 lazy shape (guard=0, cp=None) and
// (b) the r16 default (guard + sig cp), to isolate the x10 regression.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object NdpProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val which = args(1) // "old" | "new"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, dir)
    val t0 = System.nanoTime()
    val df = which match {
      case "old" => graft.text.TextOps.nearDupPairs(docs, 3, 0.6, guard = 0L)
      case _ => graft.text.TextOps.nearDupPairs(docs, 3, 0.6)
    }
    val n = df.count()
    println(s"NDP $which dir=$dir rows=$n sec=${(System.nanoTime() - t0) / 1e9}")
    spark.stop()
  }
}
