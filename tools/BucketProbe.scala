// Ad-hoc probe (not part of the sbt build; compile with scalac against
// target/scala-2.13/classes + /opt/spark/jars): reports max band-bucket
// populations for the uncapped MinHash / SimHash band joins at a given SF,
// to size their density guards (r16 verdict ask #2).
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object BucketProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, dir)
    val sigs = graft.text.TextOps.minhashSignatures(docs, 3)
    val mh = sigs.select(col("doc_id"),
        explode(graft.text.TextOps.bandKeys(col("sig"))).as("k"))
      .groupBy(col("k")).count()
      .agg(max("count"), expr("approx_percentile(count, 0.999)"), count(lit(1)))
      .collect()(0)
    println(s"MINHASH dir=$dir max=${mh.get(0)} p999=${mh.get(1)} nbuckets=${mh.get(2)}")
    val fps = graft.text.TextOps.simhashFingerprintsLong(docs)
    val width = 8; val mask = (1L << width) - 1
    val sh = fps.select(col("doc_id"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("fp"), b * width).bitwiseAND(lit(mask)).as("bits"))): _*)).as("k"))
      .groupBy(col("k")).count()
      .agg(max("count"), expr("approx_percentile(count, 0.999)"), count(lit(1)))
      .collect()(0)
    println(s"SIMHASH dir=$dir max=${sh.get(0)} p999=${sh.get(1)} nbuckets=${sh.get(2)}")
    spark.stop()
  }
}
