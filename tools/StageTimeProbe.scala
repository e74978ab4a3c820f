// Ad-hoc probe (not part of the sbt build; copy into src/ to compile):
// runs ONE registry key and prints per-stage wall/task-time from a
// SparkListener — the "name the limiter" tool for keys whose 8-vs-32
// core ratio is ~1 at sf1 (r17 ask #3). Usage:
//   StageTimeProbe <key> [sfDir] [cpus]
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

object StageTimeProbe {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val dir = if (args.length > 1) args(1) else "/tmp/testdata_sf1"
    val cpus = if (args.length > 2) args(2) else "32"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    case class St(name: String, submitted: Long, completed: Long,
                  taskTimeMs: Long, nTasks: Int, maxTaskMs: Long)
    val stages = mutable.ArrayBuffer[St]()
    val taskTime = mutable.Map[Int, (Long, Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
        val (sum, n, mx) = taskTime.getOrElse(t.stageId, (0L, 0, 0L))
        val d = t.taskInfo.duration
        taskTime(t.stageId) = (sum + d, n + 1, math.max(mx, d))
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = synchronized {
        val i = s.stageInfo
        val (sum, n, mx) = taskTime.getOrElse(i.stageId, (0L, 0, 0L))
        val rdds = i.rddInfos.sortBy(_.id).map(_.name).filter(_ != null)
          .distinct.mkString("|").take(88)
        stages += St(rdds,
          i.submissionTime.getOrElse(0L), i.completionTime.getOrElse(0L), sum, n, mx)
      }
    })
    val fn = graft.SparkEntry.queries(key)
    fn(spark, dir).write.format("noop").mode("overwrite").save() // warm
    stages.clear(); taskTime.clear()
    val t0 = System.nanoTime()
    fn(spark, dir).write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1000)
    println(f"$key total wall ${wall}%.2f s, ${stages.size} stages")
    val byWall = stages.sortBy(s => -(s.completed - s.submitted)).take(20)
    println(f"${"stage"}%-92s ${"wall_s"}%7s ${"task_s"}%8s ${"n"}%5s ${"max_task_s"}%10s")
    byWall.foreach { s =>
      println(f"${s.name}%-92s ${(s.completed - s.submitted) / 1e3}%7.2f ${s.taskTimeMs / 1e3}%8.2f ${s.nTasks}%5d ${s.maxTaskMs / 1e3}%10.2f")
    }
    // gaps between stages = driver/scheduler/barrier time
    val sorted = stages.sortBy(_.submitted)
    val stageWall = sorted.map(s => s.completed - s.submitted).sum / 1e3
    println(f"sum of stage walls ${stageWall}%.2f s vs job wall ${wall}%.2f s (driver/overlap delta)")
    spark.stop(); sys.exit(0)
  }
}
