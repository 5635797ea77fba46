package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Per-stage attribution for one or more named queries (optimization-round
  * instrument, guide §1/§7): runs each query exactly like Bench does
  * (toRdd.count after one untimed warm-up rep) with a SparkListener
  * recording, per stage: task count, summed executor run time, fetch-wait,
  * input bytes, shuffle read/write bytes — so "where does the wall go"
  * (scan vs shuffle vs compute vs per-job overhead) is read off a table
  * instead of conjectured. Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.Profile x23 x46"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class StageRow(name: String, tasks: Int, runMs: Long,
                              fetchMs: Long, cpuMs: Long, inBytes: Long,
                              shRead: Long, shWrite: Long, wallMs: Long)
    val stages = mutable.ArrayBuffer.empty[StageRow]
    var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val wall = (for (a <- si.completionTime; b <- si.submissionTime)
          yield a - b).getOrElse(-1L)
        stages += StageRow(
          si.name.take(60), si.numTasks, m.executorRunTime,
          m.shuffleReadMetrics.fetchWaitTime, m.executorCpuTime / 1000000L,
          m.inputMetrics.bytesRead, m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten, wall)
      }
    }

    val names = if (args.nonEmpty) args.toSeq else Seq("a05_book_summary")
    val all = SparkEntry.queries
    // one untimed warm-up of the whole session (codegen, parquet footers)
    try all("q1_pricing_summary")(spark, sfDir).count()
    catch { case _: Throwable => () }
    names.foreach { prefix =>
      val name = all.keys.filter(_.startsWith(prefix)).toSeq.sorted.headOption
        .getOrElse(sys.error(s"no query matches $prefix"))
      // warm-up rep, exactly like Bench rep 1 (uncounted)
      all(name)(spark, sfDir).queryExecution.toRdd.count()
      spark.catalog.clearCache()
      stages.clear(); jobs = 0
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      all(name)(spark, sfDir).queryExecution.toRdd.count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(800) // let the listener bus drain (no public waitUntilEmpty)
      spark.sparkContext.removeSparkListener(listener)
      spark.catalog.clearCache()
      println(f"\n===== $name  wall=$wall%.3f s  jobs=$jobs  stages=${stages.size} =====")
      println(f"${"stage"}%-60s ${"tasks"}%5s ${"wall_ms"}%8s ${"run_ms"}%8s ${"cpu_ms"}%8s ${"fetch"}%6s ${"in_MB"}%7s ${"shR_MB"}%7s ${"shW_MB"}%7s")
      stages.sortBy(-_.runMs).foreach { s =>
        println(f"${s.name}%-60s ${s.tasks}%5d ${s.wallMs}%8d ${s.runMs}%8d ${s.cpuMs}%8d ${s.fetchMs}%6d ${s.inBytes / 1e6}%7.1f ${s.shRead / 1e6}%7.1f ${s.shWrite / 1e6}%7.1f")
      }
      val totRun = stages.map(_.runMs).sum
      val totWallMs = stages.filter(_.wallMs > 0).map(_.wallMs).sum
      println(f"sum(run)=${totRun / 1000.0}%.2f s  sum(stage wall)=${totWallMs / 1000.0}%.2f s  query wall=$wall%.3f s")
    }
    spark.stop()
  }
}
