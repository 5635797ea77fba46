package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Pipelines

/** One-shot crash-replay probe: write a micro-batch through the bronze
  * sink, delete its commit marker (crash-after-write), restart the query
  * from the same checkpoint so Spark redelivers the batch, and verify
  * the landed row count is unchanged (idempotent) not doubled. */
object ReplayProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val dir = Files.createTempDirectory("replay_probe").toString
    val ckpt = s"$dir/ckpt"
    val data = s"$dir/data"
    val ts = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")

    val in = MemoryStream[(Long, java.sql.Timestamp)]
    in.addData((1L, ts), (2L, ts))
    val q1 = Pipelines.bronzeSink(in.toDF().toDF("v", "ts"), data, ckpt, "ts").start()
    q1.processAllAvailable(); q1.stop()
    val n1 = spark.read.parquet(data).count()
    println(s"[probe] rows after first run: $n1")

    // crash simulation: the write happened but the commit marker didn't
    val commit = Paths.get(s"$ckpt/commits/0")
    val crc = Paths.get(s"$ckpt/commits/.0.crc")
    println(s"[probe] deleting commit marker: ${Files.deleteIfExists(commit)}" +
      s" crc: ${Files.deleteIfExists(crc)}")

    val in2 = MemoryStream[(Long, java.sql.Timestamp)]
    in2.addData((1L, ts), (2L, ts)) // same offsets get redelivered
    val q2 = Pipelines.bronzeSink(in2.toDF().toDF("v", "ts"), data, ckpt, "ts").start()
    q2.processAllAvailable(); q2.stop()
    val n2 = spark.read.parquet(data).count()
    println(s"[probe] rows after replayed batch: $n2")
    println(if (n2 == n1) "[probe] IDEMPOTENT: replay did not duplicate"
            else s"[probe] FAILED: $n1 -> $n2")
    spark.stop()
    if (n2 != n1) sys.exit(1)
  }
}
