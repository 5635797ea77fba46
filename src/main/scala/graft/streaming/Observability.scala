package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** A9: progress metrics — the engine-native replacement for the
  * reference's hand-rolled counters (`consumers/db_writer.py:55-73`
  * `count % 1000` logging, `user_positions_tracker.py:79-105`
  * published_count). A StreamingQueryListener accumulates per-query row
  * counts and batch counts from the progress events Spark already emits;
  * no per-row instrumentation in the hot path. */
final class ProgressCounters extends StreamingQueryListener {
  val rowsByQuery = new ConcurrentHashMap[String, AtomicLong]()
  val batchesByQuery = new ConcurrentHashMap[String, AtomicLong]()

  private def counter(m: ConcurrentHashMap[String, AtomicLong], k: String): AtomicLong =
    m.computeIfAbsent(k, _ => new AtomicLong())

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val name = Option(event.progress.name).getOrElse(event.progress.id.toString)
    counter(rowsByQuery, name).addAndGet(event.progress.numInputRows)
    counter(batchesByQuery, name).incrementAndGet()
    ()
  }
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  def rows(name: String): Long =
    Option(rowsByQuery.get(name)).map(_.get()).getOrElse(0L)
  def batches(name: String): Long =
    Option(batchesByQuery.get(name)).map(_.get()).getOrElse(0L)
}

object Observability {
  /** Register a fresh counter set on the session; returns it for reads. */
  def attach(spark: SparkSession): ProgressCounters = {
    val c = new ProgressCounters
    spark.streams.addListener(c)
    c
  }
}
