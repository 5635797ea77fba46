package graft.dedup

import org.apache.spark.sql.SparkSession

/** Lifecycle and safety for RELIABLE `checkpoint()` mode (the
  * real-cluster path of [[Dedup.connectedComponents]] and
  * `Similarity.kmeansRefine`).
  *
  * Two problems this owns, both consequences of the checkpoint dir
  * being SparkContext-GLOBAL state:
  *
  *  1. Conflict safety: two CONCURRENT iterative invocations pointing
  *     the context at different dirs race — one caller's rounds land in
  *     the other's directory, and a cleanup of that directory deletes
  *     live round files. [[acquire]] tracks in-flight reliable
  *     invocations in this JVM: a request for a different dir while one
  *     is active THROWS; re-pointing while idle is legal (sequential
  *     callers with private temp dirs) but logged loudly because it
  *     mutates global state.
  *  2. Round-file lifetime: Spark's context cleaner does not remove
  *     reliable checkpoint files; they accumulate for the run's
  *     lifetime. [[withReliableCheckpoints]] scopes that: the body runs
  *     with the dir acquired, and the round files are deleted when the
  *     scope exits. The body MUST consume (collect/write) every frame
  *     that went through a checkpoint before returning — the returned
  *     plan of a checkpointed frame is a SCAN OF THOSE FILES, so
  *     reading it after the scope fails. One scope per dir at a time;
  *     the scope deletes the dir even on failure.
  */
object ReliableCheckpoints {
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private final case class State(dir: String, refs: Int)
  private val state =
    new java.util.concurrent.atomic.AtomicReference[State](State("", 0))

  /** `dir` as the filesystem-qualified URI string the context stores
    * (modulo the per-context UUID subdir setCheckpointDir appends). */
  private def qualify(spark: SparkSession, dir: String): String = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(p).toString
  }

  /** Register a reliable-mode invocation on `dir` and point the
    * SparkContext there. Throws if another invocation is in flight on a
    * different dir (see class doc); pair with [[release]] in a finally. */
  def acquire(spark: SparkSession, dir: String): Unit = {
    val q = qualify(spark, dir)
    while (true) {
      val s = state.get()
      if (s.refs > 0 && s.dir != q)
        throw new IllegalStateException(
          s"reliable checkpoint dir conflict: ${s.refs} active invocation(s) " +
            s"on ${s.dir}, refusing to re-point the SparkContext-global " +
            s"checkpoint dir to $q — concurrent callers must share one dir")
      val next = if (s.dir == q) s.copy(refs = s.refs + 1) else State(q, 1)
      if (state.compareAndSet(s, next)) {
        val sc = spark.sparkContext
        val cur = sc.getCheckpointDir
        // the stored value is <qualified dir>/<uuid>, so prefix-match
        if (!cur.exists(c => c == q || c.startsWith(q + "/"))) {
          cur.foreach(c => log.warn(
            s"re-pointing SparkContext checkpoint dir from $c to $q " +
              "(no reliable-mode invocation was active)"))
          sc.setCheckpointDir(dir)
        }
        return
      }
    }
  }

  /** Unregister one invocation registered by [[acquire]]. */
  def release(): Unit = {
    state.updateAndGet(s => s.copy(refs = math.max(0, s.refs - 1)))
    ()
  }

  /** Scoped reliable-checkpoint lifecycle: acquires `dir`, runs `body`
    * (which receives the dir, ready to pass as `checkpointDir =
    * Some(dir)`), and deletes the accumulated round files on exit —
    * success or failure. The body must consume every checkpointed frame
    * before returning (class doc). */
  def withReliableCheckpoints[A](spark: SparkSession, dir: String)
                                (body: String => A): A = {
    acquire(spark, dir)
    try body(dir)
    finally {
      release()
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
      ()
    }
  }
}
