package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line. A warm-up query runs untimed first so JVM/
  * codegen warm-up isn't charged to the first timed query; per-query
  * status is reported and any failure exits nonzero (a broken query must
  * never make the bench look faster). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
    // fail FAST on a short-code clash (before any query runs), not at
    // report time after the whole suite's wall-clock has been spent
    require(queries.map(q => q._1.takeWhile(_ != '_')).distinct.size == queries.size,
      "query short codes must stay unique — rename the clashing query")
    // warm-up: exercise scan + shuffle + codegen paths once, untimed
    try SparkEntry.queries("q1_pricing_summary")(spark, sfDir).count()
    catch { case _: Throwable => () }
    // queries whose wall-clock is a sequence of driver-blocking rounds
    // (iterative checkpoint+count loops) get the median-of-3 policy below
    val iterative = Set("x23_neardup_clusters", "x46_keep_best")
    val results = queries.map { case (name, fn) =>
      // toRdd.count() forces full evaluation of the physical plan —
      // df.count() would let Catalyst prune every projected column and
      // under-measure pure-projection queries as a metadata row count.
      // Best-of-2 guards against ambient load on a shared host.
      def once(): (Double, Boolean) = {
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).queryExecution.toRdd.count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
          }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      // clear between runs, not just between queries: CacheManager
      // dedupes identical plans, so run 2 would otherwise read run 1's
      // materialized persist() caches and best-of-2 would report
      // warm-cache time for every persist-using query. Intra-RUN reuse
      // (a self-join reading its own persist) is part of the query and
      // stays. This also bounds cross-query cache accumulation.
      if (iterative(name)) {
        // median-of-3 for driver-blocking ITERATIVE queries: their many
        // checkpoint+count rounds each sample ambient host load, so the
        // per-rep spread is wide in BOTH directions (x23 measured
        // 3.3–5.0 s across identical-code runs, PLANS.md) — min() would
        // report an unrepresentative lucky run, a single rep a noisy
        // one; the median pins the reported value to ~1.3× across runs
        // same fail-fast contract as the best-of-2 branch: a broken
        // iterative query (the slowest in the suite) must not run its
        // multi-minute failure three times before signaling
        val reps = scala.collection.mutable.ArrayBuffer.empty[(Double, Boolean)]
        var go = true
        while (go && reps.size < 3) {
          val r = once(); spark.catalog.clearCache()
          reps += r
          go = r._2
        }
        System.gc()
        if (reps.exists(!_._2)) (name, reps.map(_._1).max, false)
        else (name, reps.map(_._1).sorted.apply(1), true)
      } else {
        val (t1, ok1) = once()
        spark.catalog.clearCache()
        val (t2, ok2) = if (ok1) once() else (t1, ok1)
        spark.catalog.clearCache()
        // shared-host noise hygiene (r5→r6 evidence in PLANS.md): when the
        // two reps disagree by >1.5× one of them was ambient load, not the
        // query — take a tiebreaker rep so min() has two honest samples.
        // Sub-second queries get the third rep unconditionally: they are
        // the ones where a single descheduled thread doubles the reading
        // (measured cross-run, PLANS.md), and an extra rep costs <1 s.
        // The inter-query System.gc() keeps one query's garbage from
        // being charged to the next query's first rep.
        val discordant = math.max(t1, t2) > 1.5 * math.min(t1, t2)
        val (t3, ok3) =
          if (ok2 && (discordant || math.min(t1, t2) < 1.0)) {
            val r = once(); spark.catalog.clearCache(); r
          } else (math.min(t1, t2), ok1 && ok2)
        System.gc()
        (name, math.min(math.min(t1, t2), t3), ok1 && ok2 && ok3)
      }
    }
    // The driver keeps only a ~2000-char tail of stdout; the JSON line must
    // fit inside it or it can never be parsed. 2-decimal per-query times
    // (1 decimal loses all regression signal on the many sub-50 ms
    // queries) stay, but with 74 queries the full names alone blew the
    // budget — keys are now each query's UNIQUE short code (the prefix
    // before the first '_': "x29_dup_ngrams" → "x29"), which prefix-maps
    // back to SparkEntry.queries 1:1; the length check below warns
    // before the budget is actually blown.
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def f2(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    def code(name: String): String = name.takeWhile(_ != '_')
    val qs = results.map { case (k, v, _) => "\"" + code(k) + "\":" + f2(v) }
      .mkString("{", ",", "}")
    // cap the list so a mass failure can't push the JSON line past the
    // 2000-char tail (rc=1 still signals the failure either way)
    val failedAll = results.collect { case (k, _, false) => code(k) }
    val failed = (failedAll.take(5).map("\"" + _ + "\"") ++
      (if (failedAll.size > 5) Seq("\"+" + (failedAll.size - 5) + " more\"") else Nil))
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    // name the statistic each number is (ADVICE r9): queries listed in
    // "median3" report median-of-3; everything else reports min-of-reps.
    // A compact policy map, not a per-query field — the JSON line must
    // fit the driver's ~2000-char stdout tail
    val policy = "{\"default\":\"min\",\"median3\":" +
      results.collect { case (k, _, _) if iterative(k) => "\"" + code(k) + "\"" }
        .mkString("[", ",", "]") + "}"
    val line = s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"failed":$failed,"policy":$policy,"sf":"$sfDir"}"""
    if (line.length > 1850)
      System.err.println(s"[bench] WARNING: JSON line ${line.length} chars — " +
        "approaching the driver's 2000-char stdout tail; shorten names/precision")
    println(line)
    spark.stop()
    if (results.exists(!_._3)) sys.exit(1)
  }
}
