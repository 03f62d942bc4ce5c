package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: executes every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Measurement rules (each fixes a way to accidentally benchmark nothing):
  *  - execute via a noop-format sink, not count(): under a count Catalyst
  *    prunes computed columns/sorts and a projection query degenerates to a
  *    bare scan;
  *  - a warmup query runs first so the session/codegen startup cost (~5 s)
  *    is not charged to the first measured query;
  *  - failures are NOT swallowed into fast timings — a failed query reports
  *    -1 and its error class in the "errors" object;
  *  - each query runs SPARK_GRAFT_BENCH_REPS times (default 3) and reports
  *    the per-query MEDIAN plus max-min spread: a single-shot wall clock on
  *    a loaded machine can fabricate a 60% regression on unchanged code
  *    (observed round 3), a median of 3 cannot — and the spread makes any
  *    residual contamination visible in the artifact itself.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    val spark = GraftSession
      .builder(master = Some(s"local[$cpus]"), shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def runNoop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // Warmup: pay JVM/codegen/scheduler startup outside the measured loop.
    try runNoop(SparkEntry.queries("q1_pricing_summary")(spark, sfDir))
    catch { case _: Throwable => () }
    // Fixture setup outside measurement: q_join_bucketed's FIRST call per
    // session writes the bucketed tables (one-time, like a nightly bucket
    // job); building the query here makes the measured entry time the
    // no-shuffle join itself, which is the thing the fixture demonstrates.
    try runNoop(SparkEntry.queries("q_join_bucketed")(spark, sfDir))
    catch { case _: Throwable => () }

    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // (name, median, max-min spread); a query that fails in ANY rep reports
    // -1 and skips its remaining reps.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = scala.collection.mutable.ArrayBuffer[Double]()
      var failed = false
      var r = 0
      while (r < reps && !failed) {
        val t0 = System.nanoTime()
        try { runNoop(fn(spark, sfDir)); times += (System.nanoTime() - t0) / 1e9 }
        catch {
          case e: Throwable =>
            errors(name) = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}"
            failed = true
        }
        r += 1
      }
      if (failed) (name, -1.0, -1.0)
      else {
        val sorted = times.sorted
        val median =
          if (sorted.size % 2 == 1) sorted(sorted.size / 2)
          else (sorted(sorted.size / 2 - 1) + sorted(sorted.size / 2)) / 2.0
        (name, median, sorted.last - sorted.head)
      }
    }

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val qs = results.map { case (k, v, _) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val spreads = results.map { case (k, _, s) => s"${jstr(k)}:${math.rint(s * 1000) / 1000}" }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = results.collect { case (_, v, _) if v >= 0 => v }.sum
    // The JSON line is the whole point of this main — print it alone on
    // stdout (build.sbt routes forked stdout through unwrapped).
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"reps":$reps,"spread":$spreads,"errors":$errJson,"n_failed":${errors.size},"sf":${jstr(sfDir)}}""")
    spark.stop()
  }
}
