package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{GraftSession, Warehouse}

/** Interleaved A/B probe for the iterative-family round-2 candidates
  * (OPTIMIZATION_r12 "Not yet optimized" item 1): the same pageRank /
  * weighted / personalized call at checkpointInterval 4 (committed
  * default) vs 8 (one un-truncated chain for the 8-iter bench calls).
  * Rep loop outer, variants inner — the r10 ProbeHits lesson: sequential
  * per-variant timing fabricates differences from box drift.
  *
  * Usage: runMain graft.tools.ProbeIter <sfDir> <reps>
  */
object ProbeIter {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 5
    val s = GraftSession.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")

    val jobs = new java.util.concurrent.atomic.AtomicLong
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        { jobs.incrementAndGet(); () }
    })

    def wh = Warehouse(s, dir)
    def tradeEdges(sym: Boolean): DataFrame = {
      val o = wh.loadTable("orders").select(col("o_orderkey"), col("o_custkey"))
      val l = wh.loadTable("lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val e = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"), (col("l_suppkey") + 1000000L).as("dst"))
      if (sym) e.union(e.select(col("dst").as("src"), col("src").as("dst"))) else e
    }
    def weightedEdges: DataFrame = {
      val o = wh.loadTable("orders").select(col("o_orderkey"), col("o_custkey"))
      val l = wh.loadTable("lineitem").select(col("l_orderkey"), col("l_suppkey"))
      o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey").as("src"), (col("l_suppkey") + 1000000L).as("dst"))
        .agg(count(lit(1)).as("w"))
    }
    def seeds: DataFrame =
      wh.loadTable("customer").filter(col("c_nationkey") === 1).select(col("c_custkey"))

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "pr_ci4" -> (() => graft.operators.Graph.pageRank(
        tradeEdges(sym = true), "src", "dst", iters = 8, checkpointInterval = 4)),
      "pr_ci8" -> (() => graft.operators.Graph.pageRank(
        tradeEdges(sym = true), "src", "dst", iters = 8, checkpointInterval = 8)),
      "prw_ci4" -> (() => graft.operators.Graph.pageRankWeighted(
        weightedEdges, "src", "dst", "w", iters = 8, checkpointInterval = 4)),
      "prw_ci8" -> (() => graft.operators.Graph.pageRankWeighted(
        weightedEdges, "src", "dst", "w", iters = 8, checkpointInterval = 8)),
      "ppr_ci4" -> (() => graft.operators.Graph.personalizedPageRank(
        tradeEdges(sym = true), "src", "dst", seeds, "c_custkey", iters = 8,
        checkpointInterval = 4)),
      "ppr_ci8" -> (() => graft.operators.Graph.personalizedPageRank(
        tradeEdges(sym = true), "src", "dst", seeds, "c_custkey", iters = 8,
        checkpointInterval = 8)))

    def run(name: String, f: () => DataFrame): Double = {
      s.sparkContext.setJobDescription(name)
      val j0 = jobs.get
      val t0 = System.nanoTime()
      f().orderBy("node").write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      println(f"    $name jobs=${jobs.get - j0}%d t=$dt%.2f")
      dt
    }

    // warmup
    try wh.loadTable("orders").write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    run("warmup", variants.head._2)

    val times = scala.collection.mutable.LinkedHashMap[String, Vector[Double]]()
    variants.foreach { case (n, _) => times(n) = Vector() }
    (1 to reps).foreach { r =>
      variants.foreach { case (n, f) =>
        val t = run(n, f)
        times(n) = times(n) :+ t
        println(f"rep$r $n $t%.3f")
      }
    }
    val load1m = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    println(f"load1m=$load1m%.2f")
    times.foreach { case (n, ts0) =>
      val ts = ts0.sorted
      val med =
        if (ts.size % 2 == 1) ts(ts.size / 2)
        else (ts(ts.size / 2 - 1) + ts(ts.size / 2)) / 2.0
      println(f"MEDIAN $n $med%.3f spread ${ts.last - ts.head}%.3f")
    }
    s.stop()
  }
}
