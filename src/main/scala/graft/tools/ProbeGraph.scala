package graft.tools

import graft.{GraftSession, Warehouse}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B probe for the iterative-graph job-floor hypothesis: the same
  * pageRank call timed with AQE on (session default) vs off for the
  * query, interleaved reps. AQE materializes every shuffle stage as its
  * own scheduler job — an 8-round PageRank pays ~46 jobs; with static
  * planning the rounds between checkpoints chain into single jobs.
  */
object ProbeGraph {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val s = GraftSession.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")

    def edges(sym: Boolean): DataFrame = {
      val o = Warehouse(s, dir).loadTable("orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val l = Warehouse(s, dir).loadTable("lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
      val e = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"), (col("l_suppkey") + 1000000L).as("dst"))
      if (sym) e.union(e.select(col("dst").as("src"), col("src").as("dst"))) else e
    }

    val jobs = new java.util.concurrent.atomic.AtomicLong
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        { jobs.incrementAndGet(); () }
    })
    def gcMs(): Long = {
      var t = 0L
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .forEach(b => t += b.getCollectionTime)
      t
    }
    def runPr(): Double = {
      val j0 = jobs.get; val g0 = gcMs()
      val t0 = System.nanoTime()
      graft.operators.Graph.pageRank(edges(sym = true), "src", "dst", iters = 8)
        .orderBy("node")
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      println(f"    jobs=${jobs.get - j0}%d gc=${gcMs() - g0}%d ms t=$dt%.2f")
      dt
    }

    // warmup
    try Warehouse(s, dir).loadTable("orders").write.format("noop")
      .mode("overwrite").save()
    catch { case _: Throwable => () }
    runPr()

    val a = scala.collection.mutable.ArrayBuffer[Double]()
    val b = scala.collection.mutable.ArrayBuffer[Double]()
    var r = 0
    while (r < reps) {
      s.conf.set("spark.sql.adaptive.enabled", "true")
      a += runPr()
      s.conf.set("spark.sql.adaptive.enabled", "false")
      b += runPr()
      s.conf.set("spark.sql.adaptive.enabled", "true")
      println(f"rep$r aqeOn=${a.last}%.2f aqeOff=${b.last}%.2f")
      r += 1
    }
    println(f"median aqeOn=${a.sorted.apply(reps / 2)}%.2f " +
      f"aqeOff=${b.sorted.apply(reps / 2)}%.2f")
    s.stop()
  }
}
