package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.{GraftSession, Warehouse}

/** One-off A/B probe for the r10 HITS phase-materialization change:
  * times the committed [[graft.operators.Graph.hits]] (raw phase sums
  * checkpointed, lazy rescale) against the r9 shape (normalize then
  * checkpoint, recomputing the edge join for the broadcast-max job) on
  * the q_hits trade graph, interleaved A/B/A/B so box drift hits both.
  */
object ProbeHits {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder(master = Some("local[32]")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wh = Warehouse(spark, dir)
    val o = wh.loadTable("orders").select(col("o_orderkey"), col("o_custkey"))
    val l = wh.loadTable("lineitem").select(col("l_orderkey"), col("l_suppkey"))
    val edges = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"), (col("l_suppkey") + 1000000L).as("dst"))

    def oldHits(iters: Int): DataFrame = {
      val scale = 1000000L
      val e = edges
        .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
        .where(col("src").isNotNull && col("dst").isNotNull)
        .distinct().repartition(col("src")).persist(StorageLevel.MEMORY_AND_DISK)
      val nodes = e.select(col("src").as("node")).union(e.select(col("dst").as("node")))
        .distinct().persist(StorageLevel.MEMORY_AND_DISK)
      def normalized(raw: DataFrame): DataFrame =
        raw.crossJoin(broadcast(raw.agg(max(col("s")).as("__m"))))
          .select(col("node"), expr(
            s"CAST((CAST(s AS decimal(38,0)) * $scale) div __m AS long)").as("v"))
          .localCheckpoint(true)
      var h = nodes.select(col("node"), lit(scale).as("v")).localCheckpoint(true)
      var a: DataFrame = null
      var i = 0
      while (i < iters) {
        a = normalized(e.join(h.withColumnRenamed("node", "src"), "src")
          .groupBy(col("dst").as("node")).agg(sum(col("v")).as("s")))
        h = normalized(e.join(a.withColumnRenamed("node", "dst"), "dst")
          .groupBy(col("src").as("node")).agg(sum(col("v")).as("s")))
        i += 1
      }
      val out = h.select(col("node"), col("v").as("hub"))
        .join(a.select(col("node"), col("v").as("authority")), Seq("node"), "full_outer")
        .select(col("node"), coalesce(col("hub"), lit(0L)).as("hub"),
          coalesce(col("authority"), lit(0L)).as("authority"))
      out.count(); e.unpersist(); nodes.unpersist()
      out
    }

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    def bothHits(iters: Int): DataFrame = {
      val scale = 1000000L
      val e = edges
        .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
        .where(col("src").isNotNull && col("dst").isNotNull)
        .distinct().repartition(col("src")).persist(StorageLevel.MEMORY_AND_DISK)
      val nodes = e.select(col("src").as("node")).union(e.select(col("dst").as("node")))
        .distinct().persist(StorageLevel.MEMORY_AND_DISK)
      def normalized(rawPlan: DataFrame): DataFrame = {
        val raw = rawPlan.localCheckpoint(true)
        raw.crossJoin(broadcast(raw.agg(max(col("s")).as("__m"))))
          .select(col("node"), expr(
            s"CAST((CAST(s AS decimal(38,0)) * $scale) div __m AS long)").as("v"))
          .localCheckpoint(true)
      }
      var h = nodes.select(col("node"), lit(scale).as("v")).localCheckpoint(true)
      var a: DataFrame = null
      var i = 0
      while (i < iters) {
        a = normalized(e.join(h.withColumnRenamed("node", "src"), "src")
          .groupBy(col("dst").as("node")).agg(sum(col("v")).as("s")))
        h = normalized(e.join(a.withColumnRenamed("node", "dst"), "dst")
          .groupBy(col("src").as("node")).agg(sum(col("v")).as("s")))
        i += 1
      }
      val out = h.select(col("node"), col("v").as("hub"))
        .join(a.select(col("node"), col("v").as("authority")), Seq("node"), "full_outer")
        .select(col("node"), coalesce(col("hub"), lit(0L)).as("hub"),
          coalesce(col("authority"), lit(0L)).as("authority"))
      out.count(); e.unpersist(); nodes.unpersist()
      out
    }
    (1 to 3).foreach { r =>
      time(s"new  hits rep$r") {
        graft.operators.Graph.hits(edges, "src", "dst", iters = 8).count(): Unit
      }
      time(s"old  hits rep$r") { oldHits(8): Unit }
      time(s"both hits rep$r") { bothHits(8): Unit }
    }
    spark.stop()
  }
}
