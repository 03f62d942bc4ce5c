package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.{GraftSession, Warehouse}

/** Interleaved A/B probe for the r13 optimization candidates, each timed
  * against an inline copy of the committed r12 shape (rep loop outer,
  * variants inner — the standing box-drift discipline; lead with the
  * deterministic job counter, decide on interleaved medians):
  *
  *  1. hits_r12 (two eager checkpoints + broadcast job per phase) vs
  *     hits_r13 (Graph.hits — round-fused, one eager action per round);
  *     also asserts the two outputs are row-identical.
  *  2. assocm_r12 (llr_u20 + metrics computed on every support>=2 pair
  *     BELOW the topK limit) vs assocm_r13 (Stats.associationFromStore —
  *     metrics above the limit) over one pre-built saved store;
  *     row-identical assertion included.
  *  3. bpetrain_r12 (literal-interpolated fold, eager checkpoints incl.
  *     the never-read final one) vs bpetrain_r13 (Bpe.trainDistributed —
  *     broadcast-param fold, lazy checkpoints); merge-table equality
  *     asserted.
  *
  * Usage: runMain graft.tools.ProbeR13 <sfDir> <reps> [variant...]
  */
object ProbeR13 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val only = args.drop(2).toSet
    val s = GraftSession.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._

    val jobs = new java.util.concurrent.atomic.AtomicLong
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        { jobs.incrementAndGet(); () }
    })

    def wh = Warehouse(s, dir)
    def tradeEdges: DataFrame = {
      val o = wh.loadTable("orders").select(col("o_orderkey"), col("o_custkey"))
      val l = wh.loadTable("lineitem").select(col("l_orderkey"), col("l_suppkey"))
      o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"), (col("l_suppkey") + 1000000L).as("dst"))
    }

    // ---- 1. HITS: inline copy of the r12 shape ----
    def hitsR12(edges: DataFrame, iters: Int): DataFrame = {
      val scale = 1000000L
      val e = edges
        .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
        .where(col("src").isNotNull && col("dst").isNotNull)
        .distinct().persist(StorageLevel.MEMORY_AND_DISK)
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
        a = normalized(e.join(h.withColumnRenamed("node", "src"), Seq("src"))
          .groupBy(col("dst").as("node")).agg(sum(col("v")).as("s")))
        h = normalized(e.join(a.withColumnRenamed("node", "dst"), Seq("dst"))
          .groupBy(col("src").as("node")).agg(sum(col("v")).as("s")))
        i += 1
      }
      val out = nodes
        .join(a.withColumnRenamed("v", "authority_e6"), Seq("node"), "left")
        .join(h.withColumnRenamed("v", "hub_e6"), Seq("node"), "left")
        .select(col("node"),
          coalesce(col("authority_e6"), lit(0L)).as("authority_e6"),
          coalesce(col("hub_e6"), lit(0L)).as("hub_e6"))
        .localCheckpoint(true)
      e.unpersist(); nodes.unpersist()
      out
    }

    // ---- 2. association metric stage: inline copy of the r12 shape ----
    def assocMetricsR12(store: DataFrame, minSupport: Long, topK: Int): DataFrame = {
      val pairs = store.filter(col("kind") === "p")
        .select(col("a").as("item_a"), col("b").as("item_b"),
          col("cnt").as("pair_count"))
        .filter(col("pair_count") >= minSupport)
      val ic = store.filter(col("kind") === "i")
        .select(col("a").as("it"), col("cnt"))
      val nB = store.filter(col("kind") === "n")
        .select(col("cnt").as("n_baskets"))
      pairs
        .join(ic.select(col("it").as("item_a"), col("cnt").as("count_a")),
          Seq("item_a"))
        .join(ic.select(col("it").as("item_b"), col("cnt").as("count_b")),
          Seq("item_b"))
        .crossJoin(broadcast(nB))
        .withColumn("conf_ab_e6", expr("pair_count * 1000000 div count_a"))
        .withColumn("conf_ba_e6", expr("pair_count * 1000000 div count_b"))
        .withColumn("lift_e6", expr(
          "CAST((CAST(pair_count AS decimal(38,0)) * n_baskets * 1000000) div " +
            "(CAST(count_a AS decimal(38,0)) * count_b) AS long)"))
        .withColumn("llr_u20", graft.operators.Stats.llrU20(store.sparkSession,
          col("pair_count"), col("count_a"), col("count_b"),
          col("n_baskets"), nullAboveN = true))
        .orderBy(col("pair_count").desc, col("item_a"), col("item_b"))
        .limit(topK)
        .select("item_a", "item_b", "pair_count", "count_a", "count_b",
          "n_baskets", "conf_ab_e6", "conf_ba_e6", "lift_e6", "llr_u20")
    }

    // ---- 3. BPE train: inline copy of the r12 shape ----
    def mergeExprLit(l: String, r: String): String =
      s"""aggregate(slice(__s, 2, greatest(size(__s) - 1, 0)),
         |  struct(element_at(__s, 1) AS s, element_at(__s, 1) AS t),
         |  (acc, x) -> IF(acc.t = '$l' AND x = '$r',
         |    struct(concat(substr(acc.s, 1, length(acc.s) - length(acc.t)), '$l$r') AS s,
         |           '$l$r' AS t),
         |    struct(concat(acc.s, ' ', x) AS s, x AS t)),
         |  acc -> acc.s)""".stripMargin
    def bpeTrainR12(docs: DataFrame, textCol: String, numMerges: Int): Seq[(Long, String, String, Long)] = {
      var words = docs
        .select(explode(
          expr(s"regexp_extract_all(lower(`$textCol`), '[a-z0-9]+', 0)")).as("__w"))
        .groupBy("__w").agg(count(lit(1)).as("f"))
        .select(expr("array_join(regexp_extract_all(__w, '.', 0), ' ')").as("w"),
          col("f"))
        .localCheckpoint(true)
      val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
      var k = 1
      while (k <= numMerges) {
        val best = words
          .withColumn("__s", split(col("w"), " "))
          .select(explode(expr(
            """zip_with(slice(__s, 1, greatest(size(__s) - 1, 0)),
              |         slice(__s, 2, greatest(size(__s) - 1, 0)),
              |         (a, b) -> struct(a AS l, b AS r))""".stripMargin)).as("p"),
            col("f"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("f")).as("c"))
          .orderBy(col("c").desc, col("l").asc, col("r").asc)
          .limit(1).collect()
        val (l, r, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((k.toLong, l, r, c))
        val merged = words
          .withColumn("__s", split(col("w"), " "))
          .select(expr(mergeExprLit(l, r)).as("w"), col("f"))
        words =
          if (k % 4 == 0 || k == numMerges) merged.localCheckpoint(true) else merged
        k += 1
      }
      merges.toSeq
    }

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // shared fixtures (outside measurement)
    val docs = wh.loadTable("documents")
    val tmp = java.nio.file.Files.createTempDirectory("probe_r13_").toString
    val li = wh.loadTable("lineitem").select("l_orderkey", "l_partkey")
    val wt = Warehouse(s, tmp)
    wt.saveTable(graft.operators.Stats.associationStore(li, "l_orderkey", "l_partkey"),
      tmp, "assoc_store")
    val store = wt.loadTable("assoc_store")

    // one-time equivalence assertions (outside measurement)
    val hitsOld = hitsR12(tradeEdges, 8)
    val hitsNew = graft.operators.Graph.hits(tradeEdges, "src", "dst", iters = 8)
    val hDiff = hitsOld.exceptAll(hitsNew).count() + hitsNew.exceptAll(hitsOld).count()
    println(s"EQUIV hits rows-diff=$hDiff")
    val amOld = assocMetricsR12(store, 2L, 100)
    val amNew = graft.operators.Stats.associationFromStore(store, 2L, 100)
    val aDiff = amOld.exceptAll(amNew).count() + amNew.exceptAll(amOld).count()
    println(s"EQUIV assoc rows-diff=$aDiff")
    val mOld = bpeTrainR12(docs, "text", 16)
    val mNew = graft.operators.Bpe.trainDistributed(docs, "text", numMerges = 16)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    println(s"EQUIV bpe merges-equal=${mOld == mNew}")

    val variants: Seq[(String, () => Unit)] = Seq(
      "hits_r12" -> (() => noop(hitsR12(tradeEdges, 8))),
      "hits_r13" -> (() => noop(graft.operators.Graph.hits(tradeEdges, "src", "dst", iters = 8))),
      "assocm_r12" -> (() => noop(assocMetricsR12(store, 2L, 100))),
      "assocm_r13" -> (() => noop(graft.operators.Stats.associationFromStore(store, 2L, 100))),
      "bpetrain_r12" -> (() => { bpeTrainR12(docs, "text", 16); () }),
      "bpetrain_r13" -> (() => { graft.operators.Bpe.trainDistributed(docs, "text", 16).collect(); () })
    ).filter { case (n, _) => only.isEmpty || only.exists(n.startsWith) }

    val times = scala.collection.mutable.LinkedHashMap[String, Vector[Double]]()
    variants.foreach { case (n, _) => times(n) = Vector() }
    (1 to reps).foreach { r =>
      variants.foreach { case (n, f) =>
        val j0 = jobs.get
        val t0 = System.nanoTime()
        f()
        val dt = (System.nanoTime() - t0) / 1e9
        times(n) = times(n) :+ dt
        println(f"rep$r%d $n%s ${dt}%.3f jobs=${jobs.get - j0}%d")
      }
    }
    val load1m = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    println(f"load1m=$load1m%.2f")
    times.foreach { case (n, ts0) =>
      if (ts0.nonEmpty) {
        val ts = ts0.sorted
        val med =
          if (ts.size % 2 == 1) ts(ts.size / 2)
          else (ts(ts.size / 2 - 1) + ts(ts.size / 2)) / 2.0
        println(f"MEDIAN $n%s ${med}%.3f spread ${ts.last - ts.head}%.3f")
      }
    }
    s.stop()
  }
}
