package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{GraftSession, Warehouse}
import graft.operators.Stats

/** Isolated 500k-tier measurement for the round-12 additions
  * (l-diversity, quantile stores global + grouped, llrU20 through
  * associationFromStore, forgetAndRewrite) — the ProbeNew discipline:
  * fully synthetic deterministic inputs, two alternated reps, noop
  * sink. Not part of the library surface.
  *
  * Shapes measured:
  *  - values: 500k doubles over 10 groups — both quantile stores pay
  *    one corpus groupBy; the quantile read runs over the ≤ nBins (or
  *    groups × nBins) store only.
  *  - quasi/sensitive: 500k rows, 5k quasi classes × a 17-value
  *    sensitive — lDiversityClasses is one distinct-count groupBy.
  *  - baskets: 100k baskets × ~6 items over a 2k catalog — the LLR
  *    column rides the existing associationFromStore plan (four ilog2
  *    kernel calls per surviving pair, pairs bounded by topK's input).
  *  - versioned table: 3 versions × 1.5M rows, 1k-key erasure —
  *    forgetAndRewrite pays one anti-join + one audit count pass +
  *    one short-circuit semi-join probe per prior version.
  */
object ProbeR12 {
  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toLong).getOrElse(500000L)
    val spark = GraftSession
      .builder(master = Some("local[32]"), shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.ensure(spark)

    def time[A](name: String)(f: => A): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    def drain(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val ids = spark.range(nRows).toDF("id").repartition(32).persist()
    println(s"rows: ${ids.count()}")

    val vals = ids.select(col("id"),
        expr("concat('g', pmod(xxhash64(id, 1), 10))").as("g"),
        expr("CAST(pmod(xxhash64(id, 2), 600000) AS double) / 100.0")
          .as("v"))
      .persist()
    vals.count()

    val quasi = ids.select(
        expr("pmod(xxhash64(id, 3), 100)").as("qa"),
        expr("pmod(xxhash64(id, 4), 50)").as("qb"),
        expr("concat('s', pmod(xxhash64(id, 5), 17))").as("sens"))
      .persist()
    quasi.count()

    val docs = ids.select(col("id").as("doc_id"),
      concat_ws(" ",
        expr("transform(sequence(0, 15), " +
          "i -> concat('w', pmod(xxhash64(id, i), 500)))")).as("text"))
      .persist()
    docs.count()

    val baskets = ids.limit(600000).select(
        expr("pmod(xxhash64(id, 6), 100000)").as("bk"),
        expr("pmod(xxhash64(id, 7), 2000)").as("it"))
      .persist()
    baskets.count()

    (1 to 2).foreach { rep =>
      time(s"rep$rep quantile store (hist 500k + read, 200 bins)") {
        drain(Stats.quantilesFromHistogramStore(
          Stats.histogramStore(vals, "v", 0.0, 6000.0, 200),
          0.0, 6000.0, 200, Seq(500000L, 900000L, 990000L)))
      }
      time(s"rep$rep grouped quantile store (10 groups x 200 bins)") {
        drain(Stats.groupedQuantilesFromStore(
          Stats.groupedHistogramStore(vals, "g", "v", 0.0, 6000.0, 200),
          0.0, 6000.0, 200, Seq(500000L, 900000L, 990000L)))
      }
      time(s"rep$rep lDiversityClasses (5k classes, 17-value sensitive)") {
        drain(Stats.lDiversityClasses(quasi, Seq("qa", "qb"), "sens", 3L))
      }
      time(s"rep$rep associationPairs + llr_u20 (100k baskets)") {
        drain(Stats.associationPairs(baskets, "bk", "it",
          minSupport = 2L, topK = 100))
      }
      time(s"rep$rep collocations + llr_u20 (500k 16-word docs)") {
        drain(graft.operators.TextAnalysis.collocations(docs, "text"))
      }
      time(s"rep$rep winsorize off the 200-bin store (500k values)") {
        drain(Stats.winsorizeByHistogramStore(vals, "v",
          Stats.histogramStore(vals, "v", 0.0, 6000.0, 200),
          0.0, 6000.0, 200, 10000L, 990000L))
      }
    }

    // forgetAndRewrite: its own scratch warehouse, 3 versions x 3x rows
    val tmp = java.nio.file.Files.createTempDirectory("graft_probe_rtbf")
      .toString
    val w = Warehouse(spark, tmp)
    val big = spark.range(nRows * 3).toDF("k")
      .select(col("k"), expr("xxhash64(k, 8)").as("payload"))
    time("forgetAndRewrite: seed 3 versions (1.5M rows each)") {
      (1 to 3).foreach(_ => w.saveTableVersioned(big, tmp, "t"))
    }
    val req = spark.range(1000).select((col("id") * 97L).as("k"))
    time("forgetAndRewrite: erase 1k keys + purge 3 versions + audit") {
      drain(w.forgetAndRewrite(tmp, "t", req, Seq("k")))
    }
    println(s"versions after: ${w.listVersions("t")}")
    spark.stop()
  }
}
