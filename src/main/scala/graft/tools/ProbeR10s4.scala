package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Isolated 500k-tier measurement for the round-10 fourth-session
  * additions (holtWinters, robustAnomaly/robustScore, jaroWinkler,
  * decontaminateSemantic) — the ProbeNew discipline: fully synthetic
  * deterministic inputs, two alternated reps, noop sink. Not part of
  * the library surface.
  *
  * Shapes measured:
  *  - events: 500k rows over 10k keys (50 events/key) — the holtWinters
  *    fold carries 26 longs of state per key; robustAnomaly pays two
  *    key-partitioned rank sorts; robustScore pays ONE narrow join
  *    against the prebuilt profile (the steady-state nightly shape).
  *  - vectors: 500k 64-dim floats from xxhash64 — decontaminateSemantic
  *    is one map scan at 20 bench vectors (64 madds × 20 per row + the
  *    BigInt cleared compare per candidate).
  *  - strings: 500k adjacent md5-hex pairs (32 chars) — the jaroWinkler
  *    kernel at the name/key length it is built for.
  */
object ProbeR10s4 {
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

    val events = ids.select(
      col("id").as("eid"),
      pmod(col("id"), lit(nRows / 50)).as("uid"),
      timestamp_micros(lit(1700000000000000L) +
        (col("id") % 997) * 37000000L).as("ts"),
      (pmod(col("id"), lit(1000L)).cast("double") / 100.0).as("value"))
      .persist()
    events.count()

    val vecs = ids.select(col("id").as("vec_id"),
      expr("transform(sequence(0, 63), " +
        "i -> CAST((pmod(xxhash64(id, i), 2001) - 1000) / 1000.0 AS FLOAT))")
        .as("embedding"))
      .persist()
    vecs.count()
    val model = graft.operators.Dedup.trainSemanticContaminationSet(
      vecs.filter(col("vec_id") % (nRows / 20) === 0), "embedding")

    val strs = ids.select(col("id"), md5(col("id").cast("string")).as("s"))
      .persist()
    strs.count()
    val profile = graft.operators.EventAnalytics
      .robustProfile(events, "uid", "ts", "value").persist()
    println(s"profile keys: ${profile.count()}")

    // 90/10 time split for the fold-state continuation: the store folds
    // once (steady-state = a warehouse table), the probe prices per-batch
    val cut = 1700000000000000L + 900L * 37000000L
    val hwHist = events.filter(col("ts") <
      timestamp_micros(lit(cut)))
    val hwBatch = events.filter(col("ts") >=
      timestamp_micros(lit(cut)))
    val hwStore = graft.operators.EventAnalytics.holtWintersStore(
      hwHist, "uid", "ts", "eid", "value",
      alphaPpm = 200000, betaPpm = 100000, gammaPpm = 300000,
      slotSeconds = 3600, slotModulus = 24).persist()
    println(s"hw store keys: ${hwStore.count()}")

    for (rep <- 1 to 2) {
      time(s"holtWintersIncremental ~10% batch vs stored state rep$rep") {
        drain(graft.operators.EventAnalytics.holtWintersIncremental(
          hwBatch, hwStore, "uid", "ts", "eid", "value",
          alphaPpm = 200000, betaPpm = 100000, gammaPpm = 300000,
          slotSeconds = 3600, slotModulus = 24, devThreshCents = 3000))
      }
      time(s"holtWinters 24-slot fold rep$rep") {
        drain(graft.operators.EventAnalytics.holtWinters(
          events, "uid", "ts", "eid", "value",
          alphaPpm = 200000, betaPpm = 100000, gammaPpm = 300000,
          slotSeconds = 3600, slotModulus = 24, devThreshCents = 3000))
      }
      time(s"robustAnomaly two-sort self-score rep$rep") {
        drain(graft.operators.EventAnalytics.robustAnomaly(
          events, "uid", "ts", "eid", "value",
          kPermille = 3500, minEvents = 5))
      }
      time(s"robustScore vs prebuilt profile rep$rep") {
        drain(graft.operators.EventAnalytics.robustScore(
          events, profile, "uid", "ts", "eid", "value",
          kPermille = 3500, minEvents = 5))
      }
      time(s"decontaminateSemantic 20-vector model rep$rep") {
        drain(graft.operators.Dedup.decontaminateSemantic(
            vecs, "embedding", model, thresholdPermille = 350)
          .select("vec_id", "n_bench_hits", "contaminated"))
      }
      time(s"rakeTopK k=3 over 500k synthetic 16-word docs rep$rep") {
        drain(graft.operators.TextAnalysis.keywords(
          ids.select(col("id").as("doc_id"),
            concat_ws(" ",
              expr("transform(sequence(0, 15), " +
                "i -> concat('w', pmod(xxhash64(id, i), 500)))")).as("text")),
          "doc_id", "text", k = 3))
      }
      time(s"jaroWinkler 500k adjacent md5 pairs rep$rep") {
        drain(strs.select(col("id").as("id_a"), col("s").as("sa"))
          .join(strs.select((col("id") - 1).as("id_a"), col("s").as("sb")),
            "id_a")
          .select(col("id_a"),
            graft.functions.GraftFunctions.jaroWinkler(col("sa"), col("sb"))
              .as("jw")))
      }
    }
    spark.stop()
  }
}
