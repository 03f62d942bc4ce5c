package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Isolated 500k-tier measurement for the round-11 additions
  * (blocklistTag, readability, phraseSearch, soundex/soundexJoin,
  * changepoint, autocorrelation + acfStore family, trendFit + store,
  * benfordProfile) — the ProbeNew discipline: fully synthetic
  * deterministic inputs, two alternated reps, noop sink. Not part of
  * the library surface.
  *
  * Shapes measured:
  *  - docs: 500k 16-word texts from xxhash64 over a 500-word vocab —
  *    blocklistTag runs a 1,000-pattern automaton in ONE scan (the
  *    per-pattern-LIKE alternative would be 1,000 scans); readability
  *    and phraseSearch share the same corpus.
  *  - names: 500k synthetic syllable names — soundexJoin's blocks are
  *    deliberately coarse (≤ 26·7³ codes exist), so a 500k self-join
  *    honestly prices the within-block quadratic that the maxBlock cap
  *    bounds; the probe reports pair counts next to seconds.
  *  - events: 500k rows over 10k keys (50 events/key) — changepoint
  *    pays two window passes; autocorrelation one bounded explode +
  *    equi-join; the stores fold once and score off narrow rows.
  */
object ProbeR11 {
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

    val docs = ids.select(col("id").as("doc_id"),
      concat_ws(" ",
        expr("transform(sequence(0, 15), " +
          "i -> concat('w', pmod(xxhash64(id, i), 500)))")).as("text"))
      .persist()
    docs.count()

    // 1,000 patterns over the same vocab (single words and bigrams)
    val pats = (0 until 500).map(i => s"w$i") ++
      (0 until 500).map(i => s"w$i w${(i + 7) % 500}")
    val acModel = graft.operators.TextAnalysis.trainBlocklist(pats)

    val syls = Array("an", "bel", "cor", "dan", "el", "far", "gon", "hil",
      "ir", "jas", "kel", "lor", "mar", "nor", "ol", "per", "qu", "ros",
      "sten", "tor")
    val names = ids.select(col("id"),
      expr(("concat(" +
        "element_at(array(%s), CAST(pmod(xxhash64(id, 1), 20) + 1 AS int)), " +
        "element_at(array(%s), CAST(pmod(xxhash64(id, 2), 20) + 1 AS int)), " +
        "element_at(array(%s), CAST(pmod(xxhash64(id, 3), 20) + 1 AS int)), " +
        "element_at(array('b','c','d','f','g','k','l','m','n','p','r','s'," +
        "'t','v','x','z'), CAST(pmod(xxhash64(id, 4), 16) + 1 AS int)), " +
        "element_at(array('b','c','d','f','g','k','l','m','n','p','r','s'," +
        "'t','v','x','z'), CAST(pmod(xxhash64(id, 5), 16) + 1 AS int)))")
        .format(
          syls.map(s => s"'$s'").mkString(","),
          syls.map(s => s"'$s'").mkString(","),
          syls.map(s => s"'$s'").mkString(","))).as("name"))
      .persist()
    names.count()

    val events = ids.select(
      col("id").as("eid"),
      pmod(col("id"), lit(nRows / 50)).as("uid"),
      timestamp_micros(lit(1700000000000000L) +
        (col("id") % 997) * 37000000L).as("ts"),
      (pmod(col("id"), lit(1000L)).cast("double") / 100.0).as("value"))
      .persist()
    events.count()

    // 90/10 split for the continuation stores
    val cut = 1700000000000000L + 900L * 37000000L
    val evHist = events.filter(col("ts") < timestamp_micros(lit(cut)))
    val evBatch = events.filter(col("ts") >= timestamp_micros(lit(cut)))
    val acfSt = graft.operators.EventAnalytics.acfStore(
      evHist, "uid", "ts", "eid", "value", maxLag = 12).persist()
    println(s"acf store keys: ${acfSt.count()}")
    val trSt = graft.operators.EventAnalytics.trendStore(
      evHist, "uid", "ts", "eid", "value").persist()
    println(s"trend store keys: ${trSt.count()}")

    for (rep <- 1 to 2) {
      time(s"blocklistTag 1000-pattern AC one scan rep$rep") {
        drain(graft.operators.TextAnalysis.blocklistTag(docs, "text", acModel)
          .select("doc_id", "block_hits", "block_distinct", "blocked"))
      }
      time(s"readability counts + two fixed-point scores rep$rep") {
        drain(graft.operators.TextAnalysis.readability(docs, "text")
          .select("doc_id", "n_words", "n_syllables", "flesch_e3"))
      }
      time(s"phraseSearch 'w3 w10' positional intersect rep$rep") {
        drain(graft.operators.Retrieval.phraseSearch(
          docs, "doc_id", "text", "w3 w10"))
      }
      time(s"soundex coding 500k names rep$rep") {
        drain(names.select(col("id"),
          graft.functions.GraftFunctions.soundex(col("name")).as("sx")))
      }
      time(s"soundexJoin 500k names (coarse blocks; honest quadratic) rep$rep") {
        val pairs = graft.operators.Relational.soundexJoin(
          names, "id", "name", minSimE6 = 900000L)
        println(s"  pairs: ${pairs.count()}")
      }
      time(s"changepoint two-window argmax rep$rep") {
        drain(graft.operators.EventAnalytics.changepoint(
          events, "uid", "ts", "eid", "value", minGainE6 = 100000000000000L))
      }
      time(s"autocorrelation maxLag=12 rep$rep") {
        drain(graft.operators.EventAnalytics.autocorrelation(
          events, "uid", "ts", "eid", "value", maxLag = 12))
      }
      time(s"acfStore full fold rep$rep") {
        drain(graft.operators.EventAnalytics.acfStore(
          events, "uid", "ts", "eid", "value", maxLag = 12))
      }
      time(s"updateAcfStore ~10% batch + score off store rep$rep") {
        drain(graft.operators.EventAnalytics.acfFromStore(
          graft.operators.EventAnalytics.updateAcfStore(
            acfSt, evBatch, "uid", "ts", "eid", "value", maxLag = 12),
          "uid"))
      }
      time(s"trendFit one-shot OLS rep$rep") {
        drain(graft.operators.EventAnalytics.trendFit(
          events, "uid", "ts", "eid", "value"))
      }
      time(s"updateTrendStore ~10% batch + score rep$rep") {
        drain(graft.operators.EventAnalytics.trendFromStore(
          graft.operators.EventAnalytics.updateTrendStore(
            trSt, evBatch, "uid", "ts", "eid", "value"), "uid"))
      }
      time(s"benfordProfile 32-group grid rep$rep") {
        drain(graft.operators.Stats.benfordProfile(
          events.withColumn("g", pmod(col("uid"), lit(32L)).cast("string")),
          "g", "value"))
      }
      time(s"robustTrend 50-event keys (12.5M pairs) rep$rep") {
        drain(graft.operators.EventAnalytics.robustTrend(
          events, "uid", "ts", "eid", "value"))
      }
      time(s"forgetKeys 1% erasure over 500k rep$rep") {
        drain(graft.operators.Merge.forgetKeys(
          events, events.filter(col("eid") % 100 === 0).select("eid"),
          Seq("eid")))
      }
      time(s"clusterMedoid 500k x 64-dim over 1000 clusters rep$rep") {
        drain(graft.operators.Similarity.clusterMedoid(
          ids.select(col("id"),
            pmod(xxhash64(col("id")), lit(1000L)).as("cl"),
            expr("transform(sequence(0, 63), " +
              "i -> CAST((pmod(xxhash64(id, i), 2001) - 1000) / 1000.0 " +
              "AS FLOAT))").as("v")),
          "id", "v", "cl"))
      }
      time(s"linkPrediction 500k-edge bipartite, cap 200 rep$rep") {
        // 10k left nodes x 50 edges to 2k right nodes (right deg ~250:
        // above the cap, so wedges come from the left side — the
        // honest capped shape)
        val g = ids.select(pmod(col("id"), lit(10000L)).as("src"),
          (pmod(xxhash64(col("id")), lit(2000L)) + 1000000L).as("dst"))
        val pairs = graft.operators.Graph.linkPrediction(
          g, "src", "dst", maxDegree = 200L, minCommon = 3L)
        println(s"  pairs: ${pairs.count()}")
      }
    }
    spark.stop()
  }
}
