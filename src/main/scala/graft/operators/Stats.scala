package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate aggregates — the 100 TB answer to "how many distinct users"
  * and "what's the p95": HyperLogLog++ and a mergeable quantile sketch,
  * both single-pass, partial-aggregated map-side, with bounded error and
  * bounded memory (vs countDistinct's full shuffle of every distinct value
  * and exact percentile's full sort).
  */
object Stats {

  /** approx_count_distinct (HLL++) per group; rsd = relative std deviation. */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
      rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(approx_count_distinct(col(valueCol), rsd).as(s"approx_distinct_$valueCol"))

  /** Approximate quantiles (Greenwald-Khanna) of a numeric column. */
  def approxQuantiles(df: DataFrame, valueCol: String,
      probabilities: Seq[Double], relativeError: Double = 0.01): Seq[Double] =
    df.stat.approxQuantile(valueCol, probabilities.toArray, relativeError).toSeq

  /** Materialized HLL sketch per group (Datasketches bytes) — the
    * INCREMENTAL distinct-count pattern: persist one small sketch per
    * partition/day, answer "distinct over any date range" later by
    * merging sketches with [[mergeSketchDistinct]] instead of rescanning
    * 100 TB of raw data. lgConfigK 12 ⇒ ~4 KB per sketch, ~1.6% rsd.
    */
  def sketchDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lgConfigK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgConfigK)).as(s"sketch_$valueCol"))

  /** Merge per-group sketches down to `mergeCols` and estimate the
    * distinct count — e.g. daily sketches → monthly uniques. No raw-data
    * rescan; the shuffle carries only sketch bytes.
    */
  def mergeSketchDistinct(sketches: DataFrame, mergeCols: Seq[String],
      sketchCol: String): DataFrame =
    sketches.groupBy(mergeCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col(sketchCol)))
        .as("approx_distinct_merged"))

  /** Heavy hitters (frequent items) of a string column via the mergeable
    * Misra-Gries sketch ([[graft.functions.MisraGriesAgg]]): at most `k`
    * (item, est_count) rows with the guarantee
    * `true − n/(k+1) ≤ est ≤ true` — every item with frequency > n/(k+1)
    * is present. Single pass, map-side partial aggregation, shuffle
    * volume numPartitions × k independent of cardinality — the scalable
    * complement to [[approxDistinct]] for "WHAT are the top values", not
    * just how many. While distinct items ≤ k the counters are exact.
    */
  def heavyHitters(df: DataFrame, valueCol: String, k: Int = 64): DataFrame = {
    graft.functions.GraftFunctions.ensure(df.sparkSession)
    df.agg(graft.functions.GraftFunctions.heavyHitters(col(valueCol), k).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.item").as("item"), col("h.est_count").as("est_count"))
  }

  /** Per-group heavy hitters: the Misra-Gries sketch as a grouped
    * aggregate — top values of `valueCol` within every `groupCols` group
    * (e.g. top domains per language, top error codes per service), one
    * row per (group, item). Same guarantee and shuffle bound as
    * [[heavyHitters]], per group.
    */
  def heavyHittersByGroup(df: DataFrame, groupCols: Seq[String],
      valueCol: String, k: Int = 64): DataFrame = {
    require(groupCols.nonEmpty, "heavyHittersByGroup: need group columns")
    graft.functions.GraftFunctions.ensure(df.sparkSession)
    df.groupBy(groupCols.map(col): _*)
      .agg(graft.functions.GraftFunctions.heavyHitters(col(valueCol), k).as("hh"))
      .select(groupCols.map(col) :+ explode(col("hh")).as("h"): _*)
      .select(groupCols.map(col) :+ col("h.item").as("item") :+
        col("h.est_count").as("est_count"): _*)
  }

  /** Join-key skew profile: the operational question behind every slow
    * join — "is one key hot, and how hot?" — answered in ONE bounded
    * pass. Emits the top `k` keys by (estimated) frequency with total
    * rows and the skew factor est/(n/k_distinct-ish): `est_count`, the
    * key's share `share_e6` (floor(10⁶·est/n), integer-exact), and the
    * row total. Uses [[heavyHitters]] (Misra-Gries) so the pass costs
    * partitions × k shuffle rows at ANY cardinality; while distinct keys
    * ≤ k the counts are exact. Keys are profiled as their string form
    * (concat_ws on multi-column keys) — the same shape a salt decision
    * needs ([[Relational.saltedJoin]] is the fix this diagnoses).
    */
  def skewProfile(df: DataFrame, keyCols: Seq[String], k: Int = 64): DataFrame = {
    require(keyCols.nonEmpty, "skewProfile: at least one key column")
    graft.functions.GraftFunctions.ensure(df.sparkSession)
    // \u0001 separator: multi-column keys must not alias across the boundary
    val keyed = df.select(concat_ws("\u0001",
      keyCols.map(c =>
        coalesce(col(c).cast("string"), lit("\u0002null\u0003"))): _*).as("__key"))
    // NULL components coalesce to a control-char-framed sentinel above:
    // concat_ws SKIPS nulls, which would merge ("a",NULL) with (NULL,"a")
    // row total and the sketch fold into ONE aggregation pass (no action)
    keyed
      .agg(count(lit(1)).as("n_rows"),
        graft.functions.GraftFunctions.heavyHitters(col("__key"), k).as("hh"))
      .select(col("n_rows"), explode(col("hh")).as("h"))
      .select(col("h.item").as("item"), col("h.est_count").as("est_count"),
        col("n_rows"))
      .withColumn("share_e6",
        expr("CAST((CAST(est_count AS decimal(38,0)) * 1000000) div " +
          "CAST(n_rows AS decimal(38,0)) AS long)"))
  }

  /** Merge Misra-Gries sketch FRAMES (item, est_count) — the relational
    * form of [[graft.functions.MisraGriesAgg]]'s merge, for sketches that
    * live as TABLES (a streaming store, per-partition/per-day sketches to
    * roll up): sum counters per item, and if more than k items survive,
    * subtract the (k+1)-th largest total from every counter and evict
    * ≤ 0 (Agarwal et al., "Mergeability of Summaries", PODS 2012 — the
    * combined sketch keeps the summed-N error bound). Identical
    * arithmetic to the in-aggregate merge, so store-then-merge and
    * one-shot sketching give the same guarantee; while total distinct
    * items ≤ k nothing is ever subtracted and counters stay EXACT.
    *
    * Bounded input (sketches are ≤ k rows each); the (k+1)-th-largest
    * cut is a bounded sort over ≤ a few k rows, computed with an exact
    * per-item aggregation + a cross-joined scalar — no window over data.
    */
  def mergeHeavyHitterSketches(sketches: DataFrame, k: Int = 64): DataFrame = {
    val tot = sketches.groupBy("item")
      .agg(sum(col("est_count")).as("est_count"))
    val cut = tot.select(col("est_count"))
      .orderBy(col("est_count").desc).limit(k + 1)
      .agg(when(count(lit(1)) > k, min(col("est_count")))
        .otherwise(lit(0L)).as("__cut"))
    tot.crossJoin(broadcast(cut))
      .filter(col("est_count") > col("__cut"))
      .select(col("item"), (col("est_count") - col("__cut")).as("est_count"))
  }

  /** One micro-batch of a STREAMING heavy-hitters store: sketch the
    * arriving batch and merge it into the persisted (item, est_count)
    * store frame via [[mergeHeavyHitterSketches]] — the 39c
    * signature-store pattern for frequency sketches. Wire it under
    * `foreachBatch` (store in a warehouse table; StatsSpec drives the
    * MemoryStream form): state is ≤ k rows per group of interest,
    * independent of stream length.
    */
  def updateHeavyHitterStore(store: DataFrame, batch: DataFrame,
      valueCol: String, k: Int = 64): DataFrame =
    mergeHeavyHitterSketches(
      store.select(col("item"), col("est_count"))
        .unionByName(heavyHitters(batch, valueCol, k)), k)

  /** One-pass numeric summary per group: count, mean, stddev, min, max,
    * approx p50/p95 (percentile_approx is a mergeable sketch, safe at any
    * group cardinality).
    */
  def summarize(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    val v = col(valueCol)
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(v).as("n"),
        avg(v).as("mean"),
        stddev_samp(v).as("stddev"),
        min(v).as("min"),
        max(v).as("max"),
        percentile_approx(v, lit(0.5), lit(10000)).as("p50"),
        percentile_approx(v, lit(0.95), lit(10000)).as("p95"))
  }
}
