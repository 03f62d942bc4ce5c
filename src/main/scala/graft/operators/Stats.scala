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
