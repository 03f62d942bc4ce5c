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
