package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Warehouse event analytics: ordered funnels and retention cohorts —
  * the two queries every product-analytics warehouse deployment runs
  * daily (the reference reaches them only through raw-SQL passthrough;
  * here they are first-class, declarative, and oracle-replayable).
  */
object EventAnalytics {

  /** Ordered funnel: how many users complete `steps` in order, anchored
    * at each user's FIRST occurrence of the first step. A user reaches
    * step i when an event of type `steps(i-1)` exists at ts ≥ the reach
    * time of step i−1 (reach times chosen greedily-earliest, which is
    * optimal for a fixed anchor) and, when `withinMinutes` > 0, at
    * ts ≤ anchor + window. Re-entries after a failed anchor window are
    * deliberately NOT retried: first-touch anchoring is the deterministic,
    * relationally-replayable semantics (re-entry funnels need a per-
    * candidate-start explosion that neither scales nor stays exact).
    *
    * Output: (step, step_name, n_users) — n_users monotone non-increasing.
    *
    * Scale shape: one filtered pass + aggregation per step (the type
    * filter pushes to the scan), chained equi-joins on the user key; with
    * events bucketed/partitioned by user the whole chain co-locates.
    * The final count is ONE aggregation over the reach-times frame.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String], withinMinutes: Long = 0): DataFrame = {
    require(steps.nonEmpty, "funnel: at least one step required")
    val ev = events.select(col(userCol).as("__u"), col(typeCol).as("__t"),
      col(tsCol).as("__ts"))
    var cur = ev.filter(col("__t") === steps.head)
      .groupBy("__u").agg(min("__ts").as("ts_1"))
    for (i <- 2 to steps.length) {
      val evi = ev.filter(col("__t") === steps(i - 1))
        .select(col("__u").as("__u2"), col("__ts").as("__cand"))
      val windowOk: Column =
        if (withinMinutes > 0)
          col("__cand") <= col("ts_1") + expr(s"INTERVAL '$withinMinutes' MINUTE")
        else lit(true)
      val prevCols = cur.columns.toSeq
      cur = cur.join(evi,
          cur("__u") === evi("__u2") &&
            col("__cand") >= col(s"ts_${i - 1}") && windowOk,
          "left")
        .groupBy(prevCols.map(col): _*)
        .agg(min("__cand").as(s"ts_$i"))
    }
    val fates = steps.zipWithIndex.map { case (name, i) =>
      struct(lit(i + 1L).as("step"), lit(name).as("step_name"),
        col(s"__n_${i + 1}").as("n_users"))
    }
    cur.agg(
        count(col("ts_1")).as("__n_1"),
        (2 to steps.length).map(i => count(col(s"ts_$i")).as(s"__n_$i")): _*)
      .select(explode(array(fates: _*)).as("f"))
      .select("f.*")
      .orderBy("step")
  }

  /** Retention cohorts: users grouped by their first-activity date, then
    * per (cohort_date, day_offset ≤ maxDays) the number still active that
    * day — the classic triangle. Exact integer counts.
    *
    * Scale shape: one distinct pass to (user, activity-date), a same-key
    * reuse of that partitioning for the per-user cohort min, a co-located
    * user-key join back, and one (cohort, offset) aggregation. Nothing
    * rescans raw events twice and no count-distinct survives to the
    * final aggregate (user-days are already distinct).
    */
  def retention(events: DataFrame, userCol: String, tsCol: String,
      maxDays: Int = 14): DataFrame = {
    val ud = events
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("d"))
      .distinct()
    val coh = ud.groupBy("u").agg(min("d").as("cohort_date"))
    val sizes = coh.groupBy("cohort_date").agg(count(lit(1)).as("n_cohort"))
    ud.join(coh, "u")
      .withColumn("day_offset", datediff(col("d"), col("cohort_date")).cast("long"))
      .filter(col("day_offset") <= maxDays)
      .groupBy("cohort_date", "day_offset")
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, Seq("cohort_date"))
      .orderBy("cohort_date", "day_offset")
  }
}
