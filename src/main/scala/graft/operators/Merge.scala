package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Warehouse MERGE / upsert and SCD Type 2 dimension maintenance, the two
  * table-maintenance verbs every warehouse the reference connects to
  * exposes natively (BigQuery/Snowflake/Trino `MERGE INTO`; the reference
  * itself only reaches them through raw-SQL passthrough —
  * fugue_bigquery/execution_engine.py select / fugue_trino
  * execution_engine.py:124 df_to_table — so here they become first-class
  * DataFrame transforms).
  *
  * Both operators are pure frame→frame transforms: the caller persists the
  * result through [[graft.Warehouse.saveTable]] /
  * [[graft.Warehouse.persistToTable]] (which handle view/catalog
  * invalidation) — keeping compute and table lifecycle orthogonal, exactly
  * like the rest of the engine.
  *
  * Scale shape (100 TB target, small-batch source): the matched-row pass is
  * a single equi-join of target×source that AQE broadcasts when the batch
  * is small — the target never shuffles. The unmatched-source (insert)
  * pass anti-joins the batch against the target's KEY COLUMNS ONLY, so the
  * second target scan is column-pruned to the key; with a bucketed target
  * both passes are shuffle-free. Nothing here is quadratic and no pass
  * materializes more than target+batch rows.
  */
object Merge {

  private def lcol(name: String): Column = graft.Warehouse.literalCol(name)

  /** MERGE INTO semantics over frames: rows of `target` whose `keys` match
    * a `source` row get `updateCols` overwritten from the source (true
    * overwrite — a source NULL updates to NULL, unlike a coalesce
    * formulation); source rows matching nothing are inserted, with target
    * columns absent from the source filled with NULL; everything else
    * passes through byte-identical. Output columns = target columns, in
    * target order.
    *
    * `updateCols` defaults to every common non-key column. Source columns
    * outside keys++updateCols are ignored. `deleteMatched=true` flips the
    * matched branch from update to delete (CDC delete application).
    *
    * The source must be key-unique — warehouse MERGE errors on ambiguous
    * matches (multiple source rows per target row would make the result
    * nondeterministic); `checkUniqueSource` enforces it with one cheap
    * aggregation over the (small) source side.
    */
  def mergeUpsert(
      target: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      updateCols: Seq[String] = Nil,
      insertUnmatched: Boolean = true,
      deleteMatched: Boolean = false,
      checkUniqueSource: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "mergeUpsert: at least one key column required")
    val tCols = target.columns.toSeq
    val sCols = source.columns.toSet
    keys.foreach { k =>
      require(tCols.contains(k) && sCols.contains(k),
        s"mergeUpsert: key column '$k' must exist on both sides")
    }
    val upd =
      if (updateCols.nonEmpty) updateCols
      else tCols.filter(c => !keys.contains(c) && sCols.contains(c))
    upd.foreach { c =>
      require(sCols.contains(c), s"mergeUpsert: update column '$c' missing from source")
      require(!keys.contains(c), s"mergeUpsert: key column '$c' cannot be updated")
    }

    // prune the source to what the merge reads, once, before any join
    val src = source.select((keys ++ upd).map(lcol): _*)
    if (checkUniqueSource) {
      val dup = src.groupBy(keys.map(lcol): _*).count().filter(col("count") > 1).limit(1)
      require(dup.isEmpty,
        s"mergeUpsert: source is not unique on keys ${keys.mkString(",")} — " +
          "warehouse MERGE semantics reject ambiguous matches")
    }

    // matched pass: target LEFT JOIN source; the marker (not coalesce)
    // distinguishes "no match" from "update to NULL". All references are
    // alias-qualified strings so the plan stays unambiguous even when
    // target and source share lineage (self-merge).
    def q(side: String, c: String): Column = col(s"$side.`${c.replace("`", "``")}`")
    val marked = src.withColumn("__graft_matched", lit(true))
    val joined = target.as("t").join(
      marked.as("s"),
      keys.map(k => q("t", k) === q("s", k)).reduce(_ && _),
      "left")
    val matchedFlag = q("s", "__graft_matched").isNotNull
    val updatedTarget0 = joined.select(tCols.map { c =>
      (if (upd.contains(c)) when(matchedFlag, q("s", c)).otherwise(q("t", c))
      else q("t", c)).as(c)
    } :+ matchedFlag.as("__graft_matched"): _*)
    val updatedTarget =
      (if (deleteMatched) updatedTarget0.filter(!col("__graft_matched")) else updatedTarget0)
        .drop("__graft_matched")

    if (!insertUnmatched) updatedTarget
    else {
      // insert pass: batch rows with no target match; the anti join's right
      // side is the target pruned to its key columns (column-pruned scan)
      val inserts = src
        .join(target.select(keys.map(lcol): _*), keys, "left_anti")
        .select(tCols.map { c =>
          if (keys.contains(c) || upd.contains(c)) lcol(c).as(c)
          else lit(null).cast(target.schema(c).dataType).as(c)
        }: _*)
      updatedTarget.unionByName(inserts)
    }
  }

  /** Slowly-changing-dimension Type 2 maintenance: apply an update batch to
    * a versioned dimension, closing changed current rows and appending the
    * new versions, keeping full history.
    *
    * The dimension carries `validFrom`/`validTo` (DateType; validTo NULL =
    * open) and `currentFlag` (boolean). The update batch carries the keys,
    * the tracked attribute columns, and `effectiveCol` (DateType — the
    * change date). Per key-unique update row:
    *
    *  - key exists and any `trackCols` differ (null-safe compare) → the
    *    open row is closed (`validTo` = effective, flag false) AND a new
    *    open row is appended with the update's attributes; non-tracked
    *    attribute columns carry over from the closed row.
    *  - key exists and all `trackCols` equal → no-op (row passes through).
    *  - key absent from the dimension → new open row, effective-dated;
    *    non-tracked columns NULL.
    *
    * Historical (non-current) rows always pass through untouched. The
    * caller contract mirrors [[mergeUpsert]]: update batches are key-unique
    * (enforced via `checkUniqueSource`) and effective dates are later than
    * the open rows' `validFrom` (the operator does not re-order history).
    *
    * Same scale shape as [[mergeUpsert]]: one equi-join of the open rows
    * with the (small) batch plus a key-pruned anti join for brand-new keys.
    */
  def scd2Apply(
      dim: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      trackCols: Seq[String],
      effectiveCol: String,
      validFrom: String = "valid_from",
      validTo: String = "valid_to",
      currentFlag: String = "is_current",
      checkUniqueSource: Boolean = true): DataFrame = {
    require(keys.nonEmpty && trackCols.nonEmpty, "scd2Apply: keys and trackCols required")
    val dCols = dim.columns.toSeq
    (keys ++ trackCols ++ Seq(validFrom, validTo, currentFlag)).foreach { c =>
      require(dCols.contains(c), s"scd2Apply: dimension misses column '$c'")
    }
    (keys ++ trackCols :+ effectiveCol).foreach { c =>
      require(updates.columns.contains(c), s"scd2Apply: update batch misses column '$c'")
    }

    val upd = updates.select((keys ++ trackCols :+ effectiveCol).map(lcol): _*)
    if (checkUniqueSource) {
      val dup = upd.groupBy(keys.map(lcol): _*).count().filter(col("count") > 1).limit(1)
      require(dup.isEmpty,
        s"scd2Apply: update batch is not unique on keys ${keys.mkString(",")}")
    }

    def q(side: String, c: String): Column = col(s"$side.`${c.replace("`", "``")}`")

    // Single pass over the whole dimension (history AND current): one left
    // join against the (small) batch, then each row EXPLODES into its fate
    // — pass-through [row], or changed [closed, reopened]. A filter-per-
    // branch formulation would scan the 100 TB dimension once per branch;
    // this shape scans it exactly once.
    val marked = upd.withColumn("__graft_matched", lit(true))
    val joined = dim.as("d").join(
      marked.as("u"),
      keys.map(k => q("d", k) === q("u", k)).reduce(_ && _),
      "left")
    val matched = q("u", "__graft_matched").isNotNull
    val changed = matched && q("d", currentFlag) &&
      !trackCols.map(c => q("d", c) <=> q("u", c)).reduce(_ && _)

    def rowAs(overrides: Map[String, Column]): Column =
      struct(dCols.map(c => overrides.getOrElse(c, q("d", c)).as(c)): _*)
    val nullValidTo = lit(null).cast(dim.schema(validTo).dataType)
    val passRow = rowAs(Map.empty)
    val closedRow = rowAs(Map(
      validTo -> q("u", effectiveCol), currentFlag -> lit(false)))
    val reopenedRow = rowAs(Map(
      validFrom -> q("u", effectiveCol), validTo -> nullValidTo,
      currentFlag -> lit(true)) ++ trackCols.map(t => t -> q("u", t)).toMap)

    val applied = joined
      .select(explode(when(changed, array(closedRow, reopenedRow))
        .otherwise(array(passRow))).as("__graft_row"))
      .select(dCols.map(c => col("__graft_row").getField(c).as(c)): _*)

    // brand-new keys: open rows with NULL untracked attributes; the anti
    // join's right side is the dimension pruned to keys + current flag
    val fresh = upd
      .join(dim.filter(lcol(currentFlag)).select(keys.map(lcol): _*), keys, "left_anti")
      .select(dCols.map { c =>
        (c match {
          case `validFrom`               => lcol(effectiveCol)
          case `validTo`                 => nullValidTo
          case `currentFlag`             => lit(true)
          case k if keys.contains(k)      => lcol(k)
          case t if trackCols.contains(t) => lcol(t)
          case other                     => lit(null).cast(dim.schema(other).dataType)
        }).as(c)
      }: _*)

    applied.unionByName(fresh)
  }
  /** SNAPSHOT DIFF — classify every key of two table versions as
    * `inserted` / `deleted` / `changed` / `unchanged`: the data-validation
    * verb behind pipeline migrations, backfill audits and CDC
    * reconciliation (warehouses expose it as EXCEPT/table_changes; here
    * it is one declarative pass). ONE full-outer join on the key, then a
    * null-safe (`<=>`) comparison of every shared non-key column —
    * NULL→value and value→NULL both count as changed, NULL<=>NULL does
    * not. Output: key columns + `diff_status`; aggregate downstream for
    * the summary, or filter `!= 'unchanged'` for the change feed.
    *
    * Scale: the join shuffles both snapshots on the key once (AQE
    * handles skew); the column comparison is a codegen'd projection.
    * Both frames must share the compared columns (the non-key
    * intersection is used, so added/dropped COLUMNS are ignored here —
    * schema diffs are [[graft.Warehouse.getSchema]]'s job).
    */
  def diffTables(before: DataFrame, after: DataFrame,
      keys: Seq[String], checkUniqueKeys: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "diffTables: need key columns")
    val shared = before.columns.toSeq.intersect(after.columns.toSeq)
      .filterNot(keys.contains)
    // presence via per-side MARKER columns, not key nullability: the join
    // matches NULL key parts (<=>), so a matched all/partially-NULL key
    // must still read as present on both sides
    val b = before.select((keys ++ shared).map(lcol): _*)
      .withColumn("__graft_b", lit(true)).alias("b")
    val a = after.select((keys ++ shared).map(lcol): _*)
      .withColumn("__graft_a", lit(true)).alias("a")
    if (checkUniqueKeys) {
      // duplicate keys fan out m×n through the full-outer join and
      // silently inflate every downstream count — reject like mergeUpsert
      Seq(("before", before), ("after", after)).foreach { case (name, df) =>
        val dup = df.groupBy(keys.map(lcol): _*).count()
          .filter(col("count") > 1).limit(1)
        require(dup.isEmpty,
          s"diffTables: $name is not unique on keys ${keys.mkString(",")} — " +
            "pass checkUniqueKeys = false to diff anyway (fan-out applies)")
      }
    }
    def q(side: String, c: String): Column = col(s"$side.`${c.replace("`", "``")}`")
    val joinCond = keys.map(k => q("b", k) <=> q("a", k)).reduce(_ && _)
    val sameRow =
      if (shared.isEmpty) lit(true)
      else shared.map(c => q("b", c) <=> q("a", c)).reduce(_ && _)
    b.join(a, joinCond, "full_outer")
      .withColumn("diff_status",
        when(q("b", "__graft_b").isNull, lit("inserted"))
          .when(q("a", "__graft_a").isNull, lit("deleted"))
          .when(sameRow, lit("unchanged"))
          .otherwise(lit("changed")))
      .select(keys.map(k => coalesce(q("b", k), q("a", k)).as(k))
        :+ col("diff_status"): _*)
  }

  /** POINT-IN-TIME join — the consumption verb for an SCD2 dimension
    * ([[scd2Apply]]'s output): each fact row joins the dimension VERSION
    * that was valid at the fact's event time (`validFrom` ≤ t <
    * `validTo`, NULL `validTo` = open) — the "as the world was then"
    * join every feature-backfill / training-snapshot pipeline needs.
    * Joining only current versions backfills the PRESENT into the past:
    * a model trained on such features sees attributes that did not exist
    * at event time (leakage). `how` = inner | left (left pads facts with
    * no valid version — e.g. events before the key first appeared).
    *
    * Plan: a plain EQUI-join on the keys with the validity predicate as
    * an extra join condition — per key a dimension holds a handful of
    * versions, so the shuffle is keyed exactly like the current-version
    * join (no range-join machinery) and AQE broadcasts dims that fit.
    * The dimension contract guarantees ≤ 1 valid version per (key, t),
    * so fact rows are never duplicated; `strict = true` verifies that
    * contract first (one dim-sized window pass + an action — cheap for
    * dimensions, skip it in tight loops).
    */
  def pointInTimeJoin(
      facts: DataFrame, dim: DataFrame, keys: Seq[String],
      factTimeCol: String,
      validFrom: String = "valid_from", validTo: String = "valid_to",
      how: String = "left", strict: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "pointInTimeJoin: keys required")
    require(Seq("inner", "left").contains(how),
      s"pointInTimeJoin supports inner|left, got $how")
    if (strict) {
      val wnd = org.apache.spark.sql.expressions.Window
        .partitionBy(keys.map(lcol): _*).orderBy(lcol(validFrom))
      val overlaps = dim
        .withColumn("__nf", lead(lcol(validFrom), 1).over(wnd))
        .filter(col("__nf").isNotNull &&
          (lcol(validTo).isNull || lcol(validTo) > col("__nf")))
        .limit(1).count()
      require(overlaps == 0L,
        "pointInTimeJoin: dimension has overlapping validity intervals")
    }
    val dimAttrs = dim.columns.toSeq.filterNot(keys.contains)
    val clash = facts.columns.toSet.intersect(dimAttrs.toSet)
    require(clash.isEmpty,
      s"pointInTimeJoin: fact and dimension attribute names collide on " +
        s"${clash.mkString(", ")} — rename one side (the output would " +
        "carry ambiguous duplicate columns)")
    def q(side: String, c: String): Column =
      col(s"$side.`${c.replace("`", "``")}`")
    def fc(c: String) = q("__f", c)
    def dc(c: String) = q("__d", c)
    val f = facts.alias("__f")
    val d = dim.alias("__d")
    val cond = keys.map(k => fc(k) === dc(k)).reduce(_ && _) &&
      dc(validFrom) <= fc(factTimeCol) &&
      (dc(validTo).isNull || fc(factTimeCol) < dc(validTo))
    f.join(d, cond, how)
      .select(facts.columns.toSeq.map(c => fc(c).as(c)) ++
        dimAttrs.map(c => dc(c).as(c)): _*)
  }

  /** RIGHT-TO-BE-FORGOTTEN key deletion (GDPR Art. 17 / CCPA): every
    * target row whose `keyCols` tuple appears in the deletion request
    * drops; everything else passes through byte-identical. The
    * complement of [[mergeUpsert]]'s `deleteMatched` for the
    * erasure-request shape (a bare key list, not a CDC stream).
    *
    * Contracts (all loud, the appendTable lesson):
    *  - a NULL key ANYWHERE in the request raises — a NULL in a
    *    deletion list is a malformed request, and an equi-anti-join
    *    would silently match nothing;
    *  - target rows with NULL keys always SURVIVE (no request tuple can
    *    name them — standard SQL anti-join semantics, documented rather
    *    than accidental).
    *
    * Scale shape: ONE left-anti equi-join on the key tuple (requests
    * are small by nature — AQE broadcasts them); no shuffle of the
    * target beyond the join itself.
    *
    * RETENTION CAVEAT — this is a pure frame transform, NOT erasure by
    * itself: composed with the versioned warehouse
    * ([[graft.Warehouse.saveTableVersioned]]), the forgotten rows
    * remain readable through `loadTableVersion` / `loadTableAsOf`
    * until retention drops the prior versions. Erasure that is one
    * AT(version) away is not erasure — for versioned tables use
    * [[graft.Warehouse.forgetAndRewrite]], which commits the erased
    * frame as a new version AND purges every prior version still
    * holding a requested key, with a persisted audit row.
    */
  def forgetKeys(target: DataFrame, requests: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "forgetKeys: keyCols must be non-empty")
    target.join(checkedRequests(requests, keyCols), keyCols, "left_anti")
  }

  /** The distinct, NULL-asserted request-key frame [[forgetKeys]] erases
    * by — shared with [[graft.Warehouse.forgetAndRewrite]], whose
    * prior-version purge probes must match the erase's key semantics
    * EXACTLY (a divergence would purge the wrong history or none).
    */
  def checkedRequests(requests: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "forgetKeys: keyCols must be non-empty")
    val req = requests.select(keyCols.map(k =>
      lcol(k).as(k)): _*).distinct()
    keyCols.foldLeft(req) { (d, k) =>
      d.withColumn(k, expr(
        s"IF(`${k.replace("`", "``")}` IS NOT NULL, " +
          s"`${k.replace("`", "``")}`, assert_true(false, " +
          s"'forgetKeys: NULL `$k` in the deletion request — a malformed " +
          "erasure list; fix the request'))"))
    }
  }

  /** The audit row regulators ask for: counts before/removed/after and
    * how many requested keys actually matched (an erasure request for
    * an unknown key is NORMAL — already deleted — but the number is
    * reported). One row; single key column only (the common shape).
    */
  def forgetReport(target: DataFrame, requests: DataFrame,
      keyCol: String): DataFrame = {
    val t = target.select(lcol(keyCol).as("__k"))
    val req = forgetKeysChecked(requests, keyCol)
    val before = t.agg(count(lit(1)).as("n_before"))
    val matched = req.join(t.select(col("__k")).distinct(),
        req("__r") === col("__k"))
      .agg(count(lit(1)).as("n_keys_matched"))
    val removed = t.join(req, t("__k") === req("__r"), "left_semi")
      .agg(count(lit(1)).as("n_removed"))
    val nReq = req.agg(count(lit(1)).as("n_keys_requested"))
    before.crossJoin(removed).crossJoin(nReq).crossJoin(matched)
      .select(col("n_before"), col("n_removed"),
        (col("n_before") - col("n_removed")).as("n_after"),
        col("n_keys_requested"), col("n_keys_matched"))
  }

  private def forgetKeysChecked(requests: DataFrame,
      keyCol: String): DataFrame =
    requests.select(lcol(keyCol).as("__r")).distinct()
      .withColumn("__r", expr(
        "IF(__r IS NOT NULL, __r, assert_true(false, " +
          "'forgetKeys: NULL key in the deletion request — a malformed " +
          "erasure list; fix the request'))"))
}
