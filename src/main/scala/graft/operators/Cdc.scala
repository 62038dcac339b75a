package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC changelog compaction — the merge-on-read half of a lakehouse
  * upsert: a stream of row-level change events
  * `(key…, version, op ∈ {insert/update/delete}, payload…)` folded to
  * the CURRENT snapshot (latest surviving version per key, deletes
  * tombstoned out). The reference engine has no CDC surface; this is
  * extension-tier plumbing a 100 TB training-data pipeline needs the
  * moment its corpus is kept incrementally up to date instead of
  * rebuilt.
  *
  * Scale shape: the default path is ONE aggregation — `max_by(row,
  * (version, tiebreak…))` per key — not a window. The difference
  * matters at 100 TB: a window shuffles EVERY changelog row to its
  * key's partition and sorts them all, while the aggregate form ships
  * one partially-merged row per (map task, key) across the wire
  * (map-side combine), which for the common high-churn-few-keys
  * changelog is orders of magnitude less shuffle volume. The struct
  * ordering key makes the fold deterministic as long as
  * `(version, tiebreak…)` is unique per key — same uniqueness contract
  * pandas' `drop_duplicates(keep='last')` silently assumes, made loud
  * here.
  *
  * Determinism contract: with duplicate `(key, version, tiebreak…)`
  * rows, `max_by` keeps whichever duplicate a partial merge saw first —
  * pass a tiebreak that completes the order (e.g. a source LSN) rather
  * than relying on luck. */
object Cdc {

  /** Fold a changelog to its current snapshot.
    *
    * Output: every changelog column except `opCol`, one row per live
    * key — the payload of the highest `(versionCol, tieBreak…)` event;
    * keys whose latest event has `opCol == deleteOp` are absent.
    *
    * @param tieBreak extra ordering columns completing the per-key total
    *                 order when `versionCol` alone can tie */
  def applyChanges(changes: DataFrame, keyCols: Seq[String], versionCol: String,
                   opCol: String, deleteOp: String = "D",
                   tieBreak: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "applyChanges needs at least one key column")
    val others = changes.columns.filterNot(keyCols.contains)
    require(others.contains(versionCol) || keyCols.contains(versionCol),
      s"version column $versionCol not found")
    val ordKey = struct((versionCol +: tieBreak).map(col): _*)
    // the whole candidate row rides inside the aggregation buffer; the
    // final projection unpacks it back to flat columns
    val rowStruct = struct(others.map(col): _*)
    changes.groupBy(keyCols.map(col): _*)
      .agg(max_by(rowStruct, ordKey).as("__r"))
      .select(keyCols.map(col) ++
        others.map(c => col(s"__r.`$c`").as(c)): _*)
      .filter(col(opCol) =!= lit(deleteOp))
      .drop(opCol)
  }

  /** Last-writer-wins PER-FIELD consolidation (the LWW-register-map CRDT
    * shape, and pandas' `groupby(...).last()` with per-column NaN skip):
    * where [[applyChanges]] keeps the latest ROW wholesale — a partial
    * update carrying nulls would wipe older fields — this merges partial
    * updates by letting EVERY column independently keep its latest
    * NON-NULL value. The classic use is profile/record consolidation
    * from sparse event streams.
    *
    * ONE aggregate: each column is a `max_by(value, order-if-non-null)`
    * beside its siblings (null order keys are skipped by the aggregate,
    * which is exactly the non-null filter), map-side combined, one row
    * per (task, key) across the shuffle. `versionCol ++ tieBreak` must
    * totally order each key's events — a tie would make "latest"
    * engine-dependent. Output: keys, latest non-null payload fields,
    * `last_version`, `n_updates`. */
  def lwwConsolidate(changes: DataFrame, keyCols: Seq[String], versionCol: String,
                     tieBreak: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "lwwConsolidate needs at least one key column")
    val meta = keyCols.toSet + versionCol ++ tieBreak
    val payload = changes.columns.filterNot(meta.contains)
    require(payload.nonEmpty, "lwwConsolidate needs at least one payload column")
    val ordKey = struct((versionCol +: tieBreak).map(col): _*)
    val aggs = payload.map(c =>
      max_by(col(c), when(col(c).isNotNull, ordKey)).as(c)) ++ Seq(
      max(col(versionCol)).as("last_version"),
      count(lit(1)).as("n_updates"))
    changes.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Window-sort form of [[applyChanges]] for payloads the struct
    * ordering cannot carry through an aggregate (MapType is unorderable;
    * `max_by` also rejects it inside the candidate struct on some
    * plans). Same answer, heavier shuffle: every changelog row crosses
    * the wire and sorts per key. Prefer [[applyChanges]] unless the
    * schema forces this. */
  def applyChangesSorted(changes: DataFrame, keyCols: Seq[String],
                         versionCol: String, opCol: String,
                         deleteOp: String = "D",
                         tieBreak: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "applyChangesSorted needs at least one key column")
    require(!changes.columns.contains("__rn"),
      "applyChangesSorted uses __rn internally — rename the existing column")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((versionCol +: tieBreak).map(col(_).desc): _*)
    changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= lit(deleteOp))
      .drop("__rn", opCol)
  }

  /** Batch MERGE (upsert) — the copy-on-write half of the lakehouse
    * upsert family, beside [[applyChanges]]' merge-on-read changelog fold
    * and [[scd2]]'s history build: apply ONE batch of keyed mutations to
    * a current snapshot. A source row with `opCol == deleteOp` deletes
    * its key; any other source row REPLACES its key's row (matched →
    * update, unmatched → insert — the `WHEN MATCHED UPDATE / WHEN NOT
    * MATCHED INSERT / WHEN MATCHED AND op='D' DELETE` triad of SQL
    * `MERGE INTO`, restricted to whole-row updates).
    *
    * Scale shape: NOT a full-outer join. The mutation batch is small
    * relative to the snapshot by contract (a day's changes vs years of
    * state), so the rewrite is `target LEFT ANTI source-keys` (untouched
    * rows pass through; with `broadcastSource` the anti join is a
    * broadcast — the 100 TB target never shuffles) `UNION ALL` the
    * source's surviving rows. A full-outer join would shuffle BOTH
    * sides on key to decide row fates the anti join decides for free.
    *
    * Determinism contract: the source must have at most one row per key
    * (the SQL MERGE cardinality rule — engines raise
    * "multiple source rows matched" at runtime; here duplicate source
    * rows would BOTH survive, so the contract is documented loud, and
    * [[applyChanges]] is the right tool to collapse a multi-event batch
    * to one mutation per key first).
    *
    * Output: target's columns; source must carry the same columns plus
    * `opCol`. */
  def merge(target: DataFrame, source: DataFrame, keyCols: Seq[String],
            opCol: String, deleteOp: String = "D",
            broadcastSource: Boolean = true): DataFrame = {
    require(keyCols.nonEmpty, "merge needs at least one key column")
    require(source.columns.contains(opCol), s"op column $opCol not found in source")
    val missing = target.columns.filterNot(source.columns.contains)
    require(missing.isEmpty,
      s"source is missing target columns: ${missing.mkString(", ")}")
    val keys = source.select(keyCols.map(col): _*).distinct()
    val keysMaybeB = if (broadcastSource) broadcast(keys) else keys
    val untouched = target.join(keysMaybeB, keyCols, "left_anti")
    val applied = source.filter(col(opCol) =!= lit(deleteOp))
      .select(target.columns.map(col).toSeq: _*)
    untouched.unionByName(applied)
  }

  /** Slowly-changing-dimension Type 2 history build — the full-history
    * complement of [[applyChanges]]'s current-snapshot fold: every
    * non-delete change event becomes a versioned dimension row with a
    * validity interval `[valid_from, valid_to)`, closed by the NEXT
    * event on the same key (any op — an update supersedes, a delete
    * tombstones) and open (`valid_to` null, `is_current` true) for a
    * key whose last event survives. A delete emits no row of its own;
    * it only closes its predecessor's interval — so a key whose
    * history ends in a delete has NO current row, matching the
    * snapshot fold's tombstone semantics exactly (SCD2 of a changelog
    * restricted to `is_current` = [[applyChanges]] of that changelog).
    *
    * Scale shape: one window — partition by key, sort by
    * `(version, tieBreak…)`, a single `lead` — i.e. exactly one
    * shuffle of the changelog, the minimum any interval construction
    * needs (closing an interval requires seeing the key's next event).
    * Unlike the snapshot fold there is no aggregate shortcut: every
    * event row IS an output row, so map-side combine has nothing to
    * collapse. Same determinism contract as the siblings:
    * `(version, tieBreak…)` must totally order each key's events. */
  def scd2(changes: DataFrame, keyCols: Seq[String], versionCol: String,
           opCol: String, deleteOp: String = "D",
           tieBreak: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "scd2 needs at least one key column")
    val reserved = Seq("valid_from", "valid_to", "is_current")
    reserved.foreach { c =>
      require(!changes.columns.contains(c),
        s"scd2 emits a `$c` column — rename the existing one") }
    val ord = (versionCol +: tieBreak).map(col)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
    val payload = changes.columns.filterNot(c =>
      keyCols.contains(c) || c == opCol || c == versionCol)
    changes
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .filter(col(opCol) =!= lit(deleteOp))
      .select(keyCols.map(col) ++
        Seq(col(versionCol).as("valid_from"), col("valid_to"),
          col("valid_to").isNull.as("is_current")) ++
        payload.map(col): _*)
  }

  /** Snapshot reconciliation — the symmetric diff of two same-schema
    * tables by key: which keys were `added`, `removed`, or `changed`
    * (any payload column differs, null-safely), with unchanged keys —
    * the overwhelming majority in real reconciliation — dropped inside
    * the join stage before anything else materializes. The anti-entropy
    * primitive for validating a migration, a replica, or an incremental
    * pipeline (e.g. [[merge]]'s output) against a full rebuild.
    *
    * Comparison is per-column null-safe equality (`<=>`), not a row
    * hash: type-exact (no float-formatting or hash-collision caveats)
    * and it lets the operator report WHICH columns drifted
    * (`n_diff_cols`, plus `diff_cols` as a sorted name array).
    *
    * Scale shape: one co-partitioned full-outer sort-merge join on the
    * key — the minimum for a symmetric diff; both sides shuffle once,
    * nothing is broadcast (snapshots are both big by assumption).
    * Output: `keyCols…, op, n_diff_cols, diff_cols`. */
  def tableDiff(before: DataFrame, after: DataFrame,
                keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "tableDiff needs at least one key column")
    require(before.columns.sorted.sameElements(after.columns.sorted),
      "tableDiff requires identical schemas; project first")
    val payload = before.columns.filterNot(keyCols.contains).sorted.toSeq
    // presence sentinels survive the key-coalescing full-outer join
    val b = before.select(keyCols.map(col) ++
      payload.map(c => col(c).as(s"__b_$c")) :+ lit(true).as("__in_b"): _*)
    val a = after.select(keyCols.map(col) ++
      payload.map(c => col(c).as(s"__a_$c")) :+ lit(true).as("__in_a"): _*)
    val diffArr = array_compact(array(payload.map(c =>
      when(!(col(s"__b_$c") <=> col(s"__a_$c")), lit(c))): _*))
    b.join(a, keyCols, "full_outer")
      .withColumn("op",
        when(col("__in_b").isNull, lit("added"))
          .when(col("__in_a").isNull, lit("removed"))
          .when(size(diffArr) > 0, lit("changed")))
      .filter(col("op").isNotNull) // unchanged rows die inside the join stage
      .withColumn("diff_cols",
        when(col("op") === "changed", array_sort(diffArr)))
      .withColumn("n_diff_cols",
        when(col("op") === "changed", size(col("diff_cols"))))
      .select(keyCols.map(col) :+ col("op") :+ col("n_diff_cols") :+
        col("diff_cols"): _*)
  }
}
