package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-stage funnel analysis — for each key (user, session), how far
  * through a stage sequence (view → click → purchase, …) its event
  * stream progressed, where stage `i+1` only counts if it happens
  * STRICTLY AFTER the key's first qualifying stage-`i` event. The
  * product-analytics staple the reference engine has no analog for;
  * conversion counts per stage are the canonical readout.
  *
  * Semantics: `t₀` = min time of a stage-0 event; `tᵢ` = min time of a
  * stage-`i` event with `t > tᵢ₋₁` (the earliest-possible-completion
  * convention — matching the first stage-`i−1` occurrence maximizes the
  * chance of finding a later stage-`i`, so the reached count is the
  * supremum over interleavings). Ties on the exact same timestamp do
  * NOT advance the funnel (strict `>`): simultaneous events cannot
  * prove ordering.
  *
  * Scale shape: ONE shuffle. The chain of per-stage minima is a
  * sequence of unordered same-partitioning window aggregates — Catalyst
  * plans them over a single hash-partition Exchange (asserted in
  * FunnelSpec) — then the per-key row collapses through the same
  * partitioning. Events are pruned to the stage vocabulary before the
  * shuffle. All comparisons are on the raw time values (integral
  * nanos / timestamps), so reached-stage verdicts are exact and the
  * result hash-matches a SQL replay of the identical window chain. */
object Funnel {

  /** Per-key funnel: `keyCols…, t_0 … t_{n-1}` (first qualifying time
    * per stage, null once the chain breaks) and `stages_completed`.
    *
    * `maxGap` (optional, `timeCol` units) bounds each transition: stage
    * i qualifies only within `maxGap` of the CHAINED stage i−1 time —
    * the "checkout within 30 minutes of the click" contract. The
    * semantics stay the deterministic CHAINED-MIN chain (each stage
    * anchors on the earliest qualifying prior time); a later stage-0
    * occurrence is never re-anchored, so a gap-capped chain is the
    * CONSERVATIVE funnel — it can undercount versus the re-scanning
    * [[rescanFunnelByKey]] (which admits ANY qualifying prior event,
    * one RANGE-frame window pass more), never overcount; both variants
    * replay bit-for-bit in SQL. */
  def funnelByKey(events: DataFrame, keyCols: Seq[String], timeCol: String,
                  stageCol: String, stages: Seq[String],
                  maxGap: Option[Long] = None): DataFrame = {
    require(keyCols.nonEmpty, "funnelByKey needs at least one key column")
    require(stages.size >= 2, "a funnel needs at least 2 stages")
    require(stages.distinct.size == stages.size, "stages must be distinct")
    maxGap.foreach(g => require(g > 0, s"maxGap must be positive, got $g"))
    val w = Window.partitionBy(keyCols.map(col): _*)
    val t = col(timeCol)
    val pruned = events
      .filter(col(stageCol).isin(stages: _*) && t.isNotNull)
      .select(keyCols.map(col) :+ t.as("__t") :+ col(stageCol).as("__s"): _*)
    // chained unordered windows over ONE partitioning: stage i's min is
    // conditional on stage i−1's (already-windowed) min — no ordering,
    // no extra shuffle, one WindowExec chain
    val chained = stages.zipWithIndex.foldLeft(pruned) { case (df, (s, i)) =>
      val cond =
        if (i == 0) col("__s") === s
        else {
          val base = col("__s") === s && col("__t") > col(s"t_${i - 1}")
          maxGap.fold(base)(g =>
            base && col("__t") <= col(s"t_${i - 1}") + g)
        }
      df.withColumn(s"t_$i", min(when(cond, col("__t"))).over(w))
    }
    val tCols = stages.indices.map(i => col(s"t_$i"))
    val completed = tCols.map(c => when(c.isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    chained
      .select(keyCols.map(col) ++ tCols :+ completed.as("stages_completed"): _*)
      .distinct()
  }

  /** The funnel readout: one row per stage with the count of keys whose
    * chain reached it (`n_reached` is non-increasing in `stage`). */
  def conversionCounts(events: DataFrame, keyCols: Seq[String], timeCol: String,
                       stageCol: String, stages: Seq[String],
                       maxGap: Option[Long] = None): DataFrame =
    reachReadout(funnelByKey(events, keyCols, timeCol, stageCol, stages, maxGap),
      stages)

  /** EXACT re-scanning windowed funnel per key — the completion
    * semantics [[funnelByKey]]'s chained-min deliberately trades away:
    * there, stage i anchors on the single EARLIEST qualifying stage-(i−1)
    * time, so a user who misses the gap once but re-enters the funnel
    * later never converts. Here an event qualifies for stage i iff ANY
    * qualifying stage-(i−1) event sits strictly before it within
    * `maxGap` — the per-event flag `qᵢ(t) = (stage = sᵢ) ∧
    * ∃ qᵢ₋₁-event in [t − maxGap, t − 1]` — so re-scan reach DOMINATES
    * chained reach stage-for-stage (every chained anchor is itself a
    * qualifying event in the window; the ordering law is property-
    * tested in PropertySpec). `timeCol` must be integral (the q248
    * seconds grain):
    * the existence test is a value-RANGE window frame, exact integer
    * comparisons end-to-end, so the result hash-matches a SQL replay.
    *
    * Scale shape: still ONE shuffle — the per-stage existence flags are
    * chained RANGE-frame aggregates over one (key, time) sort, and the
    * final per-key collapse groups on the same partitioning. The frame
    * state per row is one running max, O(1); no self-join, no re-scan
    * blow-up at any gap width.
    *
    * Output: `(keyCols…, t_0 … t_{n-1}, stages_completed)` — `t_i` the
    * EARLIEST qualifying stage-i time (≥ chained's only in reach, not
    * value: chained may anchor later stages on earlier times; reach is
    * the comparable contract). */
  def rescanFunnelByKey(events: DataFrame, keyCols: Seq[String], timeCol: String,
                        stageCol: String, stages: Seq[String],
                        maxGap: Option[Long] = None): DataFrame = {
    require(keyCols.nonEmpty, "rescanFunnelByKey needs at least one key column")
    require(stages.size >= 2, "a funnel needs at least 2 stages")
    require(stages.distinct.size == stages.size, "stages must be distinct")
    maxGap.foreach(g => require(g > 0, s"maxGap must be positive, got $g"))
    val t = col(timeCol)
    val pruned = events
      .filter(col(stageCol).isin(stages: _*) && t.isNotNull)
      .select(keyCols.map(col) :+ t.as("__t") :+ col(stageCol).as("__s"): _*)
    val wOrd = Window.partitionBy(keyCols.map(col): _*).orderBy(col("__t"))
    val flagged = stages.zipWithIndex.foldLeft(pruned) { case (df, (s, i)) =>
      val q =
        if (i == 0) col("__s") === s
        else {
          // strictly-before within the gap: value range [t − g, t − 1] —
          // ties at t prove nothing (funnelByKey's strict-> convention)
          val frame = maxGap.fold(
            wOrd.rangeBetween(Window.unboundedPreceding, -1L))(g =>
            wOrd.rangeBetween(-g, -1L))
          col("__s") === s &&
            coalesce(max(when(col(s"__q_${i - 1}"), 1).otherwise(0))
              .over(frame), lit(0)) === 1
        }
      df.withColumn(s"__q_$i", q)
    }
    val aggs = stages.indices.map(i =>
      min(when(col(s"__q_$i"), col("__t"))).as(s"t_$i"))
    val tCols = stages.indices.map(i => col(s"t_$i"))
    val completed = tCols.map(c => when(c.isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    flagged.groupBy(keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("stages_completed", completed)
  }

  /** [[conversionCounts]]'s readout over the re-scanning semantics:
    * `n_reached` here ≥ the chained-min count at every stage. */
  def rescanConversionCounts(events: DataFrame, keyCols: Seq[String],
                             timeCol: String, stageCol: String,
                             stages: Seq[String],
                             maxGap: Option[Long] = None): DataFrame =
    reachReadout(
      rescanFunnelByKey(events, keyCols, timeCol, stageCol, stages, maxGap),
      stages)

  /** [[funnelByKey]] computed WITHOUT a per-key window — the hot-key
    * dial for funnel shapes (the round-8 probe: a window must hold a
    * key's whole event set in one task; a 91%-hot key pays ~4× with no
    * AQE recourse). Identical rows by construction: each stage is a
    * map-side-combinable conditional-min AGGREGATE — partial minima
    * collapse the hot key inside every input task before the shuffle —
    * with the chained prior time joined back onto the pruned events
    * (a join, where AQE skew-splitting DOES apply).
    *
    * The trade is explicit: `stages.size` passes over the pruned events
    * instead of one sorted window pass — wrong below the per-task
    * budget, right past it. Same `maxGap` chained-min semantics, same
    * output shape, equality-law-specced against [[funnelByKey]]. */
  def funnelByKeyAgg(events: DataFrame, keyCols: Seq[String], timeCol: String,
                     stageCol: String, stages: Seq[String],
                     maxGap: Option[Long] = None): DataFrame = {
    require(keyCols.nonEmpty, "funnelByKeyAgg needs at least one key column")
    require(stages.size >= 2, "a funnel needs at least 2 stages")
    require(stages.distinct.size == stages.size, "stages must be distinct")
    maxGap.foreach(g => require(g > 0, s"maxGap must be positive, got $g"))
    val t = col(timeCol)
    val pruned = events
      .filter(col(stageCol).isin(stages: _*) && t.isNotNull)
      .select(keyCols.map(col) :+ t.as("__t") :+ col(stageCol).as("__s"): _*)
    var acc = pruned.groupBy(keyCols.map(col): _*)
      .agg(min(when(col("__s") === stages.head, col("__t"))).as("t_0"))
    for (i <- 1 until stages.size) {
      val prev = col(s"t_${i - 1}")
      val base = col("__s") === stages(i) && col("__t") > prev
      val cond = maxGap.fold(base)(g => base && col("__t") <= prev + g)
      val ti = pruned
        .join(acc.select(keyCols.map(col) :+ prev: _*), keyCols)
        .groupBy(keyCols.map(col): _*)
        .agg(min(when(cond, col("__t"))).as(s"t_$i"))
      acc = acc.join(ti, keyCols)
    }
    val tCols = stages.indices.map(i => col(s"t_$i"))
    val completed = tCols.map(c => when(c.isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    acc.withColumn("stages_completed", completed)
  }

  /** [[conversionCounts]] over the aggregate path — same rows, hot-key
    * immune. */
  def conversionCountsAgg(events: DataFrame, keyCols: Seq[String],
                          timeCol: String, stageCol: String,
                          stages: Seq[String],
                          maxGap: Option[Long] = None): DataFrame =
    reachReadout(
      funnelByKeyAgg(events, keyCols, timeCol, stageCol, stages, maxGap),
      stages)

  /** Measured ceiling on the plain window funnel's hot-key ELAPSED
    * penalty (SURVEY §8 hot100/auto, 11M rows, 91%-hot key): the funnel
    * window holds only STAGE-VOCAB rows and its chained minima are
    * unordered aggregates over one hash partitioning, so the hot key's
    * one-task cost landed ~4× the even per-slot share and the
    * END-TO-END penalty 2.65× (6.41 s vs 2.42 s uniform) — nothing like
    * the 29× the row-share ratio predicts, because scan + shuffle
    * dominate at probe scale. Rounded up to 3. */
  private[graft] val WindowHotElapsedBound = 3.0

  /** The auto-route's arithmetic, exposed for the spec: the aggregate
    * path wins on TIME only when its pass count (one pruned-events scan
    * per stage) is under the plain window's bounded hot-key penalty AND
    * the hot key actually exceeds that many per-slot shares — with the
    * measured bound of 3 that is reachable for 2-stage funnels only.
    * Round 13's sweep caught the previous pass-count-only rule engaging
    * the 3-stage dial into parity-or-worse (7.45 s vs 6.41 s plain) at
    * 91% skew; this rule refuses that trade. Independently, past
    * `hotRowsCeiling` PRUNED rows on one key the aggregate path engages
    * regardless: the elapsed bound was measured where scan cost
    * dominates, and a hot key holding ~50M+ stage rows turns the
    * window's one task — unsplittable by any cluster width — into a
    * linear straggler and a memory hazard, while the agg path's
    * per-(key, stage) minima stay map-side-combined and flat. */
  private[graft] def aggRouteWins(nStages: Int, mx: Long, tot: Long,
                                  slots: Int, hotRowsCeiling: Long): Boolean = {
    val winsOnTime = nStages < WindowHotElapsedBound &&
      tot > 0 && mx.toDouble * slots > nStages.toDouble * tot
    winsOnTime || mx > hotRowsCeiling
  }

  /** AUTO-routed funnel readout: probes the hottest key's share of the
    * STAGE-PRUNED events (what the window actually holds) via
    * [[graft.operators.Skew.hotKeyStats]] and routes per
    * [[aggRouteWins]] — zero-config deployment of the q261 dial, with
    * the measured window-penalty bound folded in so the dial never
    * fires where it loses. Both routes emit contractually identical
    * rows (the FunnelSpec equality law), so a borderline call costs
    * overhead only, never correctness. */
  def conversionCountsAuto(events: DataFrame, keyCols: Seq[String],
                           timeCol: String, stageCol: String,
                           stages: Seq[String],
                           maxGap: Option[Long] = None,
                           hotRowsCeiling: Long = 50000000L): DataFrame = {
    val pruned = events.filter(
      col(stageCol).isin(stages: _*) && col(timeCol).isNotNull)
    val slots = events.sparkSession.sparkContext.defaultParallelism
    val engage =
      if (stages.size >= WindowHotElapsedBound) {
        // the time crossover is UNREACHABLE at this pass count, so only
        // the survival ceiling can engage — and mx <= pruned rows <=
        // total rows, so the gates cheapen left to right: a bare
        // count() (column-pruned to ZERO columns — parquet answers it
        // from footers), then the filter-pushed pruned count, then the
        // per-key grid probe, each run only if the previous bound
        // clears the ceiling. A 3+-stage funnel below ~50M raw rows —
        // the common case by far — routes with no data scan at all.
        events.count() > hotRowsCeiling &&
        pruned.count() > hotRowsCeiling && {
          val (mx, _) = Skew.hotKeyStats(pruned, keyCols)
          mx > hotRowsCeiling
        }
      } else {
        val (mx, tot) = Skew.hotKeyStats(pruned, keyCols)
        aggRouteWins(stages.size, mx, tot, slots, hotRowsCeiling)
      }
    if (engage)
      conversionCountsAgg(events, keyCols, timeCol, stageCol, stages, maxGap)
    else conversionCounts(events, keyCols, timeCol, stageCol, stages, maxGap)
  }

  /** Shared stage-reach readout over a per-key funnel frame (any variant
    * emitting `stages_completed`). */
  private def reachReadout(byKey: DataFrame, stages: Seq[String]): DataFrame = {
    val spark = byKey.sparkSession
    import spark.implicits._
    val stageIdx = stages.zipWithIndex.map { case (s, i) => (i, s) }
      .toDF("stage", "stage_name")
    byKey.crossJoin(broadcast(stageIdx))
      .filter(col("stages_completed") > col("stage"))
      .groupBy("stage", "stage_name")
      .agg(count(lit(1)).as("n_reached"))
  }

  /** Cohort retention matrix — users bucketed by their FIRST active
    * period (`cohort`), then counted in every later period they return
    * (`offset` = periods since the cohort period). The classic
    * product-analytics readout the reference engine has no analog for.
    *
    * `bucketCol` is any integral period index the caller derives
    * (epoch-week, epoch-month…) — keeping the calendar OUT of the
    * operator makes every comparison pure integer arithmetic, so the
    * matrix hash-matches a SQL replay exactly. `retained_permille` is
    * the exact integer `n_users·1000 div cohort_size` (offset 0 is
    * 1000 by construction).
    *
    * Scale shape: TWO shuffles, both with map-side partial
    * aggregation. `collect_set` per user dedups (user, period) pairs
    * while grouping — the per-user state is the user's distinct period
    * set (bounded by the calendar, ~100s), so no separate `distinct`
    * shuffle and no per-user window are needed; the cohort is
    * `array_min` of the set, computed map-side before the tiny
    * (cohort, offset) aggregate. */
  def cohortRetention(events: DataFrame, userCol: String,
                      bucketCol: String): DataFrame = {
    val perUser = events
      .filter(col(userCol).isNotNull && col(bucketCol).isNotNull)
      .select(col(userCol).as("__u"), col(bucketCol).cast("long").as("__b"))
      .groupBy(col("__u")).agg(collect_set(col("__b")).as("__bs"))
    val counts = perUser
      .select(array_min(col("__bs")).as("cohort"), explode(col("__bs")).as("__b"))
      .groupBy(col("cohort"), (col("__b") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("n_users"))
    val wCohort = Window.partitionBy(col("cohort"))
    counts
      .withColumn("__c0",
        max(when(col("offset") === 0, col("n_users"))).over(wCohort))
      .withColumn("retained_permille",
        expr("n_users * 1000 div __c0"))
      .drop("__c0")
  }

  /** Rolling active users — for every period `w`, the count of DISTINCT
    * users with any activity in the trailing window
    * `[w − windowPeriods + 1, w]` (windowPeriods = 4 over epoch-weeks is
    * the rolling-4-week-actives staple). Exact, not sketched: windowed
    * `count(DISTINCT)` has no shuffle-free form, so the operator rewrites
    * it as membership explosion — each distinct (user, period) pair
    * feeds the `windowPeriods` windows that can see it, and the window
    * count dedups users who were active in several covered periods.
    *
    * Scale shape: the explosion happens AFTER per-user dedup (one
    * `collect_set` aggregate shrinks raw events to distinct pairs), so
    * the distinct-count shuffle carries ≤ windowPeriods × |distinct
    * pairs| rows, never raw events. Output is trimmed to observed
    * periods: `period, active_users`. */
  def rollingActiveUsers(events: DataFrame, userCol: String,
                         bucketCol: String, windowPeriods: Int): DataFrame = {
    require(windowPeriods >= 1, s"windowPeriods must be >= 1, got $windowPeriods")
    val pairs = events
      .filter(col(userCol).isNotNull && col(bucketCol).isNotNull)
      .select(col(userCol).as("__u"), col(bucketCol).cast("long").as("__b"))
      .groupBy(col("__u")).agg(collect_set(col("__b")).as("__bs"))
      .select(col("__u"), explode(col("__bs")).as("__b"))
    val bounds = pairs.agg(min(col("__b")).as("__lo"), max(col("__b")).as("__hi"))
    pairs
      .select(col("__u"),
        explode(sequence(col("__b"), col("__b") + lit(windowPeriods - 1)))
          .as("period"))
      .crossJoin(broadcast(bounds))
      .filter(col("period") <= col("__hi"))
      .groupBy(col("period"))
      .agg(countDistinct(col("__u")).as("active_users"))
  }

  /** First/last-touch attribution — each conversion event credited to
    * the earliest and the latest touch event STRICTLY BEFORE it in the
    * key's stream, with conversions that no touch preceded credited to
    * `(none)`. Output: one row per (first_touch, last_touch) channel
    * pair with the conversion count.
    *
    * Ordering is the (time, tiebreakCol) lexicographic row order, so
    * same-timestamp events resolve deterministically and the counts
    * hash-match a SQL replay of the identical window. Scale shape: ONE
    * shuffle — both conditional window scans (`first`/`last` with
    * ignoreNulls over the preceding-rows frame) share the per-key
    * sort-partitioning, then the channel-pair aggregate collapses a
    * frame already pruned to conversion rows. */
  def touchAttribution(events: DataFrame, keyCols: Seq[String],
                       timeCol: String, tiebreakCol: String,
                       channelCol: String, touchChannels: Seq[String],
                       conversionChannel: String): DataFrame = {
    require(touchChannels.nonEmpty, "touchAttribution needs touch channels")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(timeCol), col(tiebreakCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col(channelCol).isin(touchChannels: _*), col(channelCol))
    val pruned = events
      .filter(col(channelCol).isin(touchChannels :+ conversionChannel: _*) &&
        col(timeCol).isNotNull)
    pruned
      .withColumn("__first", first(touch, ignoreNulls = true).over(w))
      .withColumn("__last", last(touch, ignoreNulls = true).over(w))
      .filter(col(channelCol) === conversionChannel)
      .groupBy(coalesce(col("__first"), lit("(none)")).as("first_touch"),
        coalesce(col("__last"), lit("(none)")).as("last_touch"))
      .agg(count(lit(1)).as("n_conversions"))
  }

  /** First-order state-transition matrix over each key's event sequence —
    * the product-analytics "what happens after X" readout (and the
    * empirical Markov chain [[graft.text.Corpus.nextTokenTable]] reads
    * only the argmax of): every consecutive `(state_i, state_{i+1})`
    * pair, counted, with the conditional probability as integer permille
    * of the from-state's outgoing total. Rows where `lead` runs off the
    * key's sequence end contribute nothing (no self-loop padding).
    *
    * Plan shape: ONE (keys)-partitioned lead window sorted by
    * `(timeCol, tieCols)` — tie columns pin the successor at equal
    * timestamps, same contract as [[Features.timeWeightedAvg]] — then a
    * (from, to) aggregate; the outgoing totals re-aggregate FROM the
    * transition table (transition-matrix-sized, broadcast back), so raw
    * events shuffle exactly once. */
  def transitionMatrix(events: DataFrame, keyCols: Seq[String], timeCol: String,
                       stateCol: String, tieCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "transitionMatrix needs at least one key column")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((col(timeCol) +: tieCols.map(col)): _*)
    val trans = events
      .filter(col(timeCol).isNotNull && col(stateCol).isNotNull)
      .withColumn("__to", lead(col(stateCol), 1).over(w))
      .filter(col("__to").isNotNull)
      .groupBy(col(stateCol).as("from_state"), col("__to").as("to_state"))
      .agg(count(lit(1)).as("n"))
    val outTotals = trans.groupBy(col("from_state"))
      .agg(sum(col("n")).as("__out"))
    trans.join(broadcast(outTotals), Seq("from_state"))
      .select(col("from_state"), col("to_state"), col("n"),
        expr("n * 1000 div __out").as("p_permille"))
  }

  /** Per-group Markov entropy rate — how PREDICTABLE are the event
    * sequences: `H = Σ_s (n_s/N)·H(next|s)` over the first-order
    * transition grid, plus `predictability = 1 − H/ln(K)`.
    * [[transitionMatrix]] shows WHICH transitions happen; the entropy
    * rate compresses the whole matrix into the one scalar a
    * monitoring/segmentation readout wants (rate → 0: deterministic
    * flows, users on rails; → ln K: uniform chaos — e.g. bot cohorts
    * score near-deterministic while organic traffic doesn't).
    *
    * Exactness: transition counts are exact integers off one lead
    * window; each conditional-entropy TERM is a fixed double tree
    * e9-quantized to BIGINT before summing (the nmiFromCells
    * discipline); the rate is the exact integer
    * `Σ_s n_s·h_s_e9 div N` (DECIMAL product sum), and predictability
    * is one tree over it, e6-quantized. `n_states` = K counts the
    * distinct states over the UNION of from- and to-states (a terminal
    * state that only ever appears as a to-state still enlarges the
    * alphabet — normalizing by from-states alone could push
    * H(next|s) past ln K and predictability negative). Groups with a
    * single observed state (K = 1) emit null predictability.
    *
    * Scale shape: one window per sequence key shared with the grid
    * aggregate; everything after is transition-grid-sized. Output:
    * `(groupCols…, n_transitions, n_states, entropy_rate_e9,
    * predictability_e6)`. */
  def markovEntropyRate(events: DataFrame, groupCols: Seq[String],
                        seqCols: Seq[String], timeCol: String,
                        stateCol: String,
                        tieCols: Seq[String] = Nil): DataFrame = {
    require(groupCols.nonEmpty, "markovEntropyRate needs group columns")
    require(seqCols.nonEmpty, "markovEntropyRate needs sequence key columns")
    val g = groupCols.map(col)
    val w = Window.partitionBy((groupCols ++ seqCols).map(col): _*)
      .orderBy((col(timeCol) +: tieCols.map(col)): _*)
    val cells = graft.functions.Cols.dropNullKeys(events, groupCols)
      .filter(col(timeCol).isNotNull && col(stateCol).isNotNull &&
        seqCols.map(col(_).isNotNull).reduce(_ && _))
      .withColumn("__to", lead(col(stateCol), 1).over(w))
      .filter(col("__to").isNotNull)
      .groupBy(g :+ col(stateCol).as("__from") :+ col("__to"): _*)
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint(false)
    val fromTot = cells.groupBy(g :+ col("__from"): _*)
      .agg(sum(col("__c")).as("__ns"))
    val hs = cells.join(fromTot, groupCols :+ "__from")
      .withColumn("__t", expr(
        """cast(floor(-(cast(__c as double) / cast(__ns as double))
          |  * ln(cast(__c as double) / cast(__ns as double))
          |  * 1000000000 + 0.5) as bigint)""".stripMargin))
      .groupBy(g :+ col("__from"): _*)
      .agg(max(col("__ns")).as("__ns"), sum(col("__t")).as("__hs"))
    // K over the union alphabet: a terminal-only state still counts
    val alphabet = cells.select(g :+ col("__from").as("__st"): _*)
      .union(cells.select(g :+ col("__to").as("__st"): _*))
      .distinct()
      .groupBy(g: _*).agg(count(lit(1)).as("n_states"))
    hs.groupBy(g: _*)
      .agg(sum(col("__ns")).as("n_transitions"),
        sum(expr("cast(__ns as decimal(38,0)) * __hs")).as("__num"))
      .join(alphabet, groupCols)
      .withColumn("entropy_rate_e9",
        expr("cast(__num div n_transitions as bigint)"))
      .withColumn("predictability_e6", expr(
        """case when n_states >= 2 then
          |  cast(floor((1.0 - cast(entropy_rate_e9 as double) / 1e9
          |      / ln(cast(n_states as double)))
          |    * 1000000 + 0.5) as bigint)
          |end""".stripMargin))
      .drop("__num")
  }

  /** Two-variant funnel A/B readout — for each consecutive stage
    * transition, the pooled two-proportion z between the variants'
    * conversion rates: THE experiment question ("did the new checkout
    * change click→purchase") asked where it lives, on the funnel
    * transitions. [[conversionCounts]] describes one funnel;
    * this compares two.
    *
    * Exactness (the q222 discipline): reach counts are exact integers
    * off [[funnelByKey]]'s chained mins (variant rides as an extra key
    * column — a user's variant is constant, so the chain is unchanged);
    * z is ONE fixed double tree over four integers, e4-quantized, with
    * the pooled-variance guard (`se > 0`) decided on exact integers.
    * Transitions where either variant has zero prior-stage reach emit
    * null z.
    *
    * Output: one row per transition —
    * `(stage, stage_name, n_a, x_a, n_b, x_b, rate_a_e6, rate_b_e6,
    * z_e4)`; `n` = reach of the prior stage, `x` = reach of this one. */
  def funnelVariantZ(events: DataFrame, keyCols: Seq[String],
                     variantCol: String, timeCol: String, stageCol: String,
                     stages: Seq[String], variantA: String,
                     variantB: String): DataFrame = {
    val byKey = funnelByKey(events, keyCols :+ variantCol, timeCol,
      stageCol, stages)
    val spark = events.sparkSession
    import spark.implicits._
    val stageIdx = stages.zipWithIndex.map { case (s, i) => (i, s) }
      .toDF("stage", "stage_name")
    val reach = byKey.crossJoin(broadcast(stageIdx.select(col("stage"))))
      .filter(col("stages_completed") > col("stage"))
      .groupBy(col(variantCol).as("__var"), col("stage"))
      .agg(count(lit(1)).as("__r"))
    variantZFromReach(reach, stages, variantA, variantB)
  }

  /** The A/B readout over a `(__var, stage, __r)` per-variant reach
    * table — split out so the STREAMING funnel's drained advance counts
    * (which equal the batch reach exactly) share the identical
    * densify/pivot/z pipeline and oracle
    * ([[graft.streaming.StreamingCollapse]]'s twin). */
  private[graft] def variantZFromReach(reach: DataFrame, stages: Seq[String],
                                       variantA: String,
                                       variantB: String): DataFrame = {
    val spark = reach.sparkSession
    import spark.implicits._
    val stageIdx = stages.zipWithIndex.map { case (s, i) => (i, s) }
      .toDF("stage", "stage_name")
    // DENSIFY over the full (variant x stage) grid before the lag: a
    // groupBy emits only non-zero counts, so a variant with ZERO reach
    // at a stage — the strongest possible effect, exactly what an A/B
    // readout exists to surface — would otherwise make the transition
    // row vanish instead of scoring x = 0
    val grid = Seq(variantA, variantB).toDF("__var")
      .crossJoin(broadcast(stageIdx.select(col("stage"))))
    val dense = grid.join(reach, Seq("__var", "stage"), "left")
      .withColumn("__r", coalesce(col("__r"), lit(0L)))
    val w = Window.partitionBy(col("__var")).orderBy(col("stage"))
    val trans = dense
      .withColumn("__n", lag(col("__r"), 1).over(w))
      .filter(col("stage") >= 1)
      .select(col("__var"), col("stage"), col("__n"), col("__r").as("__x"))
    // ONE conditional pivot, not an A-side/B-side self-join: filtered
    // branches would each recompute the whole funnel lineage (the plan
    // showed the chained-min window running twice)
    val names = stages.sliding(2).zipWithIndex
      .map { case (Seq(p, q), i) => (i + 1, s"$p->$q") }.toSeq
      .toDF("stage", "stage_name")
    trans.groupBy(col("stage"))
      .agg(
        max(when(col("__var") === variantA, col("__n"))).as("n_a"),
        max(when(col("__var") === variantA, col("__x"))).as("x_a"),
        max(when(col("__var") === variantB, col("__n"))).as("n_b"),
        max(when(col("__var") === variantB, col("__x"))).as("x_b"))
      .join(broadcast(names), Seq("stage"))
      .withColumn("rate_a_e6", expr("x_a * 1000000 div nullif(n_a, 0)"))
      .withColumn("rate_b_e6", expr("x_b * 1000000 div nullif(n_b, 0)"))
      .withColumn("z_e4", expr(
        """case when n_a > 0 and n_b > 0
          |       and (x_a + x_b) > 0 and (x_a + x_b) < (n_a + n_b) then
          |  cast(floor((cast(x_a as double) / n_a - cast(x_b as double) / n_b)
          |    / sqrt(cast(x_a + x_b as double) / (n_a + n_b)
          |           * (1 - cast(x_a + x_b as double) / (n_a + n_b))
          |           * (cast(1 as double) / n_a + cast(1 as double) / n_b))
          |    * 10000 + 0.5) as bigint) end""".stripMargin))
      .select(col("stage"), col("stage_name"), col("n_a"), col("x_a"),
        col("n_b"), col("x_b"), col("rate_a_e6"), col("rate_b_e6"), col("z_e4"))
  }

  /** Per-transition time-to-convert profile — for each consecutive
    * funnel stage pair, how long converters took: count, min, LOWER
    * median, max of `t_i − t_{i−1}` over [[funnelByKey]]'s chained-min
    * times. The latency half of the funnel ([[conversionCounts]] says
    * how many; this says how fast) — the readout that separates "users
    * drop at checkout" from "users stall at checkout".
    *
    * Exactness: lags are integer differences in `timeCol`'s units
    * (caller coarsens — seconds for product funnels); the median is the
    * exact LOWER rank element walked over the per-(transition, lag)
    * count grid (the [[graft.operators.Sketch]] convention, no
    * interpolation), so every column hash-matches a SQL replay.
    *
    * Scale shape: the chained mins ride funnelByKey's ONE unordered
    * key-window; transitions explode from the per-key row (≤ #stages−1
    * rows each); the median walk runs over (transition, lag) counts —
    * map-side combined, grid-sized for coarsened lags. Output:
    * `(stage, stage_name, n_pairs, min_lag, median_lag, max_lag)` —
    * `stage` i is the transition stages(i−1) → stages(i). */
  def conversionLag(events: DataFrame, keyCols: Seq[String], timeCol: String,
                    stageCol: String, stages: Seq[String]): DataFrame = {
    val byKey = funnelByKey(events, keyCols, timeCol, stageCol, stages)
    val spark = events.sparkSession
    import spark.implicits._
    val lags = byKey.select(explode(array((1 until stages.size).map { i =>
      struct(lit(i).as("stage"),
        (col(s"t_$i") - col(s"t_${i - 1}")).as("lag"))
    }: _*)).as("__tr"))
      .select(col("__tr.stage").as("stage"), col("__tr.lag").as("lag"))
      .filter(col("lag").isNotNull)
      // lazy localCheckpoint: two consumers (the median's count grid and
      // the min/max aggregate) would otherwise re-run funnelByKey's
      // window + distinct. Checkpoint blocks share the computation like
      // persist but without a CacheManager entry that outlives the call —
      // the ContextCleaner frees them once the result is unreachable.
      .localCheckpoint(false)
    val counts = lags.groupBy(col("stage"), col("lag"))
      .agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(col("stage")).orderBy(col("lag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("stage"))
    val med = counts
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(wAll))
      .filter(col("__cum") >= expr("(__n + 1) div 2"))
      .groupBy(col("stage")).agg(min(col("lag")).as("median_lag"))
    val stageNames = stages.sliding(2).zipWithIndex
      .map { case (Seq(a, b), i) => (i + 1, s"$a->$b") }.toSeq
      .toDF("stage", "stage_name")
    lags.groupBy(col("stage"))
      .agg(count(lit(1)).as("n_pairs"), min(col("lag")).as("min_lag"),
        max(col("lag")).as("max_lag"))
      .join(med, Seq("stage"))
      .join(broadcast(stageNames), Seq("stage"))
      .select(col("stage"), col("stage_name"), col("n_pairs"),
        col("min_lag"), col("median_lag"), col("max_lag"))
  }

  /** RFM segmentation — the classic product-analytics customer grid:
    * per-user Recency (days since last event), Frequency (event count),
    * Monetary (integer value sum) scored into `buckets` quantile bands
    * each, then rolled up to segment cells with the conventional
    * labels (champion / loyal / big_spender / at_risk / churned /
    * other). R inverts (most recent = top score); F and M ascend.
    *
    * Exactness: the three quantile fence sets come off per-dimension
    * VALUE-COUNT GRIDS with the [[graft.operators.Sketch.weightedPercentiles]]
    * cross-multiplication convention (`cum·buckets ≥ i·n` — no float
    * rank), broadcast back as one fence row; a score is
    * `1 + #{fences < v}` (strictly-greater test, so fence ties land
    * deterministically in the lower band). Everything that crosses a
    * row boundary is an exact integer.
    *
    * Scale shape: one per-user aggregate (map-side combined), three
    * value-grid windows (grid-sized, NOT user-sized), one broadcast
    * fence join, one cell rollup. No global row window anywhere —
    * user-count-independent plan. Output: one row per populated
    * (r_score, f_score, m_score) cell with `(…, segment, n_users,
    * monetary_sum)`. */
  def rfmSegments(events: DataFrame, userCol: String, tsCol: String,
                  valueCol: String, buckets: Int = 5,
                  monetaryBin: Long = 1L): DataFrame = {
    // the segment-label CASE (hi = buckets-1, at_risk band f in [3, hi))
    // is only well-formed from 5 bands up: below that 'at_risk' is
    // unreachable and 'champion' degenerates to everyone
    require(buckets >= 5 && buckets <= 10,
      s"buckets must be in [5, 10], got $buckets")
    require(monetaryBin >= 1, s"monetaryBin must be positive, got $monetaryBin")
    val perUser = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull &&
        col(valueCol).isNotNull)
      .groupBy(col(userCol).as("__u"))
      .agg(max(col(tsCol)).as("__last"), count(lit(1)).as("__f"),
        sum(col(valueCol).cast("long")).as("__m"))
    val gmax = perUser.agg(max(col("__last")).as("__gmax"))
    val dims = perUser.crossJoin(broadcast(gmax))
      .withColumn("__r", expr("(__gmax - __last) div 86400000000"))
      // the monetary DIM grid bins (the ksDrift dial) so the fence
      // window stays value-grid-sized, not user-sized; sums stay exact
      .withColumn("__mb", expr(s"__m div $monetaryBin"))
      .select(col("__u"), col("__r"), col("__f"), col("__m"), col("__mb"))
      // lazy localCheckpoint: three fence grids + the score join all
      // read this frame
      .localCheckpoint(false)
    def fences(dim: String): DataFrame = {
      val grid = dims.groupBy(col(dim).as("__v")).agg(count(lit(1)).as("__c"))
      val run = Window.orderBy(col("__v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val all = Window.partitionBy(lit(1))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val cum = grid
        .withColumn("__cum", sum(col("__c")).over(run))
        .withColumn("__n", sum(col("__c")).over(all))
      val aggs = (1 until buckets).map(i =>
        min(when(col("__cum") * buckets >= lit(i) * col("__n"), col("__v")))
          .as(s"${dim}_t$i"))
      cum.agg(aggs.head, aggs.tail: _*)
    }
    def scoreAsc(dim: String): org.apache.spark.sql.Column =
      (1 until buckets).map(i =>
        when(col(dim) > col(s"${dim}_t$i"), 1).otherwise(0))
        .reduce(_ + _) + 1
    val scored = dims
      .crossJoin(broadcast(fences("__r")))
      .crossJoin(broadcast(fences("__f")))
      .crossJoin(broadcast(fences("__mb")))
      .withColumn("r_score", lit(buckets) + 1 - scoreAsc("__r"))
      .withColumn("f_score", scoreAsc("__f"))
      .withColumn("m_score", scoreAsc("__mb"))
    val hi = buckets - 1 // "top band or above" threshold
    val lo = 2           // "bottom two bands" threshold
    scored.groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_users"), sum(col("__m")).as("monetary_sum"))
      .withColumn("segment", expr(
        s"""case
           |when r_score >= $hi and f_score >= $hi and m_score >= $hi
           |  then 'champion'
           |when f_score >= $hi then 'loyal'
           |when m_score >= $hi then 'big_spender'
           |when r_score <= $lo and f_score >= 3 then 'at_risk'
           |when r_score <= $lo then 'churned'
           |else 'other' end""".stripMargin))
  }
}
