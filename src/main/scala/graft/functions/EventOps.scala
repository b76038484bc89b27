package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel and cohort-retention analytics over an event stream.
  *
  * Both are single-Exchange shapes: every window and every aggregate is
  * keyed by `user_id`, so the plan is one hash partition by user, one
  * sort within partitions, and map-side work after that — no per-event
  * state is ever collected into an array, so a pathological user with
  * millions of events streams through the window operator instead of
  * materializing (unlike a collect_list fold, this survives skew).
  */
object EventOps {

  /** SCD TYPE-2 HISTORY BUILD (Kimball's slowly-changing-dimension
    * type 2): turn a change log (key, ts, attributes…) into validity
    * intervals — one row per attribute VERSION with
    * [effective_from, effective_to) and an is_current marker, the
    * point-in-time dimension table every warehouse as-of join consumes.
    * Consecutive rows whose tracked attributes did not change are
    * compressed away (a re-emitted identical record opens no new
    * version), so the history is change-sized, not log-sized.
    *
    * Scale shape: everything is keyed by `keyCol` — one hash Exchange,
    * one sort, then the change-detect lag, the filter, and the
    * interval-close lead all evaluate in key-local window operators
    * (the [[funnel]] single-Exchange discipline); a key's full history
    * streams through the window, never materializing per-key arrays.
    *
    * @param seqCol   deterministic tie-break within equal timestamps
    *                 (an event id); intervals order by (tsCol, seqCol)
    * @param attrCols tracked attributes — any change in the tuple opens
    *                 a new version
    * @return keyCol, attrCols…, effective_from, effective_to (exclusive;
    *         null = open), is_current */
  def scd2History(log: DataFrame, keyCol: String, tsCol: String,
                  seqCol: String, attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "need at least one tracked attribute")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol).asc, col(seqCol).asc)
    val attrs = struct(attrCols.map(col): _*)
    log
      .withColumn("__prev", lag(attrs, 1).over(w))
      .where(col("__prev").isNull || !(col("__prev") <=> attrs))
      .withColumn("effective_from", col(tsCol))
      .withColumn("effective_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("effective_to").isNull)
      .select(col(keyCol) +: attrCols.map(col) :+ col("effective_from")
        :+ col("effective_to") :+ col("is_current"): _*)
  }

  /** Ordered conversion funnel: for each user, the earliest time of
    * step 1, the earliest step 2 STRICTLY after it, the earliest step 3
    * strictly after that, etc. Returns one row per funnel step:
    * (step, event_type, n_users, conv_from_first_milli).
    *
    * The existential "step i happened after some qualifying step i-1"
    * semantics falls out of a running-min recurrence: the running
    * minimum of qualifying step-(i-1) times is the earliest qualifier
    * so far, and `ts > runningMin` is then exactly "after some
    * qualifier". All running mins share one window frame (partition by
    * user, order by ts), so Catalyst plans ONE Exchange + ONE Sort and
    * evaluates the whole chain in a single Window operator.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val u = col(userCol); val ts = col(tsCol); val et = col(typeCol)
    val w = Window.partitionBy(u).orderBy(ts)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // q$i: this row's ts if it qualifies as step i (right type, strictly
    // after the earliest qualifying step i-1 seen so far = run$(i-1)).
    // Window functions can't nest inside window arguments, so each
    // running min is staged as its own projection; all share the same
    // (partition, order) spec, so the chain still plans one Exchange and
    // one Sort with consecutive Window operators on top. Rows with equal
    // ts order arbitrarily within the frame, but qualification is
    // STRICT (>), so frame order among ts-ties can't change any outcome.
    var staged = events
    steps.zipWithIndex.foreach { case (step, i) =>
      val q = if (i == 0) when(et === step, ts)
              else when(et === step && ts > col(s"run${i - 1}"), ts)
      staged = staged.withColumn(s"q$i", q)
      if (i < steps.size - 1)
        staged = staged.withColumn(s"run$i", min(col(s"q$i")).over(w))
    }

    val perUser = staged.groupBy(u)
      .agg(steps.indices.map(i => min(col(s"q$i")).as(s"t$i")).head,
        steps.indices.map(i => min(col(s"q$i")).as(s"t$i")).tail: _*)

    val counts = perUser.agg(
      steps.indices.map(i => count(col(s"t$i")).as(s"n$i")).head,
      steps.indices.map(i => count(col(s"t$i")).as(s"n$i")).tail: _*)

    val stages = steps.zipWithIndex.map { case (step, i) =>
      struct(lit(i.toLong + 1).as("step"), lit(step).as("event_type"),
        col(s"n$i").as("n_users"),
        round(col(s"n$i").cast("double") / col("n0") * 1000).cast("long")
          .as("conv_from_first_milli"))
    }
    counts.select(explode(array(stages: _*)).as("s")).select("s.*")
      .orderBy("step")
  }

  /** Weekly cohort retention: users are assigned to the week of their
    * first event (cohort), and each (cohort, week-offset) cell counts
    * the users from that cohort active in that week. Returns
    * (cohort_week, week_offset, n_users, retention_milli) where
    * retention is relative to the cohort's size (its offset-0 cell —
    * by construction every user is active in their first week).
    *
    * Scale: first-event time is a running window min keyed by user
    * (same single Exchange as the activity dedup that follows); the
    * final per-cell aggregate is cohort×offset-sized, i.e. tiny. The
    * cohort-size denominator is a window max over the cohort partition
    * of the already-tiny cell table, not a second pass over events.
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val u = col(userCol); val ts = col(tsCol)
    val first = Window.partitionBy(u)
    val cells = events
      .withColumn("cohort_week", date_trunc("week", min(ts).over(first)).cast("date"))
      .withColumn("week_offset",
        floor(datediff(date_trunc("week", ts).cast("date"), col("cohort_week")) / 7))
      .select(u, col("cohort_week"), col("week_offset"))
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
    val wc = Window.partitionBy("cohort_week")
    cells.withColumn("retention_milli",
        round(col("n_users").cast("double") /
          max(when(col("week_offset") === 0, col("n_users"))).over(wc) * 1000)
          .cast("long"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Trailing-window ANOMALY z-scores over hourly event-type counts —
    * the monitoring primitive that flags a feed breaking or a bot wave
    * arriving: for each (type, hour), compare the hour's count to the
    * mean/std of the previous `lookback` hours.
    *
    * Numerically: the trailing mean/std come from INTEGER window sums
    * (n, Σc, Σc²) via `z = (c·n − Σc) / √(n·Σc² − (Σc)²)` — exact
    * integers into one sqrt and one division, so there is no
    * accumulation-order float drift and any engine reproduces the milli
    * z bit-for-bit. Windows are RANGE-bounded on the integer hour index
    * (a gap of empty hours narrows the baseline rather than silently
    * stretching it); only full-baseline rows (n = lookback) emit a
    * score, and a zero-variance baseline emits NULL rather than ±∞.
    *
    * Scale shape: ONE (type, hour) count aggregate absorbs the corpus
    * map-side; the window partitions by type over hour buckets — state
    * bounded by the TIME RANGE, not the data volume (10× events in the
    * same month is the same window size).
    *
    * @return (typeCol, hidx, cnt, z_milli) for full-baseline hours
    */
  def anomalyZ(events: DataFrame, typeCol: String, tsCol: String,
               lookback: Int = 24): DataFrame = {
    require(lookback >= 2, s"lookback must be >= 2, got $lookback")
    val hidx = call_function("div", graft.Tables.epochNs(col(tsCol)),
      lit(3600L * 1000 * 1000 * 1000))
    val hourly = events
      .groupBy(col(typeCol), hidx.as("hidx"))
      .agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(typeCol).orderBy(col("hidx"))
      .rangeBetween(-lookback.toLong, -1L)
    hourly
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum("cnt").over(w))
      .withColumn("ssq", sum(col("cnt") * col("cnt")).over(w))
      .where(col("n") === lookback)
      .withColumn("z_milli",
        when(col("n") * col("ssq") - col("s") * col("s") > 0,
          round(lit(1000.0) * (col("cnt") * col("n") - col("s")).cast("double") /
            sqrt((col("n") * col("ssq") - col("s") * col("s")).cast("double")))
            .cast("long")))
      .select(typeCol, "hidx", "cnt", "z_milli")
  }

  /** One-sided upper CUSUM changepoint detection (Page 1954) over hourly
    * per-key event counts — the sequential mean-shift detector that
    * catches a sustained drift the pointwise [[anomalyZ]] z-score can't:
    * S_t = max(0, S_{t−1} + (x_t − μ − κ)), alarm when S_t > h.
    *
    * The order-dependent recurrence is computed CLOSED-FORM with two
    * windows via S_t = P_t − min(0, min_{j≤t} P_j) where P is the
    * running sum of the drifts — no iteration, no state. Everything is
    * INTEGER-EXACT: with n = the key's bucket count and T = its total,
    * the recurrence is scaled by n (drift n·x_t − T − κ·n), so μ = T/n
    * never becomes a float; `cusum_scaled` = n·S_t and the alarm test
    * S_t > h becomes cusum_scaled > h·n. Buckets with zero events
    * contribute no row (the detector sees the OBSERVED bucket sequence;
    * a gap is not evidence of a shift in either direction).
    *
    * Scale shape: one (key, hour) count aggregate, then three
    * key-partitioned windows over the bucket-sized frame — at 100 TB
    * the window side is keys × hours, not events.
    *
    * @param slack κ in counts/bucket (suppresses noise drift)
    * @param threshold h in CUSUM units (alarm level)
    * @return (typeCol, hidx, cnt, n_buckets, cusum_scaled, alarm) */
  /** FIXED-TARGET one-sided upper CUSUM (the textbook Page 1954 form):
    * drift y_t = x_t − μ₀ − κ against a KNOWN reference mean μ₀ instead
    * of [[cusum]]'s per-key empirical mean. Everything is INTEGER (no
    * n-scaling needed — μ₀ and κ are integer parameters), computed
    * closed-form with the same two-window identity
    * S_t = P_t − min(0, min_{j≤t} P_j).
    *
    * The fixed target makes the recurrence a MONOID over bucket
    * segments: a segment contributes (ΣY, min-prefix), and
    * (A·B).minPrefix = min(A.minPrefix, A.sum + B.minPrefix) — the
    * basis of the streaming store ([[graft.streaming.StreamingOps
    * .cusumAbsorbBatch]]), which [[cusum]]'s corpus-dependent μ can
    * never have. Scale shape: one (key, hour) count aggregate + two
    * key-partitioned windows over bucket-sized frames.
    *
    * @return (typeCol, hidx, cnt, cusum, alarm) per observed bucket */
  def cusumFixed(events: DataFrame, typeCol: String, tsCol: String,
                 mu0: Long, slack: Long = 0L, threshold: Long = 10L): DataFrame = {
    require(threshold > 0 && slack >= 0,
      s"threshold must be > 0 and slack >= 0, got $threshold/$slack")
    val hidx = call_function("div", graft.Tables.epochNs(col(tsCol)),
      lit(3600L * 1000 * 1000 * 1000))
    val wRun = org.apache.spark.sql.expressions.Window
      .partitionBy(typeCol).orderBy(col("hidx"))
      .rowsBetween(Long.MinValue, 0L)
    events
      .groupBy(col(typeCol), hidx.as("hidx"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("__y", col("cnt") - lit(mu0) - lit(slack))
      .withColumn("__p", sum("__y").over(wRun))
      .withColumn("cusum", col("__p") - least(lit(0L), min("__p").over(wRun)))
      .withColumn("alarm", col("cusum") > lit(threshold))
      .select(typeCol, "hidx", "cnt", "cusum", "alarm")
  }

  def cusum(events: DataFrame, typeCol: String, tsCol: String,
            slack: Long = 0L, threshold: Long = 10L): DataFrame = {
    require(slack >= 0 && threshold > 0,
      s"slack must be >= 0 and threshold > 0, got $slack/$threshold")
    val hidx = call_function("div", graft.Tables.epochNs(col(tsCol)),
      lit(3600L * 1000 * 1000 * 1000))
    val hourly = events
      .groupBy(col(typeCol), hidx.as("hidx"))
      .agg(count(lit(1)).as("cnt"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(typeCol)
    val wRun = org.apache.spark.sql.expressions.Window
      .partitionBy(typeCol).orderBy(col("hidx"))
      .rowsBetween(Long.MinValue, 0L)
    hourly
      .withColumn("n_buckets", count(lit(1)).over(wAll))
      .withColumn("__tot", sum("cnt").over(wAll))
      .withColumn("__y",
        col("n_buckets") * col("cnt") - col("__tot") - lit(slack) * col("n_buckets"))
      .withColumn("__p", sum("__y").over(wRun))
      .withColumn("cusum_scaled",
        col("__p") - least(lit(0L), min("__p").over(wRun)))
      .withColumn("alarm", col("cusum_scaled") > lit(threshold) * col("n_buckets"))
      .select(typeCol, "hidx", "cnt", "n_buckets", "cusum_scaled", "alarm")
  }
}
