package graft.streaming

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming slice (SURVEY.md §2.10).
  *
  * The reference approximates streaming with 30-minute cron micro-batches
  * (football-data-pipeline.yml:5-10); here the same semantics are expressed
  * as real streaming queries. Every transform is a pure DataFrame→DataFrame
  * function usable on BOTH a batch frame and a stream (the batch twins in
  * the query registry are the oracle-verified versions — DuckDB can't check
  * a stream).
  */
object Streams {

  /** ST6 — tumbling event-time window aggregation with watermark (daily
    * report shape; 1-hour windows on the events stream). Late data beyond
    * 30 minutes is dropped by the watermark — the reference's 45-minute job
    * expiry is the same policy applied to jobs (ST4). */
  def windowedValueAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(27,6)")).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("event_type"), col("n"),
        col("total_value"))

  /** STREAMING PSI DRIFT MONITOR (the stream twin of
    * [[graft.operators.Reports.psiDrift]]): per tumbling event-time
    * day, the population-stability index of the bucket distribution
    * against a fixed REFERENCE distribution (the training mix),
    * in the engine's 1/64-bit fixed-point log₂ — the
    * serving-side distribution-shift alarm, integer-exact so batch
    * and stream agree bit-for-bit (StreamsSpec runs this very
    * function in batch mode as the oracle).
    *
    *   psi64 = Σ_{b ∈ ref} (wc·NR − rc·NW)·(lg64(wc·NR) − lg64(rc·NW))
    *
    * with wc = window count of bucket b PLUS ONE (add-one smoothing —
    * reference counts are passed already-positive), NW/NR the
    * smoothed totals. Two chained stateful aggs (the
    * [[dailyDistinctStream]] shape): (window, bucket) counts, then a
    * per-window fold of the ≤|ref|-entry bucket map — state is
    * bucket-bounded per window, never row-bounded; the PSI itself is
    * a codegen'd literal fold, no UDF, no libm. */
  def psiDriftStream(events: DataFrame, bucketCol: String,
      reference: Seq[(String, Long)]): DataFrame = {
    require(reference.nonEmpty && reference.forall(_._2 > 0),
      "reference counts must be positive (pre-smoothed)")
    val refN = reference.map(_._2).sum
    val counts = events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 day"), col(bucketCol).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val perWin = counts
      .groupBy(col("window"))
      .agg(map_from_entries(collect_list(
        struct(col("bucket"), col("cnt")))).as("wmap"),
        sum(col("cnt")).as("n_events"))
    def wc(b: String): Column =
      coalesce(element_at(col("wmap"), lit(b)), lit(0L)) + lit(1L)
    val nw = reference.map { case (b, _) => wc(b) }.reduce(_ + _)
    val psi = reference.map { case (b, rc) =>
      val pn = wc(b) * lit(refN)
      val qn = lit(rc) * col("_nw")
      (pn - qn) * (graft.operators.NaiveBayes.lg64(pn) -
        graft.operators.NaiveBayes.lg64(qn))
    }.reduce(_ + _)
    perWin.withColumn("_nw", nw)
      .withColumn("psi64", psi)
      .select(col("window.start").as("day_start"), col("n_events"),
        col("psi64"))
  }

  /** VALUE-DISTRIBUTION ENTROPY monitor per (day window, event_type):
    * Shannon entropy of the clamped value-bucket histogram in lg64
    * fixed point — ent_x64 = (n·lg64(n) − Σ c·lg64(c)) div n — the
    * COLLAPSE detector: a stuck upstream (constant values) drives
    * entropy to 0 while counts and means still look healthy.
    * Complements [[psiDriftStream]] (needs a reference mix) with a
    * reference-free per-window signal. Buckets clamp to [0, 19]
    * (value div 25, capped), so level-2 state is bucket-bounded per
    * (window, type). Two CHAINED event-time aggregations (the
    * [[dailyDistinctStream]] shape); the entropy itself is a post-agg
    * codegen projection — no UDF, no libm, bit-identical when the same
    * body runs in batch (the StreamsSpec oracle). */
  def entropyMonitorStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 day"), col("event_type"),
        least(greatest(floor(col("value") / lit(25.0)), lit(0.0)),
          lit(19.0)).cast("long").as("_bkt"))
      .agg(count(lit(1)).as("_c"))
      .groupBy(col("window"), col("event_type"))
      .agg(sum(col("_c")).as("n_events"),
        sum(col("_c") * graft.operators.NaiveBayes.lg64(col("_c")))
          .as("_sclg"),
        count(lit(1)).as("n_buckets"))
      .withColumn("_lgn", graft.operators.NaiveBayes.lg64(col("n_events")))
      .withColumn("ent_x64",
        expr("(n_events * _lgn - _sclg) div n_events"))
      .select(col("window.start").as("day_start"), col("event_type"),
        col("n_events"), col("n_buckets"), col("ent_x64"))

  /** STREAMING QUANTILE SKETCH — the stream twin of
    * [[graft.operators.Aggregates.bottomKQuantiles]] (q_quantile_sketch):
    * per (day window, event type), p50/p90 estimates from the k
    * md5-smallest rows. The reason this streams AT ALL is the sketch's
    * merge property: union-take-k is associative/commutative, so the
    * micro-batch partials merge in the state store exactly like
    * map-side partials do in batch, and state is k rows per (window,
    * type) — watermark-bounded, never the raw stream. Because the
    * sample is an md5 property of the data, the stream and batch runs
    * emit BIT-IDENTICAL estimates regardless of micro-batch slicing
    * (the StreamsSpec pin). */
  def quantileSketchStream(events: DataFrame, k: Int = 64): DataFrame = {
    val bk = udaf(new graft.functions.BottomKAgg(k))
    events
      .withWatermark("ts", "30 minutes")
      .withColumn("_h",
        md5(concat(lit("qsk:"), col("event_id").cast("string"))))
      .withColumn("_v",
        (col("value").cast(org.apache.spark.sql.types.DecimalType(27, 6))
          * lit(1000000)).cast("long").cast("double"))
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"), bk(col("_h"), col("_v")).as("_smp"))
      .withColumn("_k", size(col("_smp")).cast("long"))
      .select(col("window.start").as("day_start"), col("event_type"),
        col("n"), col("_k").as("k_eff"),
        element_at(col("_smp"),
          (expr("((_k - 1) * 50) div 100") + lit(1L)).cast("int"))
          .cast("long").as("p50_est"),
        element_at(col("_smp"),
          (expr("((_k - 1) * 90) div 100") + lit(1L)).cast("int"))
          .cast("long").as("p90_est"))
  }

  /** EXACT daily distinct users per event type on the stream via
    * mergeable bitmaps (stream twin of the [[graft.operators.Bitmaps]]
    * family, q_bitmap_distinct / q_bitmap_rolling): level 1 groups
    * (day window, type, id-bucket) and builds bounded bitmaps whose
    * partial states merge associatively across micro-batches; level 2
    * sums per-bucket counts — two CHAINED event-time aggregations on
    * the same window (Spark's multiple-stateful-operator support),
    * both watermark-bounded. Distinct-counting state is 4 KB per
    * (window, type, bucket), never an id set — the reason exact
    * streaming distinct is tractable at all. */
  /** ST-ext — STREAMING INCREMENTAL VIEW MAINTENANCE (the stream twin
    * of [[graft.queries.IvmQueries.qIvmAgg]]'s delta merge): a CDC
    * stream of (user_id, day, cents, mult) rows — inserts mult = +1,
    * retractions mult = −1 — maintains the additive view state
    * (n = Σmult, sum_cents = Σmult·cents) through Spark's streaming
    * aggregation, whose state store IS the materialized view: each
    * micro-batch applies exactly the bag-semantics IVM merge the batch
    * operator performs, so stream ≡ batch bit-for-bit at any batch
    * slicing (pinned in StreamsSpec against the batch gate's own
    * carve-out). Consumers filter n > 0 (zero-multiplicity groups are
    * retained rows in Complete mode, dropped rows in the batch view).
    * State is one row per (user, day) — entity-time bounded, the same
    * bound the stored view itself has; no watermark because a
    * retraction may target arbitrarily old groups (the IVM contract,
    * not a leak). */
  def ivmMaintainStream(deltas: DataFrame): DataFrame =
    deltas.groupBy(col("user_id"), col("day"))
      .agg(sum(col("mult")).as("n"),
        sum(col("mult") * col("cents")).as("sum_cents"))

  def dailyDistinctStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 day"), col("event_type"),
        expr("bitmap_bucket_number(user_id)").as("_bkt"))
      .agg(expr("bitmap_count(bitmap_construct_agg(" +
        "bitmap_bit_position(user_id)))").as("_c"))
      .groupBy(col("window"), col("event_type"))
      .agg(sum(col("_c")).as("n_users"))
      .select(col("window.start").as("day_start"), col("event_type"),
        col("n_users"))

  /** ST7 — sliding alert window: per (user, type), 1-hour window sliding
    * every 15 minutes, emitting windows whose value range exceeds the
    * movement threshold (the odds-movement alert as a windowed query —
    * LAG is not available on streams; min/max over the window detects the
    * same >threshold movement). */
  def slidingMovementAlert(events: DataFrame, threshold: Double): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"),
        col("user_id"), col("event_type"))
      .agg(min("value").as("min_v"), max("value").as("max_v"),
        count(lit(1)).as("n"))
      .filter(col("min_v") > 0 &&
        (col("max_v") - col("min_v")) / col("min_v") > threshold)
      .select(col("window.start").as("window_start"), col("user_id"),
        col("event_type"), col("min_v"), col("max_v"), col("n"))

  /** Streaming sessionization with a PER-KEY gap (the stream twin of
    * [[graft.operators.Windows.sessionizeKeyedGap]]): `session_window`
    * takes the gap as an EXPRESSION of the row, so one stream sessionizes
    * every entity class at its own cadence — no per-class topologies.
    * `gapByKey` must produce CalendarIntervalType (ANSI interval literals
    * resolve to DayTimeIntervalType and are rejected by session_window;
    * build with `expr("cast('5 minutes' as interval)")`-style branches).
    * State is bounded by the watermark as with any session window.
    * Equivalence with the batch formulation is pinned in StreamsSpec. */
  def sessionizeKeyedGap(events: DataFrame, keyCol: String,
      gapByKey: Column): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), gapByKey), col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(27,6)")).cast("double").as("total_value"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("n_events"), col("total_value"))

  /** Streaming DECONTAMINATION (the stream twin of
    * [[graft.operators.Dedup.contaminationPairs]]): flag incoming docs that
    * share any word n-gram with a STATIC benchmark gram set — the check an
    * ingest pipeline runs on every new document before it reaches the
    * training store. Stream-static BROADCAST semi-join on hashed grams
    * (the bench side is small by nature and never changes mid-run), so the
    * per-batch cost is one gram pass + probe; the only state is the
    * within-watermark dedup of flagged ids (a doc matching 50 grams must
    * flag once).
    *
    * @param benchGrams static frame with a single `g: long` column —
    *                   produce with [[graft.operators.Dedup.gramHashes]] +
    *                   explode + distinct */
  def decontaminateStream(docs: DataFrame, benchGrams: DataFrame,
      n: Int = 13): DataFrame =
    docs
      .withWatermark("ts", "10 minutes")
      .select(col("doc_id"), col("ts"),
        explode(graft.operators.Dedup.gramHashes(col("text"), n)).as("g"))
      .join(broadcast(benchGrams), Seq("g"), "left_semi")
      .dropDuplicatesWithinWatermark("doc_id")
      .select(col("doc_id"), col("ts"))

  /** Streaming PII SCRUB (the stream twin of [[graft.functions.Redact]]):
    * redact emails/phones on every incoming doc before it reaches the
    * training store. Completely STATELESS — a pure codegen'd projection,
    * no watermark, no state store — which is the point: scrubbing belongs
    * at ingest where it costs a map pass, not in a batch repair job after
    * PII already landed. Emits per-doc redaction counts for monitoring. */
  def piiScrubStream(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("ts"),
      graft.functions.Redact.emailCount(col("text")).cast("long").as("n_emails"),
      graft.functions.Redact.phoneCount(col("text")).cast("long").as("n_phones"),
      graft.functions.Redact.scrub(col("text")).as("text"))

  /** Streaming exact dedup for ingest pipelines (the stream twin of
    * [[graft.operators.Dedup.exactDuplicates]]): fingerprint the normalized
    * text and keep the FIRST arrival per fingerprint within the watermark
    * horizon. `dropDuplicatesWithinWatermark` bounds the dedup state — at
    * 100 TB/day of ingest, unbounded dedup state is the thing that kills a
    * stream, so the horizon is the contract: duplicates farther apart than
    * the watermark are passed through and left to the batch dedup
    * compaction. */
  def streamingDedup(docs: DataFrame, tsCol: String,
      textCol: String, watermark: String): DataFrame =
    docs.withColumn("__fp",
        graft.functions.TextFeatures.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** Streaming INCREMENTAL dedup against a STATIC corpus (the stream twin
    * of [[graft.operators.Dedup.incrementalExact]]): drop incoming docs
    * whose fingerprint already exists in the corpus (stream-static
    * LEFT-ANTI join — at scale the corpus fingerprint set is the bucketed
    * table the batch ingest maintains), then first-arrival-wins within the
    * watermark horizon for new-vs-new duplicates. Corpus membership is
    * stateless per batch; only the within-horizon dedup holds state —
    * the same bounded-state contract as [[streamingDedup]].
    *
    * @param corpusFps static frame with a single `__fp: long` column —
    *                  produce with `TextFeatures.fingerprint` + distinct */
  def incrementalDedupStream(docs: DataFrame, corpusFps: DataFrame,
      tsCol: String, textCol: String, watermark: String): DataFrame =
    docs.withColumn("__fp",
        graft.functions.TextFeatures.fingerprint(col(textCol)))
      .join(corpusFps, Seq("__fp"), "left_anti")
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** Streaming NEAR-dup candidate flagging against a STATIC corpus (the
    * stream twin of [[graft.operators.Dedup.minhashCrossPairs]]'s
    * candidate stage): each incoming doc is signed with the fused MinHash
    * expression, exploded to its (band, bucket) keys, and stream-static
    * inner-joined against the corpus's precomputed band table
    * ([[graft.operators.Dedup.corpusBandTable]] — at scale, a maintained
    * bucketed table). A (new, corpus) pair emits once per watermark
    * horizon (`dropDuplicatesWithinWatermark` collapses multi-band hits —
    * the same bounded-state contract as [[streamingDedup]]). Exact
    * Jaccard verification stays a batch job over the emitted candidates:
    * it needs corpus text, and candidates are the bounded set. */
  def nearDupCandidateStream(docs: DataFrame, corpusBands: DataFrame,
      tsCol: String, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 5,
      watermark: String = "10 minutes"): DataFrame = {
    val norm = lower(trim(regexp_replace(col(textCol), "\\s+", " ")))
    val sig = graft.functions.MinHashTextSignature.minhashText(
      norm, shingleSize, numHashes)
    docs.select(col(idCol).as("id_new"), col(tsCol).as("__ts"), sig.as("__sig"))
      .select(col("id_new"), col("__ts"),
        explode(graft.operators.Dedup.lshBands(col("__sig"), bands, numHashes))
          .as("b"))
      .select(col("id_new"), col("__ts"), col("b.band").as("band"),
        col("b.bucket").as("bucket"))
      .join(corpusBands, Seq("band", "bucket"))
      .withWatermark("__ts", watermark)
      .dropDuplicatesWithinWatermark("id_new", "id_corpus")
      .select(col("id_new"), col("id_corpus"))
  }

  /** ST-ext — watermarked STREAM-STREAM inner join: correlate each
    * `leftType` event with the same user's `rightType` events landing
    * strictly after it and within `horizonMinutes` (view→purchase
    * conversion pairing; the reference correlates odds movements with
    * fixture updates on the same 30-min cadence). The time-RANGE join
    * condition is expressed directly on the two event-time columns so
    * Structured Streaming derives state-eviction bounds from the
    * watermarks: each side buffers at most `horizonMinutes` + watermark
    * of history per key — state is bounded by TIME, not by stream
    * length, which is what makes the join runnable forever at scale.
    * Pure DataFrame→DataFrame: on a batch frame the watermarks are
    * no-ops and the same code is the oracle-gated twin (q_event_pairs);
    * stream/batch equivalence is pinned in StreamsSpec. */
  /** `joinType` "inner" emits matches as they arrive; "left_outer" ALSO
    * emits each unmatched `leftType` event (null r_id/gap_us) once the
    * watermark passes its horizon — i.e. "views that never converted",
    * produced incrementally with the same bounded state. */
  def eventPairsStream(events: DataFrame, leftType: String,
      rightType: String, horizonMinutes: Int,
      joinType: String = "inner"): DataFrame = {
    val wm = s"$horizonMinutes minutes"
    val l = events.filter(col("event_type") === leftType)
      .select(col("user_id"), col("event_id").as("l_id"),
        col("ts").as("l_ts"))
      .withWatermark("l_ts", wm)
    val r = events.filter(col("event_type") === rightType)
      .select(col("user_id").as("__r_user"), col("event_id").as("r_id"),
        col("ts").as("r_ts"))
      .withWatermark("r_ts", wm)
    l.join(r, col("user_id") === col("__r_user")
        && col("r_ts") > col("l_ts")
        && col("r_ts") <= col("l_ts") +
          expr(s"INTERVAL $horizonMinutes MINUTES"), joinType)
      .select(col("user_id"), col("l_id"), col("r_id"),
        (unix_micros(col("r_ts")) - unix_micros(col("l_ts"))).as("gap_us"))
  }

  /** Streaming CURATION INGEST — the stream twin of the training-export
    * pipeline's front half, composed from the proven pieces: quality +
    * language gates (stateless single-pass expressions), incremental
    * exact dedup against the static corpus fingerprint set plus
    * first-arrival-wins within the watermark horizon, then the stateless
    * PII scrub. The ONLY stateful operator is the bounded within-horizon
    * dedup — everything else is a map pass, so the pipeline sustains
    * ingest-rate throughput and its state never grows with corpus size.
    * Docs emerge curated, deduplicated, and scrubbed — ready for the
    * training store; batch compaction handles beyond-horizon duplicates
    * (same contract as [[streamingDedup]]). */
  def curationIngestStream(docs: DataFrame, corpusFps: DataFrame,
      tsCol: String, textCol: String, langCol: String,
      minQuality: Double = 0.75, watermark: String = "10 minutes"): DataFrame = {
    val gated = docs
      .filter(graft.functions.TextFeatures.qualityScoreFast(col(textCol)) >= minQuality)
      .filter(graft.functions.TextFeatures.langIdFast(col(textCol)) === col(langCol))
    incrementalDedupStream(gated, corpusFps, tsCol, textCol, watermark)
      .withColumn(textCol, graft.functions.Redact.scrub(col(textCol)))
  }

  /** Per-key running state for ST5 (online-learning cache) / W2-on-streams:
    * last observed value per (user, type) via flatMapGroupsWithState,
    * emitting a movement record whenever the new value deviates more than
    * `threshold` from the previous one. State = last value; timeout
    * configured by the caller's processing trigger.
    *
    * SKEW BOUND: `rows.toSeq.sortBy` materializes ONE KEY's events from ONE
    * micro-batch on one task (flatMapGroupsWithState gives no intra-group
    * order, so the sort is mandatory for LAG semantics). The buffer is
    * bounded by trigger-interval × per-key event rate — for the reference's
    * per-fixture odds feed that is a few rows; a pathologically hot key at
    * 100× is handled by shortening the trigger interval (smaller batches,
    * same state), not by repartitioning (the key must stay on one task to
    * keep state consistent). */
  case class KeyedValue(user_id: Long, event_type: String, ts: java.sql.Timestamp,
      value: Double)
  case class Movement(user_id: Long, event_type: String,
      ts: java.sql.Timestamp, prev_value: Double, value: Double,
      rel_change: Double)

  /** STREAMING FUNNEL — the incremental twin of
    * [[graft.operators.Funnel.funnelSteps]]: per-user state is just the
    * next-expected-step index; an arriving event of that type advances it
    * and emits an advance record. The batch operator's "earliest step-i
    * event at-or-after the step-(i−1) reach" is exactly this greedy
    * in-order scan, so on in-order delivery the stream's final per-user
    * step equals the batch reach count (pinned in StreamsSpec across
    * multiple micro-batches).
    *
    * Intra-batch order is restored by the same (ts, event_id) sort the
    * batch windows use (flatMapGroupsWithState gives no intra-group
    * order); ACROSS batches the scan is order-of-arrival — late
    * out-of-order events can under-count a funnel step, the standard
    * trade of an O(1)-state streaming funnel (the alternative, buffering
    * events until a watermark, is [[jobStateMachine]]'s shape).
    * State per user is ONE int regardless of event volume. */
  case class FunnelAdvance(user_id: Long, step: Long, step_name: String,
      ts: java.sql.Timestamp)

  def funnelStream(spark: SparkSession, events: DataFrame,
      steps: Seq[String]): DataFrame = {
    import spark.implicits._
    events.select(col("user_id"), col("ts"), col("event_type"),
        col("event_id"))
      .as[(Long, java.sql.Timestamp, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Int, FunnelAdvance](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state: GroupState[Int]) =>
          // full-microsecond order: getTime is millis-resolution, so two
          // events inside the same millisecond must tie-break on getNanos
          // BEFORE event_id to match the batch (ts, event_id) total order
          val sorted = rows.toSeq.sortBy(e => (e._2.getTime, e._2.getNanos, e._4))
          var next = state.getOption.getOrElse(0)
          val out = scala.collection.mutable.ArrayBuffer.empty[FunnelAdvance]
          sorted.foreach { e =>
            if (next < steps.length && e._3 == steps(next)) {
              out += FunnelAdvance(uid, (next + 1).toLong, steps(next), e._2)
              next += 1
            }
          }
          state.update(next)
          out.iterator
      }.toDF()
  }

  def movementDetector(spark: SparkSession, events: DataFrame,
      threshold: Double): DataFrame = {
    import spark.implicits._
    events.select(col("user_id"), col("event_type"), col("ts"), col("value"))
      .as[KeyedValue]
      .groupByKey(kv => (kv.user_id, kv.event_type))
      .flatMapGroupsWithState[Double, Movement](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, rows, state: GroupState[Double]) =>
          // sort within key by event time: micro-batches preserve no order.
          // getTime is millis-resolution — same-millisecond events must
          // tie-break on getNanos (then value, for full determinism), the
          // funnelStream discipline
          val sorted = rows.toSeq.sortBy(kv =>
            (kv.ts.getTime, kv.ts.getNanos, kv.value))
          val out = scala.collection.mutable.ArrayBuffer.empty[Movement]
          var prev = state.getOption
          sorted.foreach { kv =>
            prev.foreach { p =>
              if (p != 0 && math.abs((kv.value - p) / p) > threshold)
                out += Movement(kv.user_id, kv.event_type, kv.ts, p, kv.value,
                  (kv.value - p) / p)
            }
            prev = Some(kv.value)
          }
          prev.foreach(state.update)
          out.iterator
      }.toDF()
  }

  /** STREAMING SCD2 ENRICHMENT — event-time dimension lookup on a
    * stream: each event joins the dimension VERSION that was valid at
    * its event time (`valid_from ≤ ts < valid_to` against a static
    * [[graft.operators.Joins.scd2History]] table), not the current
    * row — the lookup that makes late events reproduce the enrichment
    * they would have received live. STATELESS: the dimension is a
    * static broadcast (stream-static joins need no state store), so
    * this composes with watermarks/aggregations downstream freely;
    * interval bounds compare as the engine's fixed-width fmtTs strings
    * (lexicographic = chronological, high-date sentinel included).
    * At 100 TB the dimension history is versions-per-entity bounded —
    * broadcastable by construction. Unmatched events keep NULL dim
    * columns (left join): an event BEFORE the entity's first version
    * is a real state every pipeline must represent. */
  def scd2EnrichStream(events: DataFrame, eventKeyCol: String,
      dim: DataFrame, dimKeyCol: String, dimValueCol: String)
      : DataFrame = {
    val fts = graft.Det.fmtTs(col("ts"))
    val d = dim.select(col(dimKeyCol).as("__dk"),
      col(dimValueCol).as("dim_value"), col("valid_from"),
      col("valid_to"))
    events.withColumn("__fts", fts)
      .join(broadcast(d),
        col(eventKeyCol) === col("__dk") &&
          col("__fts") >= col("valid_from") &&
          col("__fts") < col("valid_to"),
        "left_outer")
      .drop("__dk", "__fts")
  }

  /** STREAMING PER-KEY TOP-K — the incremental twin of the W5 batch
    * rank-in-group (q_rank_in_group): per key, state is ONLY the
    * current k best (value desc, event_id asc ties) — O(k) per key
    * regardless of stream volume — and the operator emits an
    * ADMISSION record whenever an arriving event enters the running
    * top-k, carrying the evicted id (if any). Replaying
    * admitted − evicted reconstructs the exact top-k at any point, and
    * after the stream drains it equals the batch window top-k
    * (StreamsSpec pins this across micro-batches). Intra-batch order
    * is restored by the (getTime, getNanos, event_id) sort — the
    * funnelStream discipline — so the admission/eviction SEQUENCE is
    * deterministic too, not just the final set. */
  case class TopKAdmit(event_type: String, event_id: Long, value: Double,
      evicted_id: Option[Long])

  def topKPerKeyStream(spark: SparkSession, events: DataFrame, k: Int)
      : DataFrame = {
    import spark.implicits._
    def beats(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    events.select(col("event_type"), col("ts"), col("event_id"),
        col("value"))
      .as[(String, java.sql.Timestamp, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[List[(Double, Long)], TopKAdmit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[List[(Double, Long)]]) =>
          val sorted = rows.toSeq.sortBy(e =>
            (e._2.getTime, e._2.getNanos, e._3))
          var cur = state.getOption.getOrElse(Nil)
          val out = scala.collection.mutable.ArrayBuffer.empty[TopKAdmit]
          sorted.foreach { e =>
            val cand = (e._4, e._3)
            if (cur.size < k) {
              cur = (cand :: cur).sortWith(beats)
              out += TopKAdmit(key, e._3, e._4, None)
            } else if (beats(cand, cur.last)) {
              val worst = cur.last
              cur = (cand :: cur.init).sortWith(beats)
              out += TopKAdmit(key, e._3, e._4, Some(worst._2))
            }
          }
          state.update(cur)
          out.iterator
      }.toDF()
  }

  /** ST3 — stateful job queue on a stream of job events (id, status,
    * scheduled_for): keeps one state row per job id, applying the
    * pending→completed/failed/expired transition rules; emits the current
    * status on every update. Event-time timeout expires pending jobs
    * 45 minutes past schedule (ST4). */
  case class JobEvent(id: String, status: String,
      scheduled_for: java.sql.Timestamp, event_ts: java.sql.Timestamp)
  case class JobStatus(id: String, status: String,
      scheduled_for: java.sql.Timestamp)

  def jobStateMachine(spark: SparkSession, jobEvents: DataFrame): DataFrame = {
    import spark.implicits._
    jobEvents.select(col("id"), col("status"), col("scheduled_for"),
      col("event_ts"))
      .withWatermark("event_ts", "10 minutes")
      .as[JobEvent]
      .groupByKey(_.id)
      .flatMapGroupsWithState[JobStatus, JobStatus](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (id, rows, state: GroupState[JobStatus]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            // pending past its grace window → expired
            val cur = state.get
            val expired = cur.copy(status = "expired")
            state.update(expired)
            Iterator.single(expired)
          } else {
            // full-microsecond order (getNanos) + status as the final
            // deterministic tie-break for same-instant transitions
            val sorted = rows.toSeq.sortBy(ev =>
              (ev.event_ts.getTime, ev.event_ts.getNanos, ev.status))
            var cur = state.getOption
            val out = scala.collection.mutable.ArrayBuffer.empty[JobStatus]
            sorted.foreach { ev =>
              val terminal = cur.exists(c => c.status != "pending")
              if (!terminal) { // terminal states never transition back
                cur = Some(JobStatus(ev.id, ev.status, ev.scheduled_for))
                out += cur.get
              }
            }
            cur.foreach { c =>
              state.update(c)
              if (c.status == "pending")
                state.setTimeoutTimestamp(
                  c.scheduled_for.getTime + 45 * 60 * 1000L)
            }
            out.iterator
          }
      }.toDF()
  }

  /** File-based events stream: watches a DIRECTORY of event parquet files
    * (the streaming file source requires a directory; each new file is a
    * micro-batch — exactly how a collection pipeline lands batches).
    *
    * Same footer-probed unit handling as [[Tables.load]]: a one-off batch
    * footer read decides whether `ts` is TIMESTAMP(MICROS) (direct read) or
    * TIMESTAMP(NANOS) (INT64 under nanosAsLong → explicit ÷1000). An empty
    * dir at stream start defaults to micros — the generator's current unit. */
  def eventsFileStream(spark: SparkSession, eventsDir: String): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val tsIsRawNanos =
      try spark.read.parquet(eventsDir).schema("ts").dataType == LongType
      catch { case _: org.apache.spark.sql.AnalysisException => false }
    if (tsIsRawNanos)
      spark.readStream
        .schema(Tables.eventsRawSchema)
        .parquet(eventsDir)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else
      spark.readStream
        .schema(Tables.eventsSchema)
        .parquet(eventsDir)
  }
}
