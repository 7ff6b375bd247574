package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-family operators (SURVEY.md §2.3) with 100 TB-safe plan shapes. */
object Joins {

  /** J4 — OR-disjunct equi-join (`t.id = f.home_id OR t.id = f.away_id`,
    * streamlit_dashboard.py:61): Catalyst plans a raw OR condition as a
    * broadcast-nested-loop join — quadratic at scale. Rewrite as the union of
    * two hash equi-joins, deduped on the left's row identity. Rows matching
    * both sides appear once (matching SQL OR-join semantics).
    *
    * @param leftId column(s) uniquely identifying a `left` row
    */
  def disjunctJoin(left: DataFrame, right: DataFrame,
      cond1: (DataFrame, DataFrame) => Column,
      cond2: (DataFrame, DataFrame) => Column,
      leftId: Seq[String], rightId: Seq[String]): DataFrame = {
    val j1 = left.join(right, cond1(left, right))
    val j2 = left.join(right, cond2(left, right))
    j1.unionByName(j2).dropDuplicates(leftId ++ rightId)
  }

  /** J5 — range/interval join: `probe.ts BETWEEN anchor.start AND anchor.end`
    * plus an equi-key. The equi-key keeps this a hash join with the range as
    * a post-join filter — never a BNLJ. For pure range joins (no equi key)
    * use [[bucketedRangeJoin]]. */
  def rangeJoin(probe: DataFrame, anchor: DataFrame, equiKey: Column,
      ts: Column, start: Column, end: Column): DataFrame =
    probe.join(anchor, equiKey && ts.between(start, end))

  /** Skew-safe equi-join by salting: the build side is replicated
    * `saltFactor` times (one copy per salt value), the probe side picks a
    * deterministic pseudo-random salt per row (hash of its columns — no
    * Math.random, so retried tasks stay consistent), and the join key
    * becomes (key, salt). A hot key's rows spread over `saltFactor`
    * partitions instead of one straggler. Complements AQE skew splitting:
    * AQE fixes skewed PARTITIONS after the fact; salting fixes a single
    * skewed KEY that no partition split can help.
    *
    * @param probe    large, possibly skewed side
    * @param build    smaller side (replicated ×saltFactor)
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    val saltedProbe = probe.withColumn("__salt",
      pmod(hash(probe.columns.toIndexedSeq.map(col): _*), lit(saltFactor)))
    val saltedBuild = build.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    saltedProbe.join(saltedBuild, Seq(key, "__salt")).drop("__salt")
  }

  /** Pure range join via date bucketing: expand each anchor interval to the
    * date buckets it covers (`sequence` + `explode`), then hash-join on the
    * bucket and post-filter the exact range. Shuffle is proportional to
    * interval-days × anchors, not |probe| × |anchor|. */
  def bucketedRangeJoin(probe: DataFrame, anchor: DataFrame,
      probeTs: String, startCol: String, endCol: String): DataFrame = {
    val buckets = anchor.withColumn("__bucket",
      explode(sequence(to_date(col(startCol)), to_date(col(endCol)))))
    probe.withColumn("__bucket", to_date(col(probeTs)))
      .join(buckets, Seq("__bucket"))
      .filter(col(probeTs).between(col(startCol), col(endCol)))
      .drop("__bucket")
  }

  /** CDC MERGE (the warehouse upsert step — MERGE INTO semantics as one
    * plan): apply a change set to a base table. A change row with the base's
    * key REPLACES the base row; a change row with a new key INSERTS; a
    * change row with `deleteCol` = true DELETES; base rows without a change
    * pass through. `changes` must carry the base's schema plus the delete
    * flag, with at most one change row per key (last-write-wins compaction
    * of the change stream happens upstream — latestPerGroup is that
    * operator).
    *
    * Scale shape: ONE full-outer hash join on the key — the standard CDC
    * compaction; at scale both sides co-partition on the key (bucketed
    * base tables make this shuffle-free on the base side), and the output
    * is the rewritten partition set. */
  /** SCD-type-2 history builder: collapse an event stream into validity
    * intervals per key — one row per VALUE CHANGE, carrying
    * [valid_from, valid_to) and an is_current flag (open intervals get
    * the 9999-12-31 high date, the standard SCD2 sentinel — and a
    * deterministic, hashable value where a NULL's cross-engine handling
    * is not). [[applyChanges]] is the SCD1 companion (latest-wins merge);
    * this keeps the full history a training-data audit or time-travel
    * join needs.
    *
    * Scale shape: ONE shuffle on the key columns — the change-detection
    * lag and the interval-closing lead are windows over the SAME
    * (partitionBy keys, orderBy ts, id) spec, and the lead runs on the
    * change-filtered subset, which preserves the key partitioning (the
    * second Window reuses the exchange; only the sort re-runs on the
    * smaller filtered set). No joins, no self-union. */
  def scd2History(df: DataFrame, keyCols: Seq[String], tsCol: String,
      idCol: String, valueCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys: _*).orderBy(col(tsCol), col(idCol))
    val highDate = "9999-12-31 00:00:00.000000"
    // change detection must be NULL-safe: `=!=` is NULL when either side
    // is NULL, which would silently drop a change to/from NULL. <=> is
    // the null-safe equality; the first row per key is identified by
    // row_number (lag(value) IS NULL cannot distinguish "no previous
    // row" from "previous value was NULL").
    df.withColumn("__pv", lag(col(valueCol), 1).over(w))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 || !(col(valueCol) <=> col("__pv")))
      .drop("__rn")
      .withColumn("__vt", lead(col(tsCol), 1).over(w))
      .select(keys ++ Seq(
        col(valueCol),
        graft.Det.fmtTs(col(tsCol)).as("valid_from"),
        coalesce(graft.Det.fmtTs(col("__vt")), lit(highDate))
          .as("valid_to"),
        col("__vt").isNull.cast("boolean").as("is_current")): _*)
  }

  /** INTERVAL OVERLAP JOIN (keyed): pairs of rows whose half-open
    * intervals [start, end) intersect, within an equi-key — the
    * bitemporal primitive behind "which versions were valid at the same
    * time", concurrent-session analysis, and validity-interval
    * reconciliation. Overlap is `lStart < rEnd AND rStart < lEnd`; the
    * intersection itself is `[greatest(starts), least(ends))`.
    *
    * Scale shape: ONE shuffle on the equi-keys — Catalyst plans the
    * range pair as a post-join filter on a hash/sort-merge join, which
    * is the right cost while per-key interval counts are bounded (the
    * normal case: intervals per entity, not per corpus). A key-free or
    * hot-key overlap join instead buckets TIME — explode both sides to
    * coarse time buckets, equi-join on the bucket, and keep a pair only
    * in the bucket of `greatest(starts)` so it is emitted exactly once
    * ([[rangeJoin]]'s discipline, extended to interval×interval). That
    * variant costs shuffle ∝ interval-days; this keyed form costs
    * shuffle ∝ rows. */
  def overlapJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      lStart: String, lEnd: String, rStart: String,
      rEnd: String): DataFrame = {
    val cond = keyCols.map(k => left(k) === right(k))
      .reduce(_ && _) &&
      left(lStart) < right(rEnd) && right(rStart) < left(lEnd)
    left.join(right, cond)
  }

  /** BLOOM-PRUNED SEMI-JOIN: filter the big probe side through a
    * Bloom filter built from the small side's keys BEFORE the exact
    * semi-join pays its shuffle — the runtime-filter pattern
    * (DPP / Spark's runtime bloom-filter join) as an explicit operator.
    *
    * Build: each build key sets `numHashes` bits of an `numBits`-wide
    * bitmap (positions from seeded xxhash64). The bitmap is kept SPARSE —
    * a word→bits map with at most min(numBits/64, numHashes·|build|)
    * entries aggregated by map-side-combined bit_or — and crossed onto
    * the probe as a 1-row broadcast. Probe rows whose bits are not all
    * set are dropped before the semi-join shuffle; the exact left-semi
    * join then removes Bloom false positives, so the RESULT is
    * bit-identical to the plain semi-join (false negatives are
    * impossible). The oracle for the registered query is therefore the
    * PLAIN semi-join — the equivalence IS the contract, like saltedJoin.
    *
    * 100 TB shape: the broadcast is bounded by numBits/8 bytes
    * regardless of build-side cardinality; the probe-side scan+filter is
    * map-side (no shuffle added), and every pruned row is shuffle volume
    * the semi-join no longer pays. With the default 2^20 bits and k=3
    * the filter stays useful to ~10^5 build keys (~1% fpp). */
  def bloomSemiJoin(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, numBits: Int = 1 << 20,
      numHashes: Int = 3): DataFrame =
    bloomPrefilter(probe, build, probeKey, buildKey, numBits, numHashes)
      .join(build.select(col(buildKey).as(probeKey)), Seq(probeKey),
        "left_semi")

  /** The Bloom stage of [[bloomSemiJoin]] alone: `probe` rows whose key
    * bits are all set in the build-side bitmap (superset of the true
    * matches — false positives possible, false negatives not). Exposed
    * so the pruning behavior is testable and so callers can hang a
    * DIFFERENT exact join (inner, as-of) behind the same prefilter.
    *
    * The bitmap lives as a (word → 64-bit block) TABLE of ≤ numBits/64
    * rows and each of the k probes is a BROADCAST HASH JOIN on the word
    * index — O(1) codegen'd lookups. (A first cut carried the bitmap as
    * a 1-row map column; Spark's ArrayBasedMapData `element_at` is a
    * LINEAR scan, so every probe row paid O(#set-words) — measured 8×
    * slower at sf0.1. Hash joins are the map lookup Spark actually
    * optimizes.) An inner join drops probe rows whose word has no set
    * bits at all — absent word = definite non-member, same semantics. */
  def bloomPrefilter(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, numBits: Int = 1 << 20,
      numHashes: Int = 3): DataFrame = {
    require(numBits % 64 == 0, "numBits must be a multiple of 64")
    def positions(key: Column): Seq[Column] =
      (1 to numHashes).map(i =>
        pmod(xxhash64(lit(i), key), lit(numBits.toLong)))
    def maskOf(pos: Column): Column =
      call_function("shiftleft", lit(1L), (pos % 64).cast("int"))
    val words = build
      .select(explode(array(positions(col(buildKey)): _*)).as("__pos"))
      .select((col("__pos") / 64).cast("int").as("__word"),
        maskOf(col("__pos")).as("__mask"))
      .groupBy(col("__word")).agg(expr("bit_or(__mask)").as("__bits"))
    positions(col(probeKey)).zipWithIndex.foldLeft(probe) {
      case (df, (pos, i)) =>
        df.withColumn(s"__w$i", (pos / 64).cast("int"))
          .withColumn(s"__m$i", maskOf(pos))
          .join(broadcast(words.select(col("__word").as(s"__w$i"),
            col("__bits").as(s"__b$i"))), Seq(s"__w$i"))
          .filter((col(s"__b$i").bitwiseAND(col(s"__m$i"))) =!= 0L)
          .drop(s"__w$i", s"__m$i", s"__b$i")
    }
  }

  def applyChanges(base: DataFrame, changes: DataFrame, key: String,
      deleteCol: String): DataFrame = {
    val dataCols = base.columns.filter(_ != key).toSeq
    val b = base.select(col(key) +: dataCols.map(n => col(n).as(s"__b_$n")): _*)
    val c = changes.select(col(key) +:
      (dataCols.map(n => col(n).as(s"__c_$n")) :+
        col(deleteCol).as("__del")): _*)
    b.join(c, Seq(key), "full_outer")
      // __del is non-null exactly when a change row exists for the key
      .filter(col("__del").isNull || !col("__del"))
      .select(col(key) +: dataCols.map(n =>
        when(col("__del").isNotNull, col(s"__c_$n"))
          .otherwise(col(s"__b_$n")).as(n)): _*)
  }

  /** SNAPSHOT DIFF — the dataset-versioning audit between two keyed
    * snapshots (yesterday's export vs today's): per key, classify
    * added / removed / changed / unchanged and report counts with key
    * bounds per class. Change detection is a null-safe column compare
    * (`IS DISTINCT FROM` — the [[scd2History]] discipline), never a
    * stringified row hash, so no cross-engine number-formatting
    * caveats exist and the compare stays codegen'd on native types.
    *
    * Plan: ONE full-outer join on the key (both sides shuffle once —
    * the floor for an exact diff; at 100 TB both snapshots are
    * typically bucketed on the key, making this the zero-exchange
    * co-located pattern pinned in BucketedTableSpec), then a 4-row
    * status agg with map-side combine. Output:
    * (status, n, min_key, max_key), status-ascending. */
  def snapshotDiff(a: DataFrame, b: DataFrame, key: String,
      compareCols: Seq[String]): DataFrame = {
    val la = a.select(col(key).as("key") +:
      compareCols.map(n => col(n).as(s"__a_$n")) :+ lit(1).as("__ina"): _*)
    val lb = b.select(col(key).as("key") +:
      compareCols.map(n => col(n).as(s"__b_$n")) :+ lit(1).as("__inb"): _*)
    val changed = compareCols
      .map(n => !(col(s"__a_$n") <=> col(s"__b_$n")))
      .reduce(_ || _)
    la.join(lb, Seq("key"), "full_outer")
      .withColumn("status",
        when(col("__inb").isNull, lit("removed"))
          .when(col("__ina").isNull, lit("added"))
          .when(changed, lit("changed"))
          .otherwise(lit("unchanged")))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n"), min(col("key")).as("min_key"),
        max(col("key")).as("max_key"))
      .orderBy(col("status"))
  }
}
