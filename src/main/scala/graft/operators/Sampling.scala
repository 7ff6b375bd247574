package graft.operators

import graft.functions.TextFeatures
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus sampling and batch-packing operators for training-data pipelines:
  * the steps between curation and the trainer — draw a reproducible sample,
  * mix sources at chosen rates, pack documents into token-budget chunks.
  */
object Sampling {

  /** Deterministic keep-decision for ~`permille`/1000 of rows, stable across
    * engines, runs, partitionings, and cluster sizes: the decision is a pure
    * function of the row KEY (md5 hex prefix compared against a hex
    * threshold — lowercase-hex string comparison is identical in every
    * engine, so a DuckDB twin reproduces the exact sample). `salt` decorates
    * the key so independent samples of the same corpus don't correlate.
    *
    * This is what `RAND() < p` can never give a pipeline: re-runs select THE
    * SAME rows (resumable jobs, reproducible ablations), and adding
    * executors doesn't change the sample. 4 hex digits → rate granularity
    * 1/65536 ≈ 0.0015%%. */
  def keepHash(key: Column, permille: Int, salt: String): Column = {
    require(permille >= 0 && permille <= 1000, "permille in [0, 1000]")
    if (permille == 1000) lit(true) // 0x10000 overflows the 4-digit compare
    else {
      val threshold = (65536L * permille / 1000).toInt
      val hex = f"$threshold%04x"
      substring(md5(concat(lit(salt), lit(":"), key.cast("string"))), 1, 4) <
        lit(hex)
    }
  }

  /** Reproducible ~`permille`/1000 sample of `df` keyed on `idCol`. Pure
    * map-side filter — no shuffle, pushdown-compatible. */
  def deterministicSample(df: DataFrame, idCol: String, permille: Int,
      salt: String = "graft"): DataFrame =
    df.filter(keepHash(col(idCol), permille, salt))

  /** SOURCE MIXING: per-stratum deterministic sampling rates — the
    * "20% of web, 100% of books, 50% of code" recipe every LLM data mix
    * encodes. `rates` maps stratum value → permille; strata absent from the
    * map keep `defaultPermille`. Still a pure map-side filter: the rate
    * lookup folds into a CASE expression (no config join, no shuffle). */
  def mixSample(df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Int], defaultPermille: Int,
      salt: String = "graft"): DataFrame = {
    val rateCol = rates.foldLeft(lit(defaultPermille)) {
      case (acc, (stratum, permille)) =>
        when(col(stratumCol) === stratum, lit(permille)).otherwise(acc)
    }
    // threshold hex computed per-row from the rate CASE: 4-digit zero-padded
    // (floor-div via floor(): Spark's `/` is double division; these
    // magnitudes are exact in double). permille=1000 keeps ALL rows — its
    // 0x10000 threshold has 5 digits and would break the 4-char compare.
    val threshold =
      lower(lpad(hex(floor(rateCol.cast("long") * 65536L / 1000L)), 4, "0"))
    df.filter(rateCol >= 1000 ||
      substring(md5(concat(lit(salt), lit(":"), col(idCol).cast("string"))),
        1, 4) < threshold)
  }

  /** TOKEN-BUDGET PACKING: assign documents to training chunks of ~`budget`
    * tokens, packing in (partition, id) order — the sequence-packing step
    * that turns a curated corpus into trainer batches. A doc belongs to the
    * chunk where its token run ENDS (`(cumsum - 1) div budget`), so chunk
    * boundaries are deterministic and every chunk holds ≥1 doc even when a
    * single doc exceeds the budget.
    *
    * Scale shape: packing is PER `partCol` (language, source, shard key) —
    * the window sorts within each partition only, never globally; at 100 TB
    * the partition key IS the batch-assembly unit (monolingual/per-source
    * batches), so no single-partition global sort ever appears. Output: one
    * row per chunk with doc count and token total. */
  def packChunks(df: DataFrame, partCol: String, idCol: String,
      textCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(col(partCol))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(partCol), col(idCol),
        TextFeatures.tokenCount(col(textCol)).cast("long").as("__ntok"))
      .withColumn("__cum", sum(col("__ntok")).over(w))
      // greatest(cum,1): a leading zero-token doc must not open chunk -1;
      // after the guard the numerator is ≥ 0, so double-div + cast == floor
      .withColumn("chunk_id",
        ((greatest(col("__cum"), lit(1L)) - 1L) / budget).cast("long"))
      .groupBy(col(partCol), col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__ntok")).as("n_tokens"))
  }
}
