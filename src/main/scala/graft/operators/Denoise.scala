package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Denoising-objective example builders — the corpus→(input, target)
  * rewriters of LM pretraining. Both are deterministic by construction
  * (every decision is an md5 property of (doc, position) bytes, never
  * RNG state), so the billion-example corpus they emit is
  * bit-reproducible on any cluster layout or retry — the property that
  * makes a training run auditable. */
object Denoise {

  /** SPAN CORRUPTION (T5, Raffel et al. 2020): mask length-3 token
    * spans at md5-coin-selected stride-8 starts (~9% of tokens);
    * INPUT keeps unmasked tokens with one `<Xk>` sentinel per span,
    * TARGET lists each sentinel followed by its masked tokens. Stride
    * 8 > span 3 ⇒ spans never overlap, so masking is per-position
    * with no greedy scan; sentinel ordinals are a cumulative count of
    * starts (the only non-per-row step). The pair is lossless: input
    * ⨝ target reconstructs the document (spec-pinned). Output:
    * (doc_id, n_tokens, n_masked, n_spans, input, target). */
  def spanCorrupt(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = filter(split(trim(col(textCol)), "\\s+"),
      t => length(t) > 0)
    val base = df.select(col(idCol).as("doc_id"),
      posexplode(toks).as(Seq("i", "tok")))
    val st = col("i") - col("i") % 8
    val m = md5(concat(lit("span:"), col("doc_id").cast("string"),
      lit(":"), st.cast("string")))
    val c0 = ascii(substring(m, 1, 1))
    val coin = when(c0 >= 97, c0 - 87).otherwise(c0 - 48) < 4
    val flagged = base
      .withColumn("masked", coin && col("i") % 8 < 3)
      .withColumn("is_start", coin && col("i") % 8 === 0)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    val pieces = flagged
      .withColumn("span_idx",
        sum(when(col("is_start"), 1L).otherwise(0L)).over(w))
      .withColumn("sent",
        concat(lit("<X"), (col("span_idx") - 1).cast("string"), lit(">")))
      .withColumn("pin",
        when(col("is_start"), col("sent"))
          .when(col("masked"), lit(null))
          .otherwise(col("tok")))
      .withColumn("ptg",
        when(col("is_start"), concat(col("sent"), lit(" "), col("tok")))
          .when(col("masked"), col("tok"))
          .otherwise(lit(null)))
    def joined(c: String) = array_join(
      transform(
        array_sort(collect_list(struct(col("i"), col(c).as("p")))),
        x => x.getField("p")), " ")
    pieces.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("masked"), 1L).otherwise(0L)).as("n_masked"),
        sum(when(col("is_start"), 1L).otherwise(0L)).as("n_spans"),
        joined("pin").as("input"),
        joined("ptg").as("target"))
      .orderBy(col("doc_id"))
  }

  /** FILL-IN-THE-MIDDLE (Bavarian et al. 2022): reorder each document
    * as ⟨PRE⟩prefix⟨SUF⟩suffix⟨MID⟩middle with two md5-derived
    * character cut points (4-nibble fold mod len−1; p1=p2 degenerates
    * to an empty middle — still a valid example). Pure per-row
    * project, zero shuffles. Output: (doc_id, len, p1, p2, fim). */
  def fimTransform(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    def fold4(salt: String) = {
      val m = md5(concat(lit(salt), col("doc_id").cast("string")))
      (1 to 4).map { i =>
        val c = ascii(substring(m, i, 1))
        val v = when(c >= 97, c - 87).otherwise(c - 48)
        v.cast("long") * lit(math.pow(16, 4 - i).toLong)
      }.reduce(_ + _)
    }
    df.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .filter(length(col("text")) >= 8)
      .select(col("doc_id"), col("text"),
        length(col("text")).cast("long").as("len"),
        (fold4("fim1:") % (length(col("text")) - 1) + 1).as("a"),
        (fold4("fim2:") % (length(col("text")) - 1) + 1).as("b"))
      .select(col("doc_id"), col("len"),
        least(col("a"), col("b")).as("p1"),
        greatest(col("a"), col("b")).as("p2"), col("text"))
      .select(col("doc_id"), col("len"), col("p1"), col("p2"),
        concat(lit("<PRE>"),
          expr("substring(text, 1, cast(p1 as int))"),
          lit("<SUF>"), expr("substring(text, cast(p2 + 1 as int))"),
          lit("<MID>"),
          expr("substring(text, cast(p1 + 1 as int), cast(p2 - p1 as int))"))
          .as("fim"))
      .orderBy(col("doc_id"))
  }
}
