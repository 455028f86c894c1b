package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level n-gram generation metrics (extension surface, BASELINE.json
  * north star: the eval loop of a training-data pipeline — alongside the
  * retrieval metrics in [[Similarity]] this covers the text-generation
  * side).
  *
  * [[selfBleuComponents]] is the Self-BLEU diversity measure (Zhu et al.
  * 2018, Texygen): BLEU of each document against its peers — HIGH self-BLEU
  * means the corpus (or a generator's samples) repeats itself. The peer set
  * here is the next document of the same group (deterministic, O(1) refs
  * per doc — the all-peers variant is quadratic and adds nothing at corpus
  * scale), and the score is reported as exact integer modified-precision
  * components (clipped n-gram matches / candidate n-grams) with one final
  * divide per order — no geometric mean, no transcendental brevity penalty,
  * so the number is reproducible bit-for-bit in any engine.
  *
  * Scale shape: pairing is one `lead` window partitioned by the group key
  * (a keyed shuffle, no global sort); n-gram clipping is explode →
  * (doc, gram)-keyed counts → keyed join — map-side combinable partials,
  * never O(doc²).
  */
object Eval {

  /** Word n-grams as an array column, duplicates KEPT (clipped precision
    * needs multiplicities — [[Dedup.shingles]] is the distinct variant).
    */
  private def grams(textToks: Column, n: Int): Column = {
    val idx = when(size(textToks) >= n, sequence(lit(0), size(textToks) - n))
      .otherwise(lit(Array.empty[Int]))
    transform(idx, i => array_join(slice(textToks, i + 1, lit(n)), " "))
  }

  /** Per-group Self-BLEU components for n-gram orders 1..maxN: each doc is
    * the candidate, the next doc of the same group (by id) the reference.
    * Output one row per group: `p{n}_num` (clipped matches), `p{n}_den`
    * (candidate n-grams), `p{n}` (one divide, 6 dp) for each order, plus
    * `n_pairs`.
    */
  def selfBleuComponents(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, maxN: Int = 2): DataFrame = {
    require(maxN >= 1, "maxN must be >= 1")
    val toks = filter(split(Dedup.normalize(col(textCol)), " "), t => length(t) > 0)
    val base = df.select(col(groupCol).as("grp"), col(idCol).as("_id"), toks.as("_toks"))
    val w = Window.partitionBy("grp").orderBy("_id")
    val paired = base
      .withColumn("_rtoks", lead(col("_toks"), 1).over(w))
      .where(col("_rtoks").isNotNull)
    val pairs = paired.groupBy("grp").agg(count(lit(1)).as("n_pairs"))
    val perN = (1 to maxN).map { n =>
      val cand = paired
        .select(col("grp"), col("_id"), explode(grams(col("_toks"), n)).as("_g"))
        .groupBy("grp", "_id", "_g").agg(count(lit(1)).as("_c"))
      val ref = paired
        .select(col("grp"), col("_id"), explode(grams(col("_rtoks"), n)).as("_g"))
        .groupBy("grp", "_id", "_g").agg(count(lit(1)).as("_r"))
      cand.join(ref, Seq("grp", "_id", "_g"), "left")
        .select(col("grp"),
          least(col("_c"), coalesce(col("_r"), lit(0L))).as("_clip"), col("_c"))
        .groupBy("grp")
        .agg(sum("_clip").as(s"p${n}_num"), sum("_c").as(s"p${n}_den"))
        .withColumn(s"p$n",
          round(col(s"p${n}_num") / col(s"p${n}_den"), 6))
    }
    perN.foldLeft(pairs)((acc, d) => acc.join(d, Seq("grp")))
  }
}
