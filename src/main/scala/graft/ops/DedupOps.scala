package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed
  * around a shuffle plan that survives 100 TB:
  *
  *  - exact dedup: one hash-shuffle on a 128-bit content hash; no
  *    row-to-row comparison ever happens.
  *  - n-gram Jaccard: inverted-index self-join on shingles (shuffle by
  *    shingle), never an all-pairs cross join. Frequency-capped shingles
  *    (stopword shingles shared by >maxDf docs are dropped) bound the
  *    worst-case join fan-out — the classic skew guard.
  *  - MinHash + LSH: fixed-size signatures (k salted portable hashes),
  *    banded; candidate pairs come from a shuffle on (band, bandHash)
  *    so cost is O(candidates), not O(n²).
  *  - SimHash: 16-bit signature; pairs found by the pigeonhole block
  *    join (hamming ≤ 3 ⇒ at least one of four 4-bit quarters equal),
  *    again a key-shuffle, not a cross join.
  *
  * Everything is pure Column expressions over the portable md5-derived
  * hash ([[Portable.h60]]), so every stage is whole-stage-codegen'd and
  * the results are engine-reproducible (DuckDB oracle in
  * `graft.queries.Pipeline`).
  */
object DedupOps {

  /** Exact-duplicate groups: one row per distinct normalized content,
    * with the survivor id (min), copy count, and the hash key.
    */
  def exactGroups(docs: DataFrame, id: String, text: String): DataFrame =
    docs
      .select(col(id), TextOps.contentHash(col(text)).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(min(col(id)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** doc → exploded distinct 3-gram shingles (the inverted-index rows). */
  private def distinctShingles(docs: DataFrame, id: String, text: String): DataFrame =
    docs
      .select(col(id).as("did"), explode(TextOps.shingles(col(text), 3)).as("s"))
      .distinct()

  /** Document pairs by exact n-gram Jaccard similarity, via inverted-
    * index join. `maxDf` drops shingles occurring in more than that many
    * docs (frequency cap = skew guard); `minJaccard` filters the output.
    */
  def jaccardPairs(docs: DataFrame, id: String, text: String,
                   minJaccard: Double, maxDf: Int = 1000): DataFrame = {
    val ds = distinctShingles(docs, id, text)
    val sizes = ds.groupBy(col("did")).agg(count(lit(1)).as("nsh"))
    val capped = ds
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("s"))))
      .filter(col("df") <= maxDf)
      .drop("df")
    val inter = capped.as("x")
      .join(capped.as("y"), col("x.s") === col("y.s") && col("x.did") < col("y.did"))
      .groupBy(col("x.did").as("a"), col("y.did").as("b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("did", "a").withColumnRenamed("nsh", "na"), "a")
      .join(sizes.withColumnRenamed("did", "b").withColumnRenamed("nsh", "nb"), "b")
      .withColumn("jac", col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")))
      .filter(col("jac") >= minJaccard)
      .select(col("a"), col("b"), col("inter"), col("jac"))
  }

  /** MinHash signature: k salted portable hashes, each the min over the
    * doc's distinct 3-gram shingles. Columns m0..m{k-1}; docs with no
    * shingles get nulls (callers drop or keep them deliberately).
    */
  def minhashSignatures(docs: DataFrame, id: String, text: String, k: Int): DataFrame = {
    val ds = distinctShingles(docs, id, text)
    val aggs = (0 until k).map(j => min(Portable.h60s(j, col("s"))).as(s"m$j"))
    ds.groupBy(col("did").as(id)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH band table from a signature frame: one row per (doc, band)
    * with the band hash = md5 of the band's signature slice.
    */
  def lshBands(sig: DataFrame, id: String, k: Int, rowsPerBand: Int): DataFrame = {
    require(k % rowsPerBand == 0, "k must be divisible by rowsPerBand")
    val bands = (0 until k / rowsPerBand).map { b =>
      val cols = (0 until rowsPerBand).map(r => col(s"m${b * rowsPerBand + r}"))
      sig.select(col(id).as("did"), lit(b).as("band"),
        md5(concat_ws("|", cols.map(_.cast("string")): _*)).as("bh"))
    }
    bands.reduce(_ unionAll _)
  }

  /** LSH candidate pairs: docs sharing ≥1 band, with the number of
    * agreeing bands and the signature-estimated Jaccard (fraction of
    * equal minhash components).
    */
  def lshCandidates(docs: DataFrame, id: String, text: String,
                    k: Int = 12, rowsPerBand: Int = 3): DataFrame = {
    val sig = minhashSignatures(docs, id, text, k)
    val bands = lshBands(sig, id, k, rowsPerBand)
    val pairs = bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.did") < col("y.did"))
      .groupBy(col("x.did").as("a"), col("y.did").as("b"))
      .agg(count(lit(1)).as("n_bands"))
    val eq = (0 until k).map(j =>
      when(col(s"sa.m$j") === col(s"sb.m$j"), 1).otherwise(0))
      .reduce(_ + _)
    pairs
      .join(sig.as("sa"), col("a") === col(s"sa.$id"))
      .join(sig.as("sb"), col("b") === col(s"sb.$id"))
      .select(col("a"), col("b"), col("n_bands"),
        (eq.cast("double") / k).as("est_jaccard"))
  }

  /** 16-bit SimHash over distinct tokens: bit i is set when the count
    * of token-hashes with bit i set exceeds those without.
    */
  def simhash16(docs: DataFrame, id: String, text: String): DataFrame =
    docs
      .select(col(id).as("did"),
        explode(array_distinct(TextOps.tokens(col(text)))).as("w"))
      .select(col("did"), Portable.h60(col("w")).as("h"),
        explode(sequence(lit(0), lit(15))).as("bit"))
      .groupBy(col("did"), col("bit"))
      .agg(sum(when(expr("shiftright(h, bit) & 1") === 1, 1).otherwise(-1)).as("s"))
      .groupBy(col("did").as(id))
      .agg(sum(when(col("s") > 0,
        expr("shiftleft(CAST(1 AS BIGINT), bit)")).otherwise(0L)).as("simhash"))

  /** SimHash near-dup pairs with hamming distance ≤ maxHamming (≤ 3),
    * found scalably: hamming ≤ 3 over 16 bits ⇒ at least one 4-bit
    * quarter is identical (pigeonhole), so candidates come from four
    * key-joins on the quarters, then the exact hamming filter.
    */
  def simhashPairs(docs: DataFrame, id: String, text: String,
                   maxHamming: Int = 3): DataFrame = {
    val sh = simhash16(docs, id, text)
    val blocks = (0 until 4).map { q =>
      sh.select(col(id).as("did"), col("simhash"),
        lit(q).as("q"), expr(s"shiftright(simhash, ${4 * q}) & 15").as("qk"))
    }.reduce(_ unionAll _)
    blocks.as("x")
      .join(blocks.as("y"),
        col("x.q") === col("y.q") && col("x.qk") === col("y.qk") &&
          col("x.did") < col("y.did"))
      .select(col("x.did").as("a"), col("y.did").as("b"),
        expr("bit_count(x.simhash ^ y.simhash)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
