package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Positional inverted-index construction and phrase retrieval — the
  * index-build side of lexical search (p69's BM25 scores bags of words;
  * this preserves token ORDER, the structure phrase and proximity
  * queries need).
  *
  * Scale shape: the postings table is the flat `(term, doc, pos)` form
  * a distributed index build actually writes (term-sorted parquet =
  * the posting lists); phrase search is ONE broadcast join of the
  * postings against the query terms (the term filter prunes in the
  * scan — non-query terms never leave it) plus ONE partial-agg keyed
  * by `(phrase, doc, start)`. Never a self-join of postings against
  * postings: a k-term phrase is assembled by counting, per candidate
  * start offset, how many of its k terms landed at their expected
  * position — the classic "position − offset" trick that turns phrase
  * assembly into a group-by.
  */
object IndexOps {

  /** Flat positional postings `(id, pos, term)`, `pos` 0-based — one
    * row per token occurrence. This IS the positional index in its
    * storage form; sorting/bucketing by `term` at write time makes the
    * parquet row groups the posting lists.
    */
  def positionalPostings(docs: DataFrame, id: String,
                         tokens: org.apache.spark.sql.Column): DataFrame =
    docs.select(col(id), posexplode(tokens).as(Seq("pos", "term")))

  /** All (possibly overlapping) occurrences of `phrases` in the
    * postings: one row per `(phrase, id, start)` where every token of
    * the phrase matches at its offset from `start`. Query terms are a
    * broadcast table generated from the phrase list; an occurrence
    * exists iff the number of matched offsets at a start equals the
    * phrase length (offsets are distinct per phrase by construction,
    * so `count(*)` is that number).
    */
  def phraseOccurrences(postings: DataFrame, id: String,
                        phrases: Seq[String]): DataFrame = {
    val spark = postings.sparkSession
    import spark.implicits._
    val qdf = phrases.flatMap { p =>
      p.split(" ").toSeq.zipWithIndex.map { case (t, o) => (p, t, o) }
    }.toDF("phrase", "term", "off")
    val plen = phrases.map(p => (p, p.split(" ").length.toLong))
      .toDF("phrase", "plen")
    postings.join(broadcast(qdf), "term")
      .select(col("phrase"), col(id), (col("pos") - col("off")).as("start"))
      .where(col("start") >= 0)
      .groupBy(col("phrase"), col(id), col("start"))
      .agg(count(lit(1)).as("nhit"))
      .join(broadcast(plen), "phrase")
      .where(col("nhit") === col("plen"))
      .select(col("phrase"), col(id), col("start").cast("long").as("start"))
  }
}
