package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is declared once as a
  * [[graft.queries.Q]] (Spark implementation + DuckDB oracle together, so
  * the two maps can never drift) and assembled here.
  */
object SparkEntry {

  private def allQ: Seq[Q] =
    Relational.all ++ Relational2.all ++ Relational3.all ++ Relational4.all ++
      Relational5.all ++ Relational6.all ++
      Pipeline.all ++ Pipeline2.all ++ Pipeline3.all ++ Pipeline4.all ++
      Pipeline5.all ++ Pipeline6.all ++ Pipeline7.all ++ Pipeline8.all ++
      Pipeline9.all ++ Pipeline10.all ++ Pipeline11.all ++ Pipeline12.all ++
      Pipeline13.all ++ Pipeline14.all ++ Pipeline15.all ++
      Pipeline16.all ++ Pipeline17.all ++
      StreamingQ.all ++ MultimodalQ.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q05_local_supplier_volume")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQ.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allQ.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
