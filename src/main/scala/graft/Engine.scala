package graft

import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}

import graft.ddl.GraftParser

/** Registers the engine's SQL surface on a SparkSession — the analog of
  * `SessionContext::new().with_function_factory(...)` in the reference
  * (wasmedge_factory/examples/wasaffi.rs:10). Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectParser((_, delegate) => new GraftParser(delegate))
    // batch-at-a-time UDF projection (udf.rs:82-115 granularity)
    e.injectPlannerStrategy(_ => graft.plans.BatchInvokeStrategy)
  }
}

/** Thin session facade — the engine's `SessionContext` analog. */
class Engine(val spark: SparkSession) {

  /** Full SQL surface, including the engine's `CREATE FUNCTION … LANGUAGE …
    * AS 'module!fn'` / `DROP FUNCTION` DDL (reference: examples/wasaffi.rs:25,27). */
  def sql(query: String): DataFrame = spark.sql(query)

  /** In-memory table registration — `ctx.register_batch` analog
    * (reference: examples/wasaffi.rs:16). */
  def registerTable(name: String, df: DataFrame): Unit =
    df.createOrReplaceTempView(name)
}

object Engine {
  /** Local-mode engine with the graft extensions installed, shuffle
    * partitions sized for local cores (not the 200 default). */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): Engine = {
    val spark = Env.tuned(SparkSession.builder())
      .master(s"local[$cores]")
      .appName("wasaffispark")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new Engine(spark)
  }
}
