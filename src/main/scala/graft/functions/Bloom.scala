package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Bloom-filter semi-join reduction — the Column-API face of the same
  * Catalyst machinery Spark's own runtime row-level filtering
  * (`InjectRuntimeFilter`) uses internally but does not expose in SQL.
  *
  * The 100 TB pattern this enables: build a compact bloom over the
  * SMALL side of a join (one aggregate row, ~kBs–MBs), ship it to every
  * task as a scalar subquery, and pre-filter the LARGE side before the
  * exact shuffle join. No false negatives, so with the exact join kept
  * downstream the result is IDENTICAL to the unfiltered plan — the
  * bloom only shrinks the rows entering the shuffle.
  */
object Bloom {

  /** Aggregate a LONG key column (use `xxhash64(...)`) into one bloom
    * filter binary. `estItems`/`numBits` size the filter; both are
    * capped by Spark's runtime-filter confs.
    */
  def agg(item: Column, estItems: Long, numBits: Long): Column =
    GraftSql.column(new BloomFilterAggregate(GraftSql.expression(item),
      Literal(estItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe of `item` (a LONG key, same `xxhash64` as the
    * build side) against the one-row bloom aggregate `bloom`, attached
    * as a SCALAR SUBQUERY — the shape `BloomFilterMightContain` demands
    * (constant or subquery) and the one Spark's own runtime filtering
    * injects, so the filter evaluates task-side with no driver collect.
    */
  def mightContain(bloom: DataFrame, item: Column): Column =
    GraftSql.column(BloomFilterMightContain(
      ScalarSubquery(bloom.queryExecution.logical),
      GraftSql.expression(item)))
}
