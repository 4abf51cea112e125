package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, ExpressionUtils, SparkSession => ClassicSparkSession}

/** The one sanctioned crossing into Spark's `private[sql]` plan
  * constructor: wrapping a custom resolved [[LogicalPlan]] (e.g.
  * [[graft.plans.AsofJoinPlan]]) back into a public [[DataFrame]].
  * Lives under `org.apache.spark.sql` for access, contains no logic.
  * Pattern used by every plan-extending Spark library (Delta, Qbeast,
  * spark-cassandra, …) since `Dataset.ofRows` has no public twin.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  /** The (unresolved) expression tree behind a fluent-API [[Column]] —
    * what `col.expr` was before the Connect split made Column wrap a
    * ColumnNode. Used for driver-side predicate ANALYSIS only (file
    * stats pruning), never to build plans. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The inverse: wrap an (unresolved) expression tree as a fluent
    * [[Column]] — what `new Column(expr)` was before the Connect
    * split. Lets the SQL-DML lowering hand the engine a condition
    * WITHOUT an `Expression.sql` text round-trip (a folded
    * `IN (<subquery>)` literal list would render to megabytes of SQL
    * only to be re-parsed). */
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
