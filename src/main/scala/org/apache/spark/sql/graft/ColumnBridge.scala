package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ⇄ Expression conversion
  * (`org.apache.spark.sql.classic.ExpressionUtils`) for kernels whose
  * construction cannot go through the SQL function registry — the ANN
  * quantizer expressions carry a trained model as a `Broadcast` handle,
  * which a `Seq[Expression] => Expression` builder cannot supply (the
  * registry path would force the model into plan literals, O(model)
  * plan text — exactly what the broadcast design avoids).
  *
  * Living in a subpackage of `org.apache.spark.sql` grants access to the
  * `private[sql]` members; the same shim technique every major Spark
  * extension library uses (Delta Lake's `org.apache.spark.sql.delta`,
  * Sedona, Iceberg's runtime). Spark-version-sensitive by nature: this
  * file is the single place to touch if `ExpressionUtils` moves again
  * (it is `org.apache.spark.sql.classic` as of Spark 4.x).
  */
object ColumnBridge {
  /** Wrap a catalyst Expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a Column to its catalyst Expression. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
