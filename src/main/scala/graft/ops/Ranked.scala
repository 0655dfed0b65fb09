package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.row_number

/** The ranked-top-K idiom, single-sourced: `orderBy(order).limit(k)`
  * plans as TakeOrderedAndProject (distributed partial top-K, never a
  * full sort), and the rank column comes from a row_number window over
  * the SAME order on the ≤ k survivors. The order is stated ONCE per
  * call site — the selection order and the rank order cannot drift
  * apart (they are the same Column objects), which is the invariant
  * four ops ([[TopK]], [[SkewJoin.diagnose]],
  * [[SkewJoin.joinSizeForecast]], [[Paths]]) each used to restate
  * twice. `order` must be total (include a unique tie-break) for the
  * selected SET to be deterministic — the same contract every caller
  * already pins.
  */
object Ranked {

  def rankedTopK(df: DataFrame, order: Seq[Column], k: Int,
      rankCol: String): DataFrame = {
    require(order.nonEmpty, "at least one order column")
    require(k >= 1, "k must be >= 1")
    df.orderBy(order: _*).limit(k)
      .withColumn(rankCol, row_number().over(Window.orderBy(order: _*)))
  }
}
