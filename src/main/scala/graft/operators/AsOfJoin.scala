package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal point) join: for every left row, the latest right row
  * with the same key and `rightTs ≤ leftTs`.
  *
  * Not a reference operator (SURVEY.md §2.3 notes its absence) but a core
  * temporal-warehouse primitive the SCD-2 layer implies, and a standard
  * "operator Spark lacks" showcase. Formulated the scalable way: ONE
  * shuffle — union both sides, sort within key partitions by
  * (ts, side), and carry the last-seen right payload forward with
  * `last(..., ignoreNulls)` — instead of the naive inequality join whose
  * intermediate is |left| × |matching right| (quadratic in hot keys).
  * Right rows sort before left rows on timestamp ties, giving inclusive
  * (≤) semantics.
  */
object AsOfJoin {

  /** @param left       left relation
    * @param right      right relation (must share no column names with left
    *                   except `keyCol`)
    * @param keyCol     equality key present on both sides
    * @param leftTs     event-time column name on the left
    * @param rightTs    event-time column name on the right
    * @param payload    right columns to carry (as-of values; nullable when
    *                   no right row precedes the left row)
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // the payload travels as ONE struct column: `last(ignoreNulls)` then
    // carries the whole latest right ROW atomically — carrying each column
    // independently would resurrect older rows' values wherever the latest
    // right row holds a NULL (and could tear different columns across
    // different right rows), diverging from as-of semantics
    val payType = org.apache.spark.sql.types.StructType(
      payload.map(c => right.schema(c)))
    val unioned = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select((Seq(col(keyCol), col("__ts"), col("__side")) ++
        leftCols.filterNot(_ == keyCol).map(col) :+
        lit(null).cast(payType).as("__pay")): _*)
      .unionByName(right
        .withColumn("__ts", col(rightTs))
        .withColumn("__side", lit(0))
        .select((Seq(col(keyCol), col("__ts"), col("__side")) ++
          leftCols.filterNot(_ == keyCol)
            .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
          struct(payload.map(col): _*).as("__pay")): _*))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__pay", last(col("__pay"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select((Seq(col(keyCol)) ++ leftCols.filterNot(_ == keyCol).map(col) ++
        payload.map(c => col(s"__pay.$c").as(c))): _*)
  }

  /** Same semantics through the custom physical operator
    * ([[graft.plans.AsOfJoinExec]]): registers the planner strategy on the
    * live session (also injectable via GraftExtensions) and plans the
    * logical [[graft.plans.AsOfJoinPlan]] node directly — one co-partitioned
    * sorted-merge pass, no window state. */
  def asOfPlanned(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    }
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found in ${p.output.map(_.name)}"))
    ColumnBridge.ofRows(spark, graft.plans.AsOfJoinPlan(
      lPlan, rPlan,
      attr(lPlan, keyCol), attr(rPlan, keyCol),
      attr(lPlan, leftTs), attr(rPlan, rightTs),
      payload.map(attr(rPlan, _))))
  }
}
