package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the latest right row whose time
  * is ≤ the left row's time, per key — the standard point-in-time join
  * for event/state alignment.
  *
  * Implemented with the union + ordered-window technique rather than an
  * inequality join: both sides are tagged and unioned, sorted within
  * each key by (time, side), and the right-side payload is carried
  * forward with `last(..., ignoreNulls)` over an unbounded-preceding
  * window. One shuffle on the key, sort within partitions, no n×m
  * blow-up — this is the shape that survives 100 TB (an inequality
  * theta-join would either nested-loop or explode per key).
  */
object AsOfJoin {

  /** @param left      probe side (each row gets the as-of match)
    * @param right     build side (the state timeline)
    * @param keyCols   equi-key column names present on both sides
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @param payload   right-side columns to attach (null when no right
    *                  row precedes the left row)
    */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // Tag: right rows sort before left rows at equal timestamps so a
    // right row with time == left time IS visible (as-of ≤ semantics).
    val l = left.select(
      (keyCols.map(col) :+ col(leftTime).as("_t") :+ lit(1).as("_side")) ++
        leftCols.filterNot(keyCols.contains).map(c => col(c).as(s"_l_$c")) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(s"_r_$c")): _*)
    val r = right.select(
      (keyCols.map(col) :+ col(rightTime).cast(l.schema("_t").dataType).as("_t") :+ lit(0).as("_side")) ++
        leftCols.filterNot(keyCols.contains).map(c => lit(null).cast(left.schema(c).dataType).as(s"_l_$c")) ++
        payload.map(c => col(c).as(s"_r_$c")): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(s"_c_$c", last(col(s"_r_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1)
      .select(
        (keyCols.map(col) :+ col("_t").as(leftTime)) ++
          leftCols.filterNot(c => keyCols.contains(c) || c == leftTime)
            .map(c => col(s"_l_$c").as(c)) ++
          payload.map(c => col(s"_c_$c").as(c)): _*)
  }
}
