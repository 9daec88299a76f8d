package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark lacks natively.
  *
  * For every left row, attach the most recent right row with the same key
  * and `rightTs <= leftTs` (the temporal-dimension lookup: "which signup
  * version was current when this event happened"). Composed from existing
  * operators per the preference order (SURVEY §7.3 / builder brief (a)):
  * union + one window, no custom physical plan needed.
  *
  * Mechanics: tag right rows priority 0 and left rows priority 1, union on
  * an aligned schema, then `last(value, ignoreNulls)` over
  * `partitionBy(keys).orderBy(ts, priority, tieBreak)` with an unbounded
  * preceding frame: each left row sees exactly the latest right row at or
  * before its timestamp.
  *
  * Scale: ONE shuffle on the key columns and an in-partition sort — same
  * cost envelope as any windowed aggregate, no range-explosion, no
  * broadcast requirement on either side. Skewed keys respond to the usual
  * salting (split hot keys by time range) — noted, not needed here.
  *
  * Equivalent to DuckDB/ClickHouse `ASOF LEFT JOIN` with `ON key =, lts >=
  * rts` (ties at equal timestamps include the right row; among multiple
  * right rows at the same (key, ts) the one with the greatest `tieBreak`
  * wins — pass a unique column to make it deterministic).
  */
object AsofJoin {

  def asofJoinLast(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String,
                   valueCols: Seq[String], tieBreak: String): DataFrame = {
    val leftCols = left.columns
    val nullLit: String => Column = c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")

    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__prio", lit(1))
      .withColumn("__tie", lit(null).cast(right.schema(tieBreak).dataType))
    val lAligned = l.select(
      keys.map(col) ++ Seq(col("__ts"), col("__prio"), col("__tie")) ++
        leftCols.filterNot(keys.contains).map(col) ++ valueCols.map(nullLit): _*)

    // NULL right keys / timestamps can never be as-of candidates (SQL
    // comparison semantics, matching DuckDB ASOF): drop them before the
    // union — otherwise a null-keyed right row would land in the null-key
    // window partition and "match" null-keyed left rows, and a null-ts
    // right row would sort nulls-first and look current for every left row.
    val r = right
      .filter((keys :+ rightTs).map(col(_).isNotNull).reduce(_ && _))
      .withColumn("__ts", col(rightTs))
      .withColumn("__prio", lit(0))
      .withColumn("__tie", col(tieBreak))
    val rAligned = r.select(
      keys.map(col) ++ Seq(col("__ts"), col("__prio"), col("__tie")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(c => col(c).as(s"__r_$c")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__prio").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // Pack the right values into ONE struct that is non-null for every right
    // row: `last(value, ignoreNulls)` per column would skip a right row whose
    // value is genuinely NULL and resurrect a stale older value — the packed
    // struct keeps the true as-of row, nulls and all (matching DuckDB ASOF).
    val packed = when(col("__prio") === 0,
      struct(valueCols.map(c => col(s"__r_$c").as(c)): _*))
    lAligned.unionByName(rAligned)
      .withColumn("__rpack", last(packed, ignoreNulls = true).over(w))
      .select(col("*") +: valueCols.map(c =>
        col("__rpack").getField(c).as(s"asof_$c")): _*)
      .filter(col("__prio") === 1)
      .drop(("__ts" +: "__prio" +: "__tie" +: "__rpack" +: valueCols.map(c => s"__r_$c")): _*)
  }
}
