package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join — for each left row, the single most recent right row with
  * `right.ts <= left.ts` (or `<` when `strict`) on the same key. The
  * SQL:2023 ASOF JOIN; Spark has no native operator for it.
  *
  * Plan shape (the part that matters at 100 TB): both sides are tagged
  * and unioned, then ONE hash exchange on the key and one partition-local
  * sort order the merged stream by (ts, side); a running
  * `last(_, ignoreNulls)` over that order carries the latest right row
  * forward onto every left row. Cost = one exchange of each side + one
  * sort — identical to a sort-merge equi-join — with no per-row probe, no
  * broadcast, and no time-range cross-product. The right row's columns
  * travel as ONE struct so the carried values are always from the same
  * right row even when some of its fields are null.
  */
object AsofJoin {

  /** @param rightCols right-side columns to carry (exposed as
    *                   `prefix + name`); the right frame must also contain
    *                   `key` and `ts`.
    * @param strict     false → `right.ts <= left.ts` (a right row at the
    *                   exact left timestamp is visible); true → `<`. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightCols: Seq[String], prefix: String = "asof_",
      strict: Boolean = false): DataFrame = {
    val side = "_g_aside"
    val carry = "_g_acarry"
    val lOther = left.columns.toSeq.filterNot(c => c == key || c == ts)
    val carrySchema = StructType(rightCols.map(c => right.schema(c)).toArray)
    // tie rule via sort order of the side tag: inclusive → right rows sort
    // BEFORE left rows at equal ts; strict → after
    val (rightOrd, leftOrd) = if (strict) (1, 0) else (0, 1)
    val lU = left.select(
      Seq(col(key), col(ts), lit(leftOrd).as(side)) ++
        lOther.map(col) :+
        lit(null).cast(carrySchema).as(carry): _*)
    val rU = right.select(
      Seq(col(key), col(ts), lit(rightOrd).as(side)) ++
        lOther.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightCols.map(col): _*).as(carry): _*)
    val w = Window.partitionBy(key).orderBy(col(ts).asc, col(side).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lU.unionByName(rU)
      .withColumn(carry, last(col(carry), ignoreNulls = true).over(w))
      .filter(col(side) === leftOrd)
      .select(
        Seq(col(key), col(ts)) ++ lOther.map(col) ++
          rightCols.map(c => col(carry).getField(c).as(prefix + c)): _*)
  }
}
