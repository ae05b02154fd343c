package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join (DuckDB `ASOF JOIN`, SURVEY §2.4 Q22).
  *
  * Spark has no asof primitive. The naive encoding — range join + pick
  * closest — explodes to O(|matches|) intermediate rows, which dies at scale
  * when every left row matches thousands of right rows. This implementation
  * is the scale path:
  *
  *   1. union left and right rows tagged by side, keyed by (key, time);
  *   2. one hash shuffle on the key + in-partition sort by (time, side);
  *   3. running `last(right_payload, ignoreNulls)` window — each left row
  *      picks up the latest right row at-or-before it in O(1) per row.
  *
  * Total cost: one shuffle of |L|+|R| rows, no row multiplication, no skew
  * amplification beyond the key distribution itself. (The SQL-surface
  * rewrite in [[graft.dialect.Translator]] uses the range-join form, which
  * is fine at interactive result sizes; use this operator for pipelines.)
  *
  * `direction`: "backward" matches the latest right time <= left time
  * (DuckDB default); "forward" matches the earliest right time >= left time.
  * `strict` excludes equal times (the `<` / `>` ASOF forms).
  */
object AsOfJoin {

  def asof(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      direction: String = "backward",
      inner: Boolean = true,
      strict: Boolean = false): DataFrame = {
    require(direction == "backward" || direction == "forward", s"bad direction $direction")

    // SQL join semantics: a NULL key or time never matches. Without these
    // filters the window would group NULL keys into one partition and sort
    // NULL times first, letting NULL-keyed right rows "match" — diverging
    // from the equality-join form. Right-side NULLs can never match, so
    // always drop them; left-side NULLs only survive an outer (left) asof,
    // where they correctly pick up a NULL payload.
    val right0 = right.filter(right(rightKey).isNotNull && right(rightTime).isNotNull)
    val left0 = if (inner)
      left.filter(left(leftKey).isNotNull && left(leftTime).isNotNull) else left

    val payloadStruct = struct(rightPayload.map(right0(_)): _*)
    val payloadType = {
      import org.apache.spark.sql.types.StructType
      StructType(rightPayload.map(c => right0.schema(c)))
    }
    val leftCols = left0.columns

    val lTagged = left0.select(
      left0(leftKey).as("__graft_k"),
      left0(leftTime).as("__graft_t"),
      lit(1).as("__graft_side"),
      struct(leftCols.map(left0(_)): _*).as("__graft_l"),
      lit(null).cast(payloadType).as("__graft_r"))
    val rTagged = right0.select(
      right0(rightKey).as("__graft_k"),
      right0(rightTime).as("__graft_t"),
      lit(0).as("__graft_side"),
      lit(null).cast(lTagged.schema("__graft_l").dataType).as("__graft_l"),
      payloadStruct.as("__graft_r"))

    // Equal timestamps must place the right row on the matchable side of the
    // left row: before it for non-strict (<= / >=, right rows at the same
    // time ARE visible), after it for strict (< / >, they are not). side is
    // 0 for right rows and 1 for left rows, so asc shows same-time right
    // rows to the running last(); desc hides them.
    val sideOrder = if (strict) col("__graft_side").desc else col("__graft_side").asc
    val timeOrder = if (direction == "backward") col("__graft_t").asc else col("__graft_t").desc
    val frame = Window.partitionBy("__graft_k")
      .orderBy(timeOrder, sideOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = lTagged.unionByName(rTagged)
      .withColumn("__graft_match", last("__graft_r", ignoreNulls = true).over(frame))
      .filter(col("__graft_side") === 1)

    val base = if (inner) matched.filter(col("__graft_match").isNotNull) else matched
    base.select(
      leftCols.map(c => col(s"__graft_l.$c").as(c)) ++
        rightPayload.map(c => col(s"__graft_match.$c").as(c)): _*)
  }
}
