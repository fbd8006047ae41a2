package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join (latest-preceding match) — the classic operator Spark's
  * built-ins lack: for each left row, attach the payload of the LATEST
  * right row with `rightTime` ≤ `leftTime` in the same key group
  * (purchase→click attribution, price-as-of-trade, sensor snapshot
  * alignment).
  *
  * Plan: the TAGGED UNION, the distributed-standard as-of shape (what
  * temporal-join engines sort-merge to): both sides share ONE shuffle
  * on the keys, each group sorts by (time, side-tag) and a running
  * `last(ignoreNulls)` carries the most recent right payload forward
  * onto left rows. One shuffle + in-partition sort — the same cost
  * shape as any keyed window; never a range/θ-join, never a
  * per-left-row probe. The payload travels as ONE struct, so
  * multi-column payloads always come from the same right row even
  * when individual payload values are NULL. Right rows sort BEFORE
  * left rows at equal time, so the match contract is inclusive
  * (`rightTime <= leftTime`) — DuckDB `ASOF JOIN ... ON l.t >= r.t`
  * replays it exactly.
  *
  * Contracts: `payload` names must not collide with left columns;
  * right rows must be unique per (keys, rightTime) — pre-aggregate
  * otherwise (an equal-time tie makes ANY engine's as-of selection
  * arbitrary). Left rows with no preceding right row keep NULL
  * payloads (left-join semantics; filter for inner).
  */
object AsOfJoin {
  def latestPreceding(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    require(payload.forall(p => !left.columns.contains(p)),
      s"payload ${payload.mkString(",")} collides with left columns")
    val lCols = left.columns.toSeq
    val pType = StructType(payload.map(p => right.schema(p)))
    val lSide = left.select(
      (lCols.map(col) :+
        lit(null).cast(pType).as("__p") :+
        col(leftTime).cast("long").as("__t") :+ lit(1).as("__side")): _*)
    val rSide = right.select(
      (keys.map(col) ++
        lCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payload.map(col): _*).as("__p") :+
        col(rightTime).cast("long").as("__t") :+ lit(0).as("__side")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.unionByName(rSide)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((lCols.map(col) ++ payload.map(p => col(s"__p.$p").as(p))): _*)
  }
}
