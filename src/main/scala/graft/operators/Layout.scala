package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering keys for write
  * layout. At 100 TB the dominant cost of most queries is the scan, and
  * the dominant scan saving is file skipping off parquet min/max
  * footers — which only works if the writer clustered rows so each
  * file's bounding box over the filter columns is tight. A Z-order
  * (Morton) key interleaves the bits of two dimensions so sorting by
  * the single key co-locates rows that are close in BOTH dimensions:
  * `write.sortBy(zkey)` then gives every output file a small bounding
  * box in (x, y), and a filter on either dimension prunes most files —
  * the same layout trick Delta/Iceberg expose as OPTIMIZE ZORDER.
  *
  * The key is pure integer arithmetic (`div`/`mod`/`·2ⁱ` — no bitwise
  * intrinsics) so it stays inside whole-stage codegen and replays
  * identically on any engine.
  */
object Layout {

  /** Morton-interleave two non-negative integer columns, `bits` bits
    * each (values must already be reduced mod 2^bits): bit i of x lands
    * at position 2i, bit i of y at 2i+1. Spark side uses integer
    * shifts (exact, codegen'd); the SQL rendering uses `//`/`%` — the
    * two agree on all non-negative inputs. */
  def zorder2(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      (shiftright(x.cast("long"), i) % 2L) * lit(1L << (2 * i)) +
        (shiftright(y.cast("long"), i) % 2L) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  /** The same interleave as engine-neutral SQL text (for oracles and
    * pushdown into external writers). */
  def zorder2Sql(x: String, y: String, bits: Int): String =
    "(" + (0 until bits).map { i =>
      val p = 1L << i
      s"(($x // $p) % 2) * ${1L << (2 * i)} + (($y // $p) % 2) * ${1L << (2 * i + 1)}"
    }.mkString(" + ") + ")"

  /** Layout diagnostic: split the z-sorted keyspace into `chunks`
    * equal z-ranges (stand-ins for output files) and report each
    * chunk's row count and (x, y) bounding box. Tight boxes == good
    * skipping; the judge of layout quality is `x_span·y_span` vs the
    * full domain. */
  def zorderBoxes(df: DataFrame, x: Column, y: Column, bits: Int,
      chunks: Int): DataFrame = {
    val zBits = 2 * bits
    require(Integer.bitCount(chunks) == 1 && chunks <= (1 << zBits),
      s"chunks must be a power of two <= 2^$zBits")
    val chunkShift = zBits - Integer.numberOfTrailingZeros(chunks)
    df.select(x.as("x"), y.as("y"),
        zorder2(x, y, bits).as("zkey"))
      .groupBy(shiftright(col("zkey"), chunkShift).as("chunk"))
      .agg(count(lit(1)).as("n"),
        min("x").as("x_min"), max("x").as("x_max"),
        min("y").as("y_min"), max("y").as("y_max"))
  }
}
