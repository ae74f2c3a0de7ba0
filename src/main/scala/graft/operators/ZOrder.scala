package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout keys ([EXT]): interleave the bits of two
  * quantized dimensions so range-sorting on ONE key clusters rows that
  * are close in BOTH — the multi-column data-skipping layout (Delta's
  * OPTIMIZE ZORDER, Iceberg's sort orders). After a z-sorted write,
  * parquet row-group min/max stats are tight on both dimensions, so a
  * predicate on either (or both) prunes most files — a plain sort can
  * only serve its leading column.
  *
  * Everything here is a pure codegen'd integer expression (shifts and
  * masks — no UDF, engine-portable arithmetic), so the layout DECISION
  * itself is cross-engine oracle-able: q_zorder hash-compares the
  * interleave against DuckDB computing the same bit algebra.
  */
object ZOrder {

  val QuantBits = 16

  /** Quantize a numeric column into [0, 2^QuantBits) given fixed bounds
    * (fit-style: callers supply corpus min/max — at scale from a cheap
    * stats pass). Clamps out-of-range values rather than wrapping; NULL
    * propagates (Spark's greatest/least SKIP nulls, which would silently
    * send every null row to the top lattice cell — the far corner of the
    * z-curve — instead of leaving the layout decision to the caller).
    */
  def quantize(c: Column, min: Double, max: Double): Column = {
    require(max > min, s"degenerate quantization range [$min, $max]")
    val unit = (c.cast("double") - lit(min)) / lit(max - min)
    val q = floor(unit * lit((1 << QuantBits).toDouble)).cast("long")
    // NaN gets the same explicit routing as NULL: NaN.cast(long) is 0 in
    // non-ANSI mode, which would silently pile every NaN row into the
    // origin lattice cell and poison that file's min/max stats
    when(c.isNull || isnan(c.cast("double")), lit(null).cast("long"))
      .otherwise(greatest(lit(0L), least(lit(((1L << QuantBits) - 1)), q)))
  }

  /** Morton interleave of two QuantBits-wide values: bit i of `x` lands
    * at position 2i, bit i of `y` at 2i+1. A fixed sum of shift/mask
    * terms — one codegen'd expression, identical algebra in any engine.
    */
  def interleave(x: Column, y: Column): Column =
    (0 until QuantBits).map { i =>
      (shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)

  /** Z-value for two numeric columns under fixed bounds. */
  def zValue(x: Column, xMin: Double, xMax: Double,
      y: Column, yMin: Double, yMax: Double): Column =
    interleave(quantize(x, xMin, xMax), quantize(y, yMin, yMax))

  /** Sort a frame by the z-value of two columns (range partition + local
    * sort — the shape a layout-optimizing write needs; pass the result
    * straight to a writer). Bounds are caller-supplied corpus stats.
    */
  def zOrderBy(df: DataFrame, xCol: String, xMin: Double, xMax: Double,
      yCol: String, yMin: Double, yMax: Double): DataFrame = {
    // sort on the expression directly — a temp column could collide with
    // (and silently destroy) a caller column of the same name
    val z = zValue(col(xCol), xMin, xMax, col(yCol), yMin, yMax)
    df.repartitionByRange(z).sortWithinPartitions(z)
  }
}
