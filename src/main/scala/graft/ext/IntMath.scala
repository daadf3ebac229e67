package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact integer division Columns shared by the metric operators.
  *
  * Two engine-portability traps motivate these: Spark's `/` on longs
  * is DOUBLE division (silently rounds once the numerator passes
  * 2⁵³), and `floor(decimalA / decimalB)` rounds the quotient to the
  * result scale BEFORE the floor (a true quotient of x.9999996 at
  * scale 6 floors to x+1). Subtracting the pmod first makes the
  * division exact-integral, and pmod's sign convention makes this
  * FLOOR division (not truncation toward zero) — the semantics of
  * DuckDB's `//` and Python's `//` — which matters for negative
  * numerators (κ, information gain, drift deltas can all go
  * negative).
  */
object IntMath {

  /** EXACT floor(num / den) over the full BIGINT range (DECIMAL(38,0)
    * internally; result cast to long). */
  def floorDiv(num: Column, den: Column): Column = {
    val t = num.cast("decimal(38,0)")
    val d = den.cast("decimal(38,0)")
    ((t - pmod(t, d)) / d).cast("long")
  }

  /** floor(num·10⁶ / den), exact — the ppm rendering used across the
    * metric operators. */
  def ppmDiv(num: Column, den: Column): Column =
    floorDiv(num.cast("decimal(38,0)") * lit(1000000L), den)
}
