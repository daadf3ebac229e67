package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact integer division Columns shared by the metric operators.
  *
  * Two engine-portability traps motivate these: Spark's `/` on longs
  * is DOUBLE division (silently rounds once the numerator passes
  * 2⁵³), and `floor(decimalA / decimalB)` rounds the quotient to the
  * result scale BEFORE the floor (a true quotient of x.9999996 at
  * scale 6 floors to x+1). Subtracting the `%` remainder first makes
  * the division exact-integral.
  *
  * Sign convention: TRUNCATION toward zero, because that is what
  * DuckDB's integer `//` actually does (`SELECT (-7) // 2` → −3, on
  * BIGINT and HUGEINT alike — verified empirically; it is NOT floor
  * division, despite `//` floor-dividing in Python). Spark's `%` on
  * decimals takes the dividend's sign (Java remainder), so
  * `(t − t % d) / d` is exactly trunc(t/d) for every sign
  * combination — the identical number the oracle's `//` produces.
  * Operators that need a different convention for negative
  * numerators (e.g. the log-quantized drift bits) handle the sign
  * explicitly before dividing.
  */
object IntMath {

  /** EXACT trunc(num / den) — toward zero, DuckDB `//` semantics —
    * over the full BIGINT range (DECIMAL(38,0) internally; result
    * cast to long). */
  def truncDiv(num: Column, den: Column): Column = {
    val t = num.cast("decimal(38,0)")
    val d = den.cast("decimal(38,0)")
    ((t - t % d) / d).cast("long")
  }

  /** trunc(num·10⁶ / den), exact — the ppm rendering used across the
    * metric operators (floor for the non-negative numerators almost
    * every metric produces; toward zero like the oracle's `//`
    * otherwise). */
  def ppmDiv(num: Column, den: Column): Column =
    truncDiv(num.cast("decimal(38,0)") * lit(1000000L), den)
}
