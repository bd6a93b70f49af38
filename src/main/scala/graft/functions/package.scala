package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Small numeric helpers shared by the operators.
  *
  * The driver's correctness gate hash-compares our parquet output against
  * DuckDB on the same inputs, so aggregates over doubles must be
  * order-independent: a plain `sum(double)` differs in the last bits
  * between engines (and between partitionings of the SAME engine).
  * All the money-ish columns in the test tables sit on a 2-decimal grid
  * (and their pairwise products on a <=6-decimal grid), so casting each
  * value to an exact decimal before summing makes the sum associative
  * and bit-identical everywhere. The DuckDB twin is
  * `CAST(sum(CAST(x AS DECIMAL(18,s))) AS DOUBLE)`.
  */
package object functions {

  /** Order-independent exact sum of a double column carrying at most
    * `scale` decimal digits per value. */
  def dsum(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** sum for raw 2-decimal columns (prices, discounts, event values). */
  def dsum2(c: Column): Column = dsum(c, 2)

  /** sum for products of 2-decimal columns (exact at 4-6 decimals). */
  def dsum6(c: Column): Column = dsum(c, 6)

  /** Order-independent mean: exact decimal sum, then one double divide.
    * DuckDB twin: `CAST(sum(CAST(x AS DECIMAL(18,s))) AS DOUBLE)/count(*)`. */
  def davg(c: Column, scale: Int = 2): Column = dsum(c, scale) / count(lit(1))
}
