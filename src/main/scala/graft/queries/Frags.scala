package graft.queries

/** SQL fragments shared verbatim between the Spark plans (via `expr`)
  * and the DuckDB oracle strings.
  *
  * Double-summation order differs between engines (and between Spark
  * task orderings), so every sum over a fractional double column is
  * routed through an exact DECIMAL accumulation and only cast back to
  * DOUBLE at the end — the result is bit-identical regardless of
  * aggregation order. Integer-valued doubles (l_quantity) are exact in
  * IEEE summation at these magnitudes and are summed directly.
  */
object Frags {
  /** Exact sum of a 2-decimal money column. */
  def dsum2(col: String): String =
    s"CAST(SUM(CAST($col AS DECIMAL(12,2))) AS DOUBLE)"

  /** Exact sum of an arbitrary double column (6-decimal quantisation,
    * applied identically on both engines so it is still an exact
    * compare). */
  def dsum6(col: String): String =
    s"CAST(SUM(CAST($col AS DECIMAL(18,6))) AS DOUBLE)"

  /** sum(price * (1 - discount)) — the TPC-H revenue term, exact. */
  def revenue(price: String = "l_extendedprice", disc: String = "l_discount"): String =
    s"CAST(SUM(CAST($price AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST($disc AS DECIMAL(3,2)))) AS DOUBLE)"

  /** sum(price * (1 - discount) * (1 + tax)) — exact 3-way product. */
  def charge(price: String = "l_extendedprice", disc: String = "l_discount", tax: String = "l_tax"): String =
    s"CAST(SUM(CAST($price AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST($disc AS DECIMAL(3,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST($tax AS DECIMAL(3,2)))) AS DOUBLE)"

  /** Deterministic mean: exact decimal sum, one double division. */
  def davg2(col: String): String =
    s"CAST(SUM(CAST($col AS DECIMAL(12,2))) AS DOUBLE) / COUNT($col)"

  /** Deterministic mean at 9-decimal quantisation (unit-scale values,
    * e.g. embedding components); operand may be any SQL expression.
    * Quantises with FLOOR(x·1e9) rather than a DECIMAL cast: a cast
    * ROUNDS, and a double sitting exactly on the half-way boundary is
    * tie-broken differently across engines (observed once in 128k
    * values at sf0.1) — floor has no ties, so the quantised sum is
    * bit-identical everywhere. */
  def davg9(operand: String): String =
    s"CAST(SUM(CAST(FLOOR(($operand) * 1e9) AS DECIMAL(28,0))) AS DOUBLE) / 1e9 / COUNT(*)"
}
