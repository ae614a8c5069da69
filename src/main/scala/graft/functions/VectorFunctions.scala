package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns (SURVEY.md §2.4).
  *
  * The fold is an explicit left-to-right `aggregate` over the array with
  * every element cast to DOUBLE before multiplying: IEEE addition is then
  * performed in a deterministic order, so the result is bit-identical
  * across partitions, runs, and engines (the DuckDB oracle mirrors the
  * same sequential fold via list_reduce). `zip_with` + `aggregate` are
  * Catalyst built-ins — no UDF, no serialization, codegen-friendly.
  */
object VectorFunctions {

  /** Deterministic double dot product (native codegen'd expression;
    * same left-to-right fold as the declarative
    * aggregate(zip_with(...)) form — see VectorExpressions). */
  def dotD(a: Column, b: Column): Column = VectorExpressions.dot(a, b)

  /** Squared L2 norm. */
  def norm2(a: Column): Column = dotD(a, a)

  /** Cosine similarity, computed as one fixed expression tree:
    * dot / sqrt(norm_a * norm_b). */
  def cosine(a: Column, b: Column): Column =
    dotD(a, b) / sqrt(norm2(a) * norm2(b))
}
