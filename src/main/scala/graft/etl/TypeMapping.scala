package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's parquet→postgres conversion matrix re-expressed as
  * Catalyst casts (reference: src/converters.rs:55-70 and the README
  * type-mapping caveat):
  *
  *   parquet (Spark type)    allowed targets
  *   BOOLEAN                 boolean | smallint (1/0) | varchar
  *   INT8/INT16              smallint | int | bigint
  *   INT32                   int | bigint
  *   INT32 (DATE)            date | int | bigint | varchar "YYYY-mm-dd"
  *   INT64                   bigint
  *   FLOAT / DOUBLE          real / double
  *   BYTE_ARRAY (UTF8)       varchar/text
  *   BYTE_ARRAY (NONE)       binary/bytea/blob  (reference leaves this
  *                           `todo!()` — src/converters.rs:96-103; Spark
  *                           carries binary natively so graft supports
  *                           it, which multimodal payload columns need)
  *   DECIMAL(p,s)            numeric (exact passthrough) | double |
  *                           varchar/text | bigint (scale-0 only) —
  *                           the reference's DECIMAL arm is
  *                           half-finished (converters.rs:84,101-114);
  *                           warehouse parquet (prices, amounts) is
  *                           full of DECIMAL, so graft completes it
  *   TIMESTAMP millis/µs     timestamp
  *
  * An unsupported (source, target) combination is a hard error —
  * "this module doesn't do any fancy casting" (reference README) — so
  * nothing silently NULLs out. Declarative casts keep the conversion
  * inside whole-stage codegen at any scale.
  */
object TypeMapping {

  /** Apply per-column target types. `targets` maps column name →
    * SQL type name ("smallint","int","bigint","date","varchar",
    * "text","boolean","real","double","timestamp"). */
  def castTo(df: DataFrame, targets: Map[String, String]): DataFrame = {
    val unknown = targets.keySet -- df.columns.toSet
    require(unknown.isEmpty, s"cast requested for missing column(s): ${unknown.mkString(", ")}")
    val out = df.columns.map { c =>
      targets.get(c) match {
        case Some(t) => convert(col(c), df.schema(c).dataType, t.toLowerCase).as(c)
        case None    => col(c)
      }
    }
    df.select(out.toIndexedSeq: _*)
  }

  private def err(from: DataType, to: String): Nothing =
    throw new IllegalArgumentException(
      s"unsupported conversion ${from.simpleString} -> $to (no fancy casting)")

  private[etl] def convert(c: Column, from: DataType, to: String): Column = (from, to) match {
    case (BooleanType, "boolean")                     => c
    // when-without-otherwise leaves unmatched (NULL) input NULL — the
    // reference preserves NULL for every type (converters.rs:248
    // Field::Null → NullVal); .otherwise(0) silently coerced NULL
    // booleans to 0/"false" (review r11)
    case (BooleanType, "smallint")                    => when(c, 1).when(!c, 0).cast("smallint")
    case (BooleanType, "varchar" | "text")            => when(c, "true").when(!c, "false")
    case (ByteType | ShortType, "smallint")           => c.cast("smallint")
    case (ByteType | ShortType | IntegerType, "int")  => c.cast("int")
    case (ByteType | ShortType | IntegerType | LongType, "bigint") => c.cast("bigint")
    case (DateType, "date")                           => c
    case (DateType, "int")                            => unix_date(c)
    case (DateType, "bigint")                         => unix_date(c).cast("bigint")
    case (DateType, "varchar" | "text")               => date_format(c, "yyyy-MM-dd")
    case (TimestampType | TimestampNTZType, "timestamp") => c
    case (TimestampType, "varchar" | "text")          => date_format(c, "yyyy-MM-dd HH:mm:ss")
    case (FloatType, "real")                          => c
    case (FloatType | DoubleType, "double")           => c.cast("double")
    case (StringType, "varchar" | "text")             => c
    case (BinaryType, "binary" | "bytea" | "blob")    => c
    case (_: DecimalType, "numeric" | "decimal")      => c
    case (_: DecimalType, "double")                   => c.cast("double")
    case (d: DecimalType, "bigint") if d.scale == 0   => c.cast("bigint")
    case (_: DecimalType, "varchar" | "text")         => c.cast("string")
    case (f, t)                                       => err(f, t)
  }
}
