package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{Fnv64, SimHash64}

/** Registers graft's native Catalyst expressions for SQL use
  * (`SELECT fnv64(text), simhash64(tokens) ...`) via the public
  * extensions hook, so `spark.sql` parity exists for every DataFrame
  * surface. Attach with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or use
  * [[GraftSession.builder]]. Also loadable through
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftFunctions.{arity, builders}
  override def apply(e: SparkSessionExtensions): Unit =
    builders.foreach { case (name, (n, cls, make)) =>
      e.injectFunction((new FunctionIdentifier(name),
        new ExpressionInfo(cls, name),
        (exprs: Seq[Expression]) => arity(name, n, exprs, make)))
    }
}

/** Runtime registration for sessions that already exist (the
  * extensions hook only fires when a session is built). */
object GraftFunctions {
  import org.apache.spark.sql.graft.shim

  /** Wrong argument counts must fail analysis with a clear message,
    * not an IndexOutOfBounds from the builder. */
  private[graft] def arity(name: String, n: Int, exprs: Seq[Expression],
      make: Seq[Expression] => Expression): Expression = {
    if (exprs.length != n)
      throw new IllegalArgumentException(
        s"$name expects $n argument(s), got ${exprs.length}")
    make(exprs)
  }

  private[graft] val builders: Map[String, (Int, String, Seq[Expression] => Expression)] = Map(
    "fnv64" -> ((1, classOf[Fnv64].getName,
      (es: Seq[Expression]) => Fnv64(es.head))),
    "simhash64" -> ((1, classOf[SimHash64].getName,
      (es: Seq[Expression]) => SimHash64(es.head))),
    "dot_product" -> ((2, classOf[graft.functions.DotProduct].getName,
      (es: Seq[Expression]) => graft.functions.DotProduct(es.head, es(1)))))

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, (n, _, make)) =>
      shim.registerFunction(spark, name, exprs => arity(name, n, exprs, make))
    }
}

/** Session factory with the engine's scale defaults: AQE on (runtime
  * skew-join + partition coalescing), UTC, shuffle parallelism sized to
  * the machine instead of Spark's default 200.
  */
object GraftSession {
  def builder(master: String = "local[*]",
      shufflePartitions: Int = 32): SparkSession.Builder =
    configure(SparkSession.builder().master(master), shufflePartitions)

  /** Builder that does NOT set a master — for spark-submit deployments,
    * where a hardcoded master would silently override `--master` and
    * run the job single-node. */
  def submitBuilder(shufflePartitions: Int = 32): SparkSession.Builder =
    configure(SparkSession.builder(), shufflePartitions)

  private def configure(b: SparkSession.Builder,
      shufflePartitions: Int): SparkSession.Builder = {
    val base = b.appName("graft")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // explicit session-wide stance on TIMESTAMP(NANOS) parquet
      // columns (surfaced as raw nanos longs; Tables.events converts
      // exactly) — set here so it is a documented default, not a
      // hidden runtime flip on first events read
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // Deployment/experiment overrides (r13 optimization round): any
    // `k=v;k=v` list in SPARK_GRAFT_CONF is applied LAST, so
    // scale-dependent settings (shuffle partitions, join-strategy
    // preferences, advisory partition sizes) stay parameterised per
    // environment instead of hard-coded for one machine shape. Also
    // the lever order-controlled conf A/Bs use (one JVM per arm).
    sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(';')).map(_.trim).filter(_.nonEmpty)
      .foldLeft(base) { (bb, kv) =>
        kv.split("=", 2) match {
          case Array(k, v) if k.trim.nonEmpty => bb.config(k.trim, v.trim)
          case _ => throw new IllegalArgumentException(
            s"SPARK_GRAFT_CONF entries must be key=value, got '$kv'")
        }
      }
  }
}
