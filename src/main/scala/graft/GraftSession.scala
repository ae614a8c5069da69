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
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((new FunctionIdentifier("fnv64"),
      new ExpressionInfo(classOf[Fnv64].getName, "fnv64"),
      (exprs: Seq[Expression]) => Fnv64(exprs.head)))
    e.injectFunction((new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    e.injectFunction((new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[graft.functions.DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) =>
        graft.functions.DotProduct(exprs.head, exprs(1))))
  }
}

/** Runtime registration for sessions that already exist (the
  * extensions hook only fires when a session is built). */
object GraftFunctions {
  import org.apache.spark.sql.graft.shim
  def register(spark: SparkSession): Unit = {
    shim.registerFunction(spark, "fnv64", exprs => Fnv64(exprs.head))
    shim.registerFunction(spark, "simhash64", exprs => SimHash64(exprs.head))
    shim.registerFunction(spark, "dot_product",
      exprs => graft.functions.DotProduct(exprs.head, exprs(1)))
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
      shufflePartitions: Int): SparkSession.Builder =
    b.appName("graft")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
}
