package graft

import java.nio.file.{Files, Paths}

/** Plan-artifact dumper (r13 optimization round):
  * `runMain graft.PlanDump <q1,q2,...> <outDir> <suffix> [sfDir]`
  * writes each query's `.explain("formatted")` output to
  * `<outDir>/<query>_<suffix>.txt` — the before/after evidence files
  * the optimization log cites. No action is run (construction-time
  * side effects still execute, as they do under Bench).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val outDir = Paths.get(args(1))
    val suffix = args(2)
    val d = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      Checkpoints.sweeping(spark) {
        val df = fn(spark, d)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), plan)
        System.err.println(s"[plandump] wrote ${name}_$suffix.txt")
      }
    }
    spark.stop()
  }
}
