package graft

import graft.etl.{GraftConfig, Pipeline}

/** The reference binary's CLI, Spark-first: exactly one argument — the
  * path to the YAML config (reference: src/cmd_args.rs:16-28, any other
  * arity is an error) — then the full restartable load loop
  * (reference: src/main.rs:15-22).
  *
  * `spark-submit --class graft.Main graft.jar config.yml`
  */
object Main {

  /** Arg validation, separated for testing (mirrors cmd_args.rs). */
  def configPath(args: Array[String]): Either[String, String] =
    if (args.length == 1) Right(args(0))
    else Left("You must pass path to the config yaml")

  def main(args: Array[String]): Unit = configPath(args) match {
    case Left(err) =>
      System.err.println(err)
      sys.exit(2)
    case Right(path) =>
      val cfg = GraftConfig.fromYamlFile(path)
      // no .master() here: spark-submit's --master must win
      val spark = GraftSession.submitBuilder().getOrCreate()
      try {
        val rows = Pipeline.run(spark, cfg)
        println(s"loaded $rows rows into ${cfg.db.tableName}")
      } finally spark.stop()
  }
}
