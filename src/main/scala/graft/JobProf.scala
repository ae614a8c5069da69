package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Per-query execution-shape profiler (r13 optimization round):
  * `runMain graft.JobProf <q1,q2,...> [sfDir]` runs each query cold
  * and warm (same frame, fresh noop action) and prints, per run, the
  * number of Spark jobs/stages/tasks it scheduled, the summed task
  * time, and the wall split between in-job time and driver-only gaps
  * (plan/codegen/AQE re-optimisation) — the decomposition §1 of the
  * optimization guide asks for before touching anything: a query
  * whose wall is driver gaps needs fewer actions or a cached plan, a
  * query whose wall is task time needs a better distributed shape.
  */
object JobProf {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(sys.error("usage: JobProf <q1,q2,...> [sfDir]"))
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$d/region.parquet").count()
    spark.range(1000000L).selectExpr("sum(id)").collect()

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskMs = 0L
    @volatile var jobMs = 0L
    val starts = scala.collection.concurrent.TrieMap.empty[Int, Long]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs += 1; starts(j.jobId) = System.nanoTime()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach(t0 => jobMs += (System.nanoTime() - t0) / 1000000L)
      override def onStageCompleted(st: SparkListenerStageCompleted): Unit =
        stages += 1
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks += 1
        if (t.taskInfo != null) taskMs += t.taskInfo.duration
      }
    })
    def reset(): Unit = { jobs = 0; stages = 0; tasks = 0; taskMs = 0L; jobMs = 0L }

    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      def once(tag: String, df: org.apache.spark.sql.DataFrame): Unit = {
        reset()
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val wallMs = (System.nanoTime() - t0) / 1000000L
        // drain the async listener bus so counts are stable (private
        // API avoided: a short settle sleep is enough at this scale)
        Thread.sleep(150)
        println(f"""{"q":"$name","run":"$tag","wall_ms":$wallMs,"jobs":$jobs,"stages":$stages,"tasks":$tasks,"task_ms":$taskMs,"job_ms":$jobMs,"gap_ms":${wallMs - jobMs}}""")
      }
      Checkpoints.sweeping(spark) {
        val t0 = System.nanoTime()
        val df = fn(spark, d)
        val buildMs = (System.nanoTime() - t0) / 1000000L
        println(s"""{"q":"$name","build_ms":$buildMs}""")
        once("cold", df)
        once("warm", df)
        once("warm2", df)
      }
    }
    spark.stop()
  }
}
