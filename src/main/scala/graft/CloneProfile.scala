package graft

import org.apache.spark.sql.SparkSession

/** Decomposes etl_clone's scale-sweep cost (r10 verdict item 4: the
  * ×10 ratio of 6.33 was attributed to "presumably the CoW rewrite +
  * audit re-reads" without a measurement). The query has three cost
  * classes with different scale laws:
  *
  *   1. STORE BUILD (ensureTimeTravelVersions): v1 full write + v2
  *      CoW — ∝ table, paid once per source state, shared with the
  *      whole time-travel family;
  *   2. CLONE COMMIT + CoW MUTATION: one manifest write (O(1)) + one
  *      partition rewrite (∝ partition);
  *   3. AUDIT RE-READS: three manifest-resolved full reads (source
  *      post-mutation, clone v1, clone v2) + aggregates — ∝ table by
  *      design, because proving isolation requires reading both sides.
  *
  * Isolation trick: cloneAudit is NOT audit-persisted (it recomputes
  * aggregates each call) while its manifests/CoW are idempotent, so
  * call-1-minus-call-2 isolates class 2, call 2 isolates class 3, and
  * a fresh-store ensure isolates class 1.
  *
  * Usage: `sbt "runMain graft.CloneProfile <x1Dir> <xRDir>"`.
  */
object CloneProfile {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.length >= 2) Seq(args(0), args(1))
      else Seq("/root/testdata/sf0.1", "target/scale_sweep/x10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect(): Unit

    val E = graft.queries.EtlQueries
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
    }
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime()
      Checkpoints.sweeping(spark)(body)
      (System.nanoTime() - t0) / 1e9
    }

    val parts = dirs.map { d =>
      // class 1: store build on a wiped store
      rm(new java.io.File(E.timeTravelBase(d)))
      rm(new java.io.File(E.cloneBase(d)))
      val tStore = time(E.ensureTimeTravelVersions(spark, d): Unit)
      // call 1 = commit + CoW + audit; call 2 = audit only
      val t1 = time(E.cloneAudit(spark, d).collect(): Unit)
      val t2 = (1 to 3).map(_ =>
        time(E.cloneAudit(spark, d).collect(): Unit)).min
      val label = if (d.contains("scale_sweep")) "x10" else "x1"
      f""""${label}_store_build_s":$tStore%.3f,"${label}_cow_commit_s":${math.max(t1 - t2, 0)}%.3f,"${label}_audit_s":$t2%.3f"""
    }
    println(s"""{"metric":"clone_profile",${parts.mkString(",")}}""")
    spark.stop()
  }
}
