package graft

import java.nio.file.{Files, Path, StandardCopyOption}
import java.nio.file.attribute.FileTime
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Streams

/** Cross-batch CDC-upsert semantics (streamUpsert / JdbcUpsert): a
  * later batch's change overwrites the stored row, a NEW key inserts,
  * and a late-replayed OLDER change does NOT clobber newer state —
  * proven with a three-file replay applied one file per micro-batch.
  */
class UpsertSpec extends AnyFunSuite {
  import SparkTestSession._

  private def writeOne(df: org.apache.spark.sql.DataFrame, dir: Path,
      name: String, mtimeMs: Long): Unit = {
    val staging = Files.createTempDirectory("graft_ups_stage")
    df.coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val part = Files.list(staging).filter(_.toString.endsWith(".parquet"))
      .findFirst().get()
    val dest = dir.resolve(name)
    Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
    // explicit mtimes pin the FileStreamSource batch order
    Files.setLastModifiedTime(dest, FileTime.fromMillis(mtimeMs))
  }

  test("upsert applies inserts, updates, and ignores out-of-order older changes") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ups_landing")
    def ts(h: Int): Timestamp = Timestamp.valueOf(f"2024-02-01 $h%02d:00:00")
    def ev(id: Long, t: Timestamp, u: Long, v: Double) =
      (id, t, u, "update", v, "{}")
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val base = System.currentTimeMillis() - 60000
    // batch 1: users 1, 2
    writeOne(Seq(ev(1, ts(10), 1L, 1.0), ev(2, ts(10), 2L, 2.0))
      .toDF(cols: _*), dir, "events.parquet", base)
    // batch 2: update user 2 (newer), insert user 3
    writeOne(Seq(ev(3, ts(11), 2L, 22.0), ev(4, ts(9), 3L, 3.0))
      .toDF(cols: _*), dir, "events.parquet2", base + 2000)
    // batch 3: LATE replay of an OLDER change for user 1, plus an
    // EQUAL-timestamp change for user 2 with a LOWER event_id — both
    // must be ignored (the cross-batch guard applies the same
    // (ts, event_id) tie-break as the within-batch reduce)
    writeOne(Seq(ev(0, ts(8), 1L, -99.0), ev(2, ts(11), 2L, -50.0))
      .toDF(cols: _*), dir, "events.parquet3", base + 4000)

    val out = Streams.streamUpsert(spark, dir.toString,
        maxFilesPerTrigger = Some(1), dbName = "graft_ups_spec")
      .collect().map(r => r.getLong(0) -> (r.getTimestamp(1), r.getDouble(2)))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == (ts(10), 1.0), s"older replay must not clobber: $out")
    assert(out(2L) == (ts(11), 22.0), s"newer change must overwrite: $out")
    assert(out(3L) == (ts(9), 3.0), s"new key must insert: $out")

    // idempotence: replaying the ENTIRE feed again ON TOP of the
    // existing table (reset=false) must leave it unchanged — the
    // crash-recovery property the order-guarded MERGE buys
    val out2 = Streams.streamUpsert(spark, dir.toString,
        maxFilesPerTrigger = Some(1), dbName = "graft_ups_spec",
        reset = false)
      .collect().map(r => r.getLong(0) -> (r.getTimestamp(1), r.getDouble(2)))
      .toMap
    assert(out2 == out, s"full replay must be a no-op: $out2 vs $out")
  }
}
