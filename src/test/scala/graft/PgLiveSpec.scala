package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.sinks.PgBinaryCopy

/** Live-server acceptance of the PGCOPY binary wire format — the one
  * integration seam golden bytes could not close (r10 verdict item 6):
  * a REAL `COPY ... FROM ... (FORMAT binary)` executed by a real
  * PostgreSQL server against bytes produced by [[PgBinaryCopy]], then
  * read back and value-compared. The spec bootstraps its own
  * throwaway instance (initdb + unix socket, no TCP) as an
  * unprivileged user; where the container lacks server binaries or
  * the privilege dance fails, it CANCELS (reported as canceled, not
  * green) so the suite stays honest elsewhere.
  *
  * Covers every fieldEncoder branch: bool, int2/4/8, float4/8, text
  * (multibyte UTF-8 incl. a supplementary-plane char — the utf8-gate
  * discipline), bytea, pre-1970 date and microsecond timestamp, and
  * numeric (negative high-scale + zero), plus an all-NULL tuple.
  * The CopyManager JDBC leg stays stubbed (no pgjdbc jar offline);
  * that leg is pure plumbing over these same bytes. */
class PgLiveSpec extends AnyFunSuite {

  private val PgBin = "/usr/lib/postgresql/15/bin"
  // explicit UTF-8 decode of the child's output: sys.process decodes
  // with the platform charset, which mangles multibyte under the
  // container's POSIX locale
  private def sh(cmd: String): (Int, String) = {
    val pb = new java.lang.ProcessBuilder("sh", "-c", cmd)
    pb.directory(new java.io.File("/tmp"))
    pb.redirectErrorStream(true)
    val p = pb.start()
    val bytes = p.getInputStream.readAllBytes()
    val code = p.waitFor()
    (code, new String(bytes, "UTF-8"))
  }
  private def asNobody(cmd: String): (Int, String) =
    sh(s"su -s /bin/sh nobody -c '$cmd'")

  test("live COPY FROM (FORMAT binary) round-trips every encoder type") {
    if (!new java.io.File(s"$PgBin/initdb").exists)
      cancel("no postgresql server binaries in this container")
    val base = Files.createTempDirectory("pglive")
    val data = s"$base/data"; val sock = s"$base/sock"
    Files.createDirectories(Paths.get(sock))
    // the server runs unprivileged; root hands it the scratch dirs
    sh(s"chmod 755 $base && chown nobody $base $sock")
    // UTF-8 database encoding: under the container's C locale initdb
    // would otherwise create SQL_ASCII and mangle multibyte text
    val (initCode, initOut) =
      asNobody(s"$PgBin/initdb -D $data --no-sync -A trust -E UTF8 --locale=C.UTF-8")
    if (initCode != 0) cancel(s"initdb failed: ${initOut.takeRight(200)}")
    val (startCode, startOut) = asNobody(
      s"$PgBin/pg_ctl -D $data -o \"-k $sock -c listen_addresses=\" " +
        s"-l $base/log -w start")
    if (startCode != 0) cancel(s"server start failed: ${startOut.takeRight(200)}")
    try {
      def psql(q: String): String = {
        val (c, o) = sh(
          s"""PGCLIENTENCODING=UTF8 psql -h $sock -U nobody postgres -v ON_ERROR_STOP=1 -At -c "$q"""")
        assert(c == 0, s"psql failed: $o")
        o
      }
      psql("""CREATE TABLE graft_copy (
        b boolean, i2 smallint, i4 integer, i8 bigint,
        f4 real, f8 double precision, s text, by bytea,
        dt date, ts timestamp, num numeric)""")

      val schema = StructType(Seq(
        StructField("b", BooleanType), StructField("i2", ShortType),
        StructField("i4", IntegerType), StructField("i8", LongType),
        StructField("f4", FloatType), StructField("f8", DoubleType),
        StructField("s", StringType), StructField("by", BinaryType),
        StructField("dt", DateType), StructField("ts", TimestampType),
        StructField("num", DecimalType(20, 4))))
      val encs = schema.fields.map(f =>
        PgBinaryCopy.fieldEncoder(f.dataType).getOrElse(
          fail(s"no encoder for ${f.dataType}")))
      val rows = Seq(
        Row(true, (-32768).toShort, 2147483647, -9007199254740993L,
          1.5f, -2.25d, "héllo 中𝕆", Array[Byte](0, 1, -1),
          java.time.LocalDate.of(1969, 7, 20),
          java.time.Instant.parse("1965-03-04T12:34:56.789012Z"),
          new java.math.BigDecimal("-12345.6789")),
        Row(false, 7.toShort, -1, 0L, 0.0f, 0.0d, "", Array[Byte](),
          java.time.LocalDate.of(2024, 2, 29),
          java.time.Instant.parse("2024-02-29T23:59:59.000001Z"),
          new java.math.BigDecimal("0.0000")),
        Row(null, null, null, null, null, null, null, null, null, null, null))
      val bin = s"$base/tuples.bin"
      val out = new java.io.FileOutputStream(bin)
      try {
        out.write(PgBinaryCopy.header)
        rows.foreach(r => out.write(PgBinaryCopy.encodeRow(r, encs)))
        out.write(PgBinaryCopy.trailer)
      } finally out.close()
      sh(s"chmod 644 $bin")

      // the REAL consumer: server-side binary COPY of our bytes
      psql(s"COPY graft_copy FROM '$bin' (FORMAT binary)")

      val got = psql(
        "SELECT b,i2,i4,i8,f4,f8,s,by,dt,ts,num FROM graft_copy ORDER BY i4 NULLS LAST")
        .trim.split('\n').toSeq
      assert(got == Seq(
        "f|7|-1|0|0|0||\\x|2024-02-29|2024-02-29 23:59:59.000001|0.0000",
        "t|-32768|2147483647|-9007199254740993|1.5|-2.25|héllo 中𝕆|" +
          "\\x0001ff|1969-07-20|1965-03-04 12:34:56.789012|-12345.6789",
        "||||||||||"),
        "server-decoded values must equal what the encoder was fed")
      // numeric arithmetic sanity: the server can COMPUTE on what we
      // sent (proves numeric groups/weight/scale, not just display)
      assert(psql("SELECT SUM(num) FROM graft_copy").trim == "-12345.6789")
      assert(psql("SELECT COUNT(*) FROM graft_copy WHERE b IS NULL").trim == "1")
      // transport-independent multibyte check: the server's own md5 +
      // byte/char census over the stored text must match the UTF-8
      // bytes the encoder was fed (immune to psql display encoding)
      val s0 = "héllo 中𝕆"
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s0.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(psql(
        "SELECT md5(s) || '|' || octet_length(s) || '|' || char_length(s)" +
          " FROM graft_copy WHERE b").trim ==
        s"$md5|${s0.getBytes("UTF-8").length}|${s0.codePointCount(0, s0.length)}")
    } finally {
      asNobody(s"$PgBin/pg_ctl -D $data -m immediate stop")
      sh(s"rm -rf $base")
      ()
    }
  }
}
