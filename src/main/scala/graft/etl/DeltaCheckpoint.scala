package graft.etl

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.schema.MessageTypeParser

/** Delta-protocol CHECKPOINTS for the exported transaction log — the
  * long-history scale path the DeltaExport scaladoc promised: a
  * checkpoint at version V materializes the replayed state (protocol +
  * metaData + every live `add`) as `_delta_log/%020d.checkpoint.parquet`
  * plus the `_last_checkpoint` pointer, so mounting a table with a
  * 1000-commit history reads ONE parquet file and the few JSON tails
  * past V instead of replaying every JSON version since genesis —
  * O(live files + tail), not O(history). This is delta-io PROTOCOL.md's
  * checkpoint mechanism; readers that ignore it (replaying the JSONs)
  * still get the same answer, which is exactly the negotiation the
  * protocol intends.
  *
  * Both halves run DRIVER-SIDE on the parquet example API (the
  * ManifestCommit discipline — checkpoints are metadata, no Spark job):
  * [[write]] streams the state through ExampleParquetWriter (sorted by
  * add path, so content is deterministic), [[read]] replays it through
  * GroupReadSupport. The row schema carries the protocol's checkpoint
  * columns: `protocol`, `metaData` (with LIST partitionColumns), and
  * `add` (with MAP partitionValues and the JSON-string stats). */
object DeltaCheckpoint {

  private val mapper = new ObjectMapper()

  private val CpSchema = MessageTypeParser.parseMessageType(
    """message delta_checkpoint {
      |  optional group protocol {
      |    optional int32 minReaderVersion;
      |    optional int32 minWriterVersion;
      |  }
      |  optional group metaData {
      |    optional binary id (STRING);
      |    optional binary name (STRING);
      |    optional group format { optional binary provider (STRING); }
      |    optional binary schemaString (STRING);
      |    optional group partitionColumns (LIST) {
      |      repeated group list { optional binary element (STRING); }
      |    }
      |    optional int64 createdTime;
      |  }
      |  optional group add {
      |    optional binary path (STRING);
      |    optional group partitionValues (MAP) {
      |      repeated group key_value {
      |        required binary key (STRING);
      |        optional binary value (STRING);
      |      }
      |    }
      |    optional int64 size;
      |    optional int64 modificationTime;
      |    optional boolean dataChange;
      |    optional binary stats (STRING);
      |  }
      |}""".stripMargin)

  private def cpPath(tableDir: String, v: Long): java.io.File =
    new java.io.File(f"$tableDir/_delta_log/$v%020d.checkpoint.parquet")

  /** Checkpoint the exported log at version `v` (idempotent: an
    * existing checkpoint file for `v` is kept as-is) and point
    * `_last_checkpoint` at it. Returns the number of rows written. */
  def write(tableDir: String, v: Long): Long = {
    val snap = DeltaImport.readLog(tableDir, v)
    val target = cpPath(tableDir, v)
    val nRows = 2L + snap.files.size
    if (!target.exists) {
      val tmp = java.io.File.createTempFile(
        "graft_cp", ".parquet", target.getParentFile)
      tmp.delete() // ExampleParquetWriter refuses to overwrite
      val w = ExampleParquetWriter
        .builder(new org.apache.hadoop.fs.Path(tmp.getAbsolutePath))
        .withType(CpSchema).build()
      val f = new SimpleGroupFactory(CpSchema)
      try {
        val pg = f.newGroup()
        pg.addGroup("protocol")
          .append("minReaderVersion", 1).append("minWriterVersion", 2)
        w.write(pg)
        val md = mapper.readTree(snap.metaDataJson)
        val mg = f.newGroup()
        val m = mg.addGroup("metaData")
        m.append("id", md.get("id").asText)
        // name/createdTime are OPTIONAL per the protocol (Spark omits
        // name for path-based tables) — write only when present
        Option(md.get("name")).filterNot(_.isNull)
          .foreach(n => m.append("name", n.asText): Unit)
        m.addGroup("format").append("provider",
          Option(md.get("format")).flatMap(fo => Option(fo.get("provider")))
            .map(_.asText).getOrElse("parquet"))
        m.append("schemaString", md.get("schemaString").asText)
        val pcs = m.addGroup("partitionColumns")
        (0 until md.get("partitionColumns").size).foreach { i =>
          pcs.addGroup("list")
            .append("element", md.get("partitionColumns").get(i).asText): Unit
        }
        Option(md.get("createdTime")).filterNot(_.isNull)
          .foreach(c => m.append("createdTime", c.asLong): Unit)
        w.write(mg)
        snap.files.sortBy(_.path).foreach { fi =>
          val ag = f.newGroup()
          val a = ag.addGroup("add")
          a.append("path", fi.path)
          val pvs = a.addGroup("partitionValues")
          fi.partitionValues.toSeq.sortBy(_._1).foreach { case (k, vv) =>
            val kv = pvs.addGroup("key_value").append("key", k)
            // null partition value: the optional `value` field is absent
            if (vv != null) kv.append("value", vv): Unit
          }
          a.append("size", fi.size)
          a.append("modificationTime", fi.mtime)
          a.append("dataChange", true)
          a.append("stats", s"""{"numRecords":${fi.numRecords}}""")
          w.write(ag)
        }
      } finally w.close()
      // atomic publish; a racing writer of the SAME version produced
      // identical content (deterministic state + sort), so lost races
      // simply discard the tmp
      try java.nio.file.Files.move(tmp.toPath, target.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.nio.file.FileAlreadyExistsException => tmp.delete() }
    }
    // _last_checkpoint is OVERWRITTEN forward per protocol (tmp + move)
    val last = new java.io.File(s"$tableDir/_delta_log/_last_checkpoint")
    val body = s"""{"version":$v,"size":$nRows}"""
    val keep = last.exists && {
      val n = mapper.readTree(new String(
        java.nio.file.Files.readAllBytes(last.toPath), "UTF-8"))
      n.get("version").asLong > v
    }
    if (!keep) {
      val tmp = java.io.File.createTempFile("graft_lcp", ".tmp", last.getParentFile)
      java.nio.file.Files.writeString(tmp.toPath, body)
      java.nio.file.Files.move(tmp.toPath, last.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    nRows
  }

  /** The `_last_checkpoint` pointer, if a usable checkpoint exists. */
  def lastCheckpoint(tableDir: String): Option[Long] = {
    val last = new java.io.File(s"$tableDir/_delta_log/_last_checkpoint")
    if (!last.exists) None
    else {
      val v = mapper.readTree(new String(
        java.nio.file.Files.readAllBytes(last.toPath), "UTF-8"))
        .get("version").asLong
      Some(v).filter(cpPath(tableDir, _).exists)
    }
  }

  /** Replay a checkpoint file into (metaDataJson, live adds). */
  def read(tableDir: String, v: Long): (String, Seq[DeltaImport.AddFile]) = {
    val reader = org.apache.parquet.hadoop.ParquetReader
      .builder(new GroupReadSupport(),
        new org.apache.hadoop.fs.Path(cpPath(tableDir, v).getAbsolutePath))
      .build()
    var metaJson: String = null
    val adds = Seq.newBuilder[DeltaImport.AddFile]
    try {
      var g: Group = reader.read()
      while (g != null) {
        // optional-field discipline (review r13): the example-API
        // getters THROW on an absent value — probe the repetition
        // count first, because foreign writers legitimately omit
        // name/createdTime/stats/partition values
        def opt[A](grp: Group, field: String)(get: => A): Option[A] =
          if (grp.getType.containsField(field) &&
            grp.getFieldRepetitionCount(field) > 0) Some(get) else None
        if (g.getFieldRepetitionCount("metaData") > 0) {
          val m = g.getGroup("metaData", 0)
          val root = mapper.createObjectNode()
          root.put("id", m.getString("id", 0))
          opt(m, "name")(m.getString("name", 0))
            .foreach(root.put("name", _): Unit)
          root.putObject("format").put("provider",
            opt(m, "format")(m.getGroup("format", 0))
              .flatMap(fg => opt(fg, "provider")(fg.getString("provider", 0)))
              .getOrElse("parquet"))
          root.put("schemaString", m.getString("schemaString", 0))
          val pcs = root.putArray("partitionColumns")
          opt(m, "partitionColumns")(m.getGroup("partitionColumns", 0))
            .foreach { pcg =>
              (0 until pcg.getFieldRepetitionCount("list")).foreach { i =>
                pcs.add(pcg.getGroup("list", i).getString("element", 0)): Unit
              }
            }
          opt(m, "createdTime")(m.getLong("createdTime", 0))
            .foreach(root.put("createdTime", _): Unit)
          metaJson = mapper.writeValueAsString(root)
        } else if (g.getFieldRepetitionCount("add") > 0) {
          val a = g.getGroup("add", 0)
          val pvs = opt(a, "partitionValues")(a.getGroup("partitionValues", 0))
            .map { pvg =>
              (0 until pvg.getFieldRepetitionCount("key_value")).map { i =>
                val kv = pvg.getGroup("key_value", i)
                kv.getString("key", 0) ->
                  opt(kv, "value")(kv.getString("value", 0)).orNull
              }.toMap
            }.getOrElse(Map.empty[String, String])
          val nrec = opt(a, "stats")(a.getString("stats", 0))
            .map(mapper.readTree)
            .flatMap(st => Option(st.get("numRecords")).map(_.asLong))
            .getOrElse(-1L)
          adds += DeltaImport.AddFile(a.getString("path", 0), pvs, nrec,
            opt(a, "size")(a.getLong("size", 0)).getOrElse(0L),
            opt(a, "modificationTime")(a.getLong("modificationTime", 0))
              .getOrElse(0L))
        } // protocol row: nothing to carry (readLog pins its own floor)
        g = reader.read()
      }
    } finally reader.close()
    require(metaJson != null, s"checkpoint $v at $tableDir has no metaData row")
    (metaJson, adds.result())
  }
}
