package graft.etl

import com.fasterxml.jackson.databind.ObjectMapper

/** Delta-format transaction-log export for the manifest MVCC store —
  * the lakehouse-interop seam (r12 verdict item 1): graft's CoW tables
  * (`files/<dir>/pt=<p>` data + `manifests/v<N>.txt`) become readable
  * by ANY engine that speaks the public Delta Lake protocol
  * (delta-io PROTOCOL.md: `_delta_log/%020d.json`, one JSON action
  * per line — protocol / metaData / add / remove), without moving a
  * single data byte: the export writes ONLY metadata, `add.path`s
  * reference the store's existing parquet files relative to the table
  * root.
  *
  * Mapping: manifest version v (1-based) → Delta version v-1
  * (0-based). Version 0 carries protocol + metaData + an `add` per
  * file of manifest v1; each later version carries the FILE-LEVEL
  * diff against its predecessor (adds for files that appear, removes
  * for files that disappear) — exactly the shape Delta readers replay.
  * Every `add` carries `stats` with `numRecords` from the parquet
  * footer, so metadata-only COUNT(*) short-circuits work downstream.
  *
  * Determinism & atomicity: all timestamps derive from on-disk mtimes
  * (manifest/commit files), never the clock, so a re-export produces
  * byte-identical content; each log file is published through
  * [[ManifestCommit.casFile]] (staged tmp + link(2)) and a CAS loss
  * with DIFFERENT content is a hard error — the writeManifest
  * discipline, extended to the exported log.
  *
  * 100 TB: the export cost is O(changed files) per version (manifest
  * resolution + one footer read per NEW file — reads nothing it
  * already exported); a huge history would add Delta's parquet
  * checkpoint mechanism (`_last_checkpoint`), which is an optimization
  * readers negotiate, not a correctness requirement. */
object DeltaExport {

  final case class FileInfo(path: String, pv: String, size: Long,
      mtime: Long, numRecords: Long)

  private val mapper = new ObjectMapper()

  /** Parquet footer row count without a Spark job (tiny local read —
    * same pattern as graft.Tables.footerRowCount). */
  private[graft] def footerCount(f: java.io.File): Long = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(f.getAbsolutePath),
      new org.apache.hadoop.conf.Configuration()))
    try r.getRecordCount finally r.close()
  }

  /** Resolve manifest v to its file inventory (paths relative to the
    * store base, hive-style partition values parsed from the layout).
    * `seen` caches per-file metadata across versions so unchanged
    * partitions (referenced by many manifests) pay ONE footer read for
    * the whole export, keeping cost O(changed files) per version. */
  private def resolution(base: String, partitionCol: String, v: Int,
      seen: scala.collection.mutable.Map[String, FileInfo]): Seq[FileInfo] =
    ManifestCommit.readManifest(base, v).flatMap { case (p, dir) =>
      val d = new java.io.File(s"$base/files/$dir/$partitionCol=$p")
      Option(d.listFiles).getOrElse(Array.empty[java.io.File])
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .sortBy(_.getName)
        .map { f =>
          val rel = s"files/$dir/$partitionCol=$p/${f.getName}"
          seen.getOrElseUpdate(rel, FileInfo(rel, p.toString, f.length,
            f.lastModified, footerCount(f)))
        }
    }

  private def addAction(fi: FileInfo, partitionCol: Option[String]): String = {
    val root = mapper.createObjectNode()
    val add = root.putObject("add")
    add.put("path", fi.path)
    val pvs = add.putObject("partitionValues")
    partitionCol.foreach(pc => pvs.put(pc, fi.pv): Unit)
    add.put("size", fi.size)
    add.put("modificationTime", fi.mtime)
    add.put("dataChange", true)
    // stats is a JSON STRING per the Delta protocol (not a nested
    // object) — readers json-parse it lazily
    add.put("stats", s"""{"numRecords":${fi.numRecords}}""")
    mapper.writeValueAsString(root)
  }

  private def removeAction(path: String, ts: Long): String = {
    val root = mapper.createObjectNode()
    val rm = root.putObject("remove")
    rm.put("path", path)
    rm.put("deletionTimestamp", ts)
    rm.put("dataChange", true)
    mapper.writeValueAsString(root)
  }

  /** Export (idempotently) every committed manifest version as a Delta
    * log entry; returns the number of Delta versions present after the
    * export. `schemaJson` is the table schema as Spark StructType JSON
    * — exactly Delta's `schemaString` dialect. */
  def export(base: String, partitionCol: String, schemaJson: String): Int = {
    val seen = scala.collection.mutable.Map.empty[String, FileInfo]
    exportVersions(base, Some(partitionCol), schemaJson,
      v => resolution(base, partitionCol, v, seen))
  }

  /** Export a versioned-sink store (graft.streaming.Streams
    * versionedSink — append-only `files/b<batch>` dirs, manifests of
    * plain dir rels, no partition column) as a Delta log: one Delta
    * version per stream commit, adds only (the sink never rewrites).
    * External engines can tail the stream's output table this way. */
  def exportUnpartitioned(base: String, schemaJson: String): Int = {
    val seen = scala.collection.mutable.Map.empty[String, FileInfo]
    def files(v: Int): Seq[FileInfo] = {
      val src = scala.io.Source.fromFile(
        ManifestCommit.manifestPath(base, v.toLong), "UTF-8")
      val rels = try src.getLines().toList finally src.close()
      rels.flatMap { rel =>
        val dir = new java.io.File(s"$base/$rel")
        Option(dir.listFiles).getOrElse(Array.empty[java.io.File])
          .filter(f => f.isFile && f.getName.endsWith(".parquet"))
          .sortBy(_.getName)
          .map { f =>
            val p = s"$rel/${f.getName}"
            seen.getOrElseUpdate(p,
              FileInfo(p, "", f.length, f.lastModified, footerCount(f)))
          }
      }
    }
    exportVersions(base, None, schemaJson, files)
  }

  private def exportVersions(base: String, partitionCol: Option[String],
      schemaJson: String, filesOf: Int => Seq[FileInfo]): Int = {
    val cur = ManifestCommit.currentVersion(base)
    require(cur >= 1, s"nothing to export: empty store at $base")
    val logDir = new java.io.File(s"$base/_delta_log")
    logDir.mkdirs()
    var prev = Seq.empty[FileInfo]
    (1 to cur).foreach { v =>
      val files = filesOf(v)
      val dv = v - 1
      val manifestMtime =
        new java.io.File(ManifestCommit.manifestPath(base, v.toLong)).lastModified
      val header: Seq[String] =
        if (dv == 0) {
          val proto = mapper.createObjectNode()
          proto.putObject("protocol").put("minReaderVersion", 1)
            .put("minWriterVersion", 2)
          val metaRoot = mapper.createObjectNode()
          val meta = metaRoot.putObject("metaData")
          // deterministic table id: re-exports must be byte-identical
          // for the CAS idempotency check below
          meta.put("id", java.util.UUID.nameUUIDFromBytes(
            s"graft-delta:${partitionCol.getOrElse("")}:$schemaJson"
              .getBytes("UTF-8")).toString)
          meta.put("name", "graft_export")
          val fmt = meta.putObject("format")
          fmt.put("provider", "parquet"); fmt.putObject("options")
          meta.put("schemaString", schemaJson)
          val pcArr = meta.putArray("partitionColumns")
          partitionCol.foreach(pc => pcArr.add(pc): Unit)
          meta.putObject("configuration")
          meta.put("createdTime", manifestMtime)
          Seq(mapper.writeValueAsString(proto), mapper.writeValueAsString(metaRoot))
        } else Seq.empty
      val prevPaths = prev.map(_.path).toSet
      val curPaths = files.map(_.path).toSet
      val adds = files.filterNot(f => prevPaths.contains(f.path))
        .map(addAction(_, partitionCol))
      val removes = prev.filterNot(f => curPaths.contains(f.path))
        .map(f => removeAction(f.path, manifestMtime))
      val body = (header ++ adds ++ removes).mkString("", "\n", "\n")
      val path = f"$logDir/$dv%020d.json"
      if (!ManifestCommit.casFile(path, body)) {
        val existing = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(path)), "UTF-8")
        require(existing == body,
          s"delta log $path already exported with DIFFERENT content " +
            "(concurrent exporter or mutated store)")
      }
      prev = files
    }
    cur
  }
}
