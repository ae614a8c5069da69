package graft.etl

import java.io.FileInputStream
import java.util.{List => JList, Map => JMap}
import scala.jdk.CollectionConverters._

/** YAML pipeline config, mirroring the reference's schema exactly
  * (reference: src/config.rs:7-36): `db.{table_name,conn_str}`,
  * `s3.{bucket,download_batch_size,downloads_dir}`,
  * `parquet.desired_fields`, optional `parquet_to_db` alias map (values
  * may be null = "same name"), `work_lists.dir`. Missing required keys
  * are an error, like serde's deny-on-missing. Parsed with the
  * snakeyaml already on the Spark classpath.
  */
final case class DbConfig(tableName: String, connStr: String)
final case class S3Config(bucket: String, downloadBatchSize: Int, downloadsDir: String)
final case class ParquetConfig(desiredFields: Seq[String])
final case class WorkListsConfig(dir: String)

final case class GraftConfig(
    db: DbConfig,
    s3: S3Config,
    parquet: ParquetConfig,
    parquetToDb: Option[Map[String, Option[String]]],
    workLists: WorkListsConfig)

object GraftConfig {

  def fromYamlFile(path: String): GraftConfig = {
    val in = new FileInputStream(path)
    try fromYaml(new org.yaml.snakeyaml.Yaml().load[JMap[String, Object]](in))
    finally in.close()
  }

  def fromYamlString(yaml: String): GraftConfig =
    fromYaml(new org.yaml.snakeyaml.Yaml().load[JMap[String, Object]](yaml))

  private def section(root: JMap[String, Object], name: String): Map[String, Object] = {
    val v = root.get(name)
    require(v != null, s"missing config section '$name'")
    v.asInstanceOf[JMap[String, Object]].asScala.toMap
  }

  private def str(m: Map[String, Object], section: String, key: String): String = {
    val v = m.getOrElse(key, null)
    require(v != null, s"missing config field '$section.$key'")
    v.toString
  }

  private def fromYaml(root: JMap[String, Object]): GraftConfig = {
    require(root != null, "empty config")
    val db = section(root, "db")
    val s3 = section(root, "s3")
    val pq = section(root, "parquet")
    val wl = section(root, "work_lists")
    val fieldsRaw = pq.getOrElse("desired_fields", null)
    require(fieldsRaw != null, "missing config field 'parquet.desired_fields'")
    val fields = fieldsRaw.asInstanceOf[JList[Object]].asScala.map(_.toString).toSeq
    require(fields.nonEmpty, "'parquet.desired_fields' must be non-empty")
    val aliases = Option(root.get("parquet_to_db")).map { m =>
      m.asInstanceOf[JMap[String, Object]].asScala.toMap
        .map { case (k, v) => k -> Option(v).map(_.toString) }
    }
    GraftConfig(
      DbConfig(str(db, "db", "table_name"), str(db, "db", "conn_str")),
      S3Config(str(s3, "s3", "bucket"),
        str(s3, "s3", "download_batch_size").toInt,
        str(s3, "s3", "downloads_dir")),
      ParquetConfig(fields),
      aliases,
      WorkListsConfig(str(wl, "work_lists", "dir")))
  }
}
