package graft.tsdb

import org.apache.spark.sql.SparkSession
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** Per-database catalog over one data root — the reference's
  * `Engine2.CreateDatabase` (`engine2/engine.go:177-222`,
  * `engine2/db_options.go:4-7`): each database is a named directory
  * `<root>/<name>/` holding a `metadata` file and its own storage tree,
  * fully isolated from every other database.
  *
  * Faithful semantics: name must match `^[a-zA-Z][a-zA-Z0-9_-]{0,63}$`
  * (`engine.go:178`), `system`/`internal` are reserved (`engine.go:185`),
  * create fails on an existing database unless `ifNotExists`, and
  * metadata is written atomically (temp file + rename — the analog of
  * `SaveMetadataAtomic`). `open` hands back a cached [[TsdbEngine]]
  * rooted in the database's directory; list/drop round out the admin
  * surface. */
final class Catalog(spark: SparkSession, root: String) {

  private val NameRe = "^[a-zA-Z][a-zA-Z0-9_-]{0,63}$".r
  private val Reserved = Set("system", "internal")

  private val engines = TrieMap.empty[String, TsdbEngine]

  private def dbDir(name: String): Path = Paths.get(root, name)
  private def metaPath(name: String): Path = dbDir(name).resolve("metadata")

  private def validate(name: String): Either[String, Unit] =
    if (NameRe.findFirstIn(name).isEmpty || Reserved(name))
      Left(s"invalid database name '$name'")
    else Right(())

  def create(name: String, ifNotExists: Boolean = false,
      options: Map[String, String] = Map.empty): Either[String, Unit] =
    validate(name).flatMap { _ =>
      this.synchronized {
        if (Files.exists(metaPath(name))) {
          if (ifNotExists) Right(())
          else Left(s"database '$name' already exists")
        } else {
          Files.createDirectories(dbDir(name))
          val optJson = options.toSeq.sortBy(_._1)
            .map { case (k, v) => s""""$k":"$v"""" }.mkString(",")
          val meta = s"""{"created_at":${System.currentTimeMillis() / 1000},""" +
            s""""version":1,"last_sequence":0,"options":{$optJson}}"""
          // atomic publish: readers never observe a torn metadata file
          val tmp = dbDir(name).resolve(".metadata.tmp")
          Files.write(tmp, meta.getBytes(UTF_8))
          Files.move(tmp, metaPath(name), StandardCopyOption.ATOMIC_MOVE,
            StandardCopyOption.REPLACE_EXISTING)
          Right(())
        }
      }
    }

  /** Open (or get the cached) engine for a database; Left if absent. */
  def open(name: String): Either[String, TsdbEngine] =
    validate(name).flatMap { _ =>
      if (!Files.exists(metaPath(name))) Left(s"database '$name' does not exist")
      else Right(engines.getOrElseUpdate(name,
        new TsdbEngine(spark, dbDir(name).resolve("data").toString)))
    }

  def list(): Seq[String] =
    if (!Files.isDirectory(Paths.get(root))) Seq.empty
    else Files.list(Paths.get(root)).iterator().asScala
      .filter(p => Files.exists(p.resolve("metadata")))
      .map(_.getFileName.toString).toSeq.sorted

  def drop(name: String): Either[String, Unit] =
    validate(name).flatMap { _ =>
      this.synchronized {
        if (!Files.exists(metaPath(name))) Left(s"database '$name' does not exist")
        else {
          engines.remove(name)
          org.apache.commons.io.FileUtils.deleteDirectory(dbDir(name).toFile)
          Right(())
        }
      }
    }
}
