package graft.sync

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame

/** `destination_local` (`app/data.py:137-153`): resolve `path` under a
  * base directory (absolute paths respected), mkdir -p, write
  * `<table>.csv` with header, report the record count (header-exclusive
  * — reference bug B4 fixed at the source).
  *
  * The write itself is a distributed Spark CSV write into a temp dir;
  * the single part file is then renamed to the reference's exact
  * `<table>.csv` layout. `coalesce(1)` matches the reference's
  * one-file-per-table contract — callers loading big data should use
  * [[writeDir]] instead, which keeps full write parallelism.
  */
object LocalDestination {

  def resolve(baseDir: String, path: String): Path =
    if (path.nonEmpty && path.startsWith("/")) Paths.get(path)
    else if (path.nonEmpty) Paths.get(baseDir, path)
    else Paths.get(baseDir)

  /** Faithful single-file variant. Returns the reference-format report. */
  def write(df: DataFrame, tableName: String, path: String,
      baseDir: String): LoadReport = {
    val dir = resolve(baseDir, path)
    Files.createDirectories(dir)
    val target = dir.resolve(s"$tableName.csv")
    val tmp = Files.createTempDirectory(dir, s".$tableName-load")
    val n = df.count()
    df.coalesce(1).write.mode("overwrite")
      .option("header", "true")
      // Python csv.writer emits empty cells bare, not quoted ""
      .option("emptyValue", "").csv(tmp.toString)
    val part = Files.list(tmp).iterator().asScala
      .find(_.getFileName.toString.startsWith("part-"))
      .getOrElse(throw new IllegalStateException("no part file written"))
    Files.move(part, target, StandardCopyOption.REPLACE_EXISTING)
    Files.list(tmp).iterator().asScala.foreach(Files.deleteIfExists(_))
    Files.deleteIfExists(tmp)
    LoadReport(None, target.toString, n)
  }

  /** Scale variant: parallel multi-part CSV directory per table. */
  def writeDir(df: DataFrame, tableName: String, path: String,
      baseDir: String, compress: Boolean = false): LoadReport = {
    val dir = resolve(baseDir, path).resolve(tableName)
    val w = df.write.mode("overwrite").option("header", "true")
    (if (compress) w.option("compression", "gzip") else w).csv(dir.toString)
    LoadReport(None, dir.toString, df.count())
  }
}
