package graft

import org.scalatest.funsuite.AnyFunSuite

class XlsxDataSourceSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("spark.read.format loads a sheet with inferred all-string schema") {
    val path = XlsxFixture.create().toString
    val df = spark.read.format("graft.sources.XlsxDataSource")
      .option("sheet", "Data").load(path)
    assert(df.columns.toSeq == Seq("Name", "Qty", "When"))
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    val rows = df.collect()
    assert(rows.length == 3)
    assert(rows.map(_.getString(2)).toSet.contains("2024-01-02"))
  }

  test("default sheet is the first; filters/projections run on top") {
    val path = XlsxFixture.create().toString
    val df = spark.read.format("graft.sources.XlsxDataSource").load(path)
    import org.apache.spark.sql.functions._
    val n = df.select(col("Name")).filter(col("Name") =!= "").count()
    assert(n == 3)
  }

  test("leapBugCompat=false shifts post-bug dates") {
    val path = XlsxFixture.create().toString
    val df = spark.read.format("graft.sources.XlsxDataSource")
      .option("sheet", "Data").option("leapBugCompat", "false").load(path)
    assert(df.collect().map(_.getString(2)).toSet.contains("2024-01-01"))
  }

  test("second sheet selectable by name") {
    val path = XlsxFixture.create().toString
    val df = spark.read.format("graft.sources.XlsxDataSource")
      .option("sheet", "Second Sheet").load(path)
    assert(df.columns.toSeq == Seq("Name", "Qty"))
    assert(df.count() == 1)
  }

  test("multi-path load survives commas in paths; the paths JSON is parsed, not split") {
    import graft.sources.XlsxDataSource
    // a path CONTAINING a comma mis-split under the old split(",")
    assert(XlsxDataSource.parsePathsJson(
      """["/data/a,b.xlsx","/data/c.xlsx"]""") ==
      Seq("/data/a,b.xlsx", "/data/c.xlsx"))
    assert(XlsxDataSource.parsePathsJson("""["/d/\"q\".xlsx"]""") ==
      Seq("/d/\"q\".xlsx"))
    // end-to-end: two real workbooks through one load
    val p1 = XlsxFixture.create().toString
    val p2 = XlsxFixture.create().toString
    val df = spark.read.format("graft.sources.XlsxDataSource")
      .option("sheet", "Data").load(p1, p2)
    assert(df.count() == 6) // 3 data rows per workbook
  }

  test("a directory path expands to its workbooks, one partition each") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx_dir")
    java.nio.file.Files.copy(XlsxFixture.create(),
      dir.resolve("a.xlsx"))
    java.nio.file.Files.copy(XlsxFixture.create(),
      dir.resolve("B.XLSX")) // case-insensitive extension
    java.nio.file.Files.writeString(dir.resolve("notes.txt"), "skip me")
    val df = spark.read.format("graft.sources.XlsxDataSource")
      .option("sheet", "Data").load(dir.toString)
    assert(df.count() == 6)
    assert(df.rdd.getNumPartitions == 2)
  }

  test("a remote-scheme path fails fast with a named local-FS error") {
    // the source is ZipFile-backed (local OS paths only): an
    // hdfs://-style directory used to fall through java.nio's
    // isDirectory to an opaque ZipException at read time
    for (p <- Seq("hdfs://nn/warehouse/books", "s3a://bucket/books")) {
      val e = intercept[IllegalArgumentException] {
        graft.sources.XlsxDataSource.expandPaths(Seq(p))
      }
      assert(e.getMessage.contains("LOCAL filesystem only"))
    }
    // plain local paths are untouched by the guard
    assert(graft.sources.XlsxDataSource.expandPaths(Seq("/tmp/x.xlsx")) ==
      Seq("/tmp/x.xlsx"))
    // file: is accepted by URI decoding — unstripped it would fall
    // through to the opaque ZipFile error; BOTH URI spellings work
    // (file:/// and File.toURI's file:/)
    assert(graft.sources.XlsxDataSource.expandPaths(
      Seq("file:///tmp/x.xlsx")) == Seq("/tmp/x.xlsx"))
    assert(graft.sources.XlsxDataSource.expandPaths(
      Seq("file:/tmp/x.xlsx")) == Seq("/tmp/x.xlsx"))
    // percent-encoded forms (what File.toURI / Path.toUri actually
    // PRODUCE for spaces and non-ASCII) decode to the literal path —
    // a byte-strip would look up 'a%20b.xlsx' and miss
    assert(graft.sources.XlsxDataSource.expandPaths(
      Seq("file:///tmp/a%20b.xlsx")) == Seq("/tmp/a b.xlsx"))
    // round-trip of what Path.toUri actually produces for a space
    // (non-ASCII is locale-dependent in this JVM's POSIX charset and
    // can't be pinned portably)
    assert(graft.sources.XlsxDataSource.expandPaths(
      Seq(java.nio.file.Paths.get("/tmp/a b.xlsx").toUri.toString)) ==
      Seq("/tmp/a b.xlsx"))
    // rejected with the NAMED error, never a fall-through:
    // remote-host file form, schemeless relative form, bad encoding
    for (bad <- Seq("file://nas01/share/x.xlsx", "file:relative.xlsx",
        "file:///tmp/bad%ZZ.xlsx")) {
      val e = intercept[IllegalArgumentException] {
        graft.sources.XlsxDataSource.expandPaths(Seq(bad))
      }
      assert(e.getMessage.contains("LOCAL filesystem only"), bad)
    }
  }

  test("a workbook missing the requested sheet fails the read, not silently zero rows") {
    val ok = XlsxFixture.create().toString
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("graft.sources.XlsxDataSource")
        .option("sheet", "Data").load(ok)
        .sparkSession.read.format("graft.sources.XlsxDataSource")
        .option("sheet", "Nope").schema("a STRING").load(ok).count()
    }
    assert(e.getMessage.contains("no sheet") ||
      Option(e.getCause).exists(_.getMessage.contains("no sheet")))
  }
}
