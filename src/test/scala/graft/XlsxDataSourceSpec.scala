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
}
