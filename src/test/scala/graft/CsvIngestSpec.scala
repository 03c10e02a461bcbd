package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.CsvIngest
import graft.model.SheetMatrix

class CsvIngestSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("fromString sniffs delimiter, strips blank edges, sanitizes header") {
    val payload = "\n\nCol A;Col-B;Qty!\n1;x;9\n2;\"a;b\";8\n\n"
    val df = CsvIngest.fromString(spark, payload)
    assert(df.columns.toSeq == Seq("ColA", "ColB", "Qty"))
    assert(df.count() == 2)
    val rows = df.orderBy("ColA").collect()
    assert(rows(1).getString(1) == "a;b") // quoted delimiter preserved
  }

  test("read sniffs a pipe-delimited file and keeps all columns string") {
    val f = Files.createTempFile("graft", ".csv")
    Files.writeString(f, "id|name|note\n1|alpha|x\n2|beta|y\n3|gamma|z\n")
    val df = CsvIngest.read(spark, f.toString)
    assert(df.columns.toSeq == Seq("id", "name", "note"))
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    assert(df.count() == 3)
  }

  test("headerNames uniquifies duplicates and fills empties") {
    assert(SheetMatrix.headerNames(Seq("A B", "ab", "", "x", "X")) ==
      Seq("AB", "ab_1", "_c2", "x", "X_1"))
  }

  test("toDataFrame pads ragged rows densely") {
    val df = SheetMatrix.toDataFrame(spark,
      Seq(Seq("a", "b", "c"), Seq("1"), Seq("2", "3")))
    assert(df.columns.length == 3)
    val r = df.orderBy("a").collect()
    assert(r(0).getString(1) == "" && r(0).getString(2) == "")
  }
}
