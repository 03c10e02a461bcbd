package graft

import java.nio.file.{Files, Paths}
import java.util.zip.GZIPInputStream

import scala.io.Source

import org.scalatest.funsuite.AnyFunSuite

import graft.sync.StagedCopy

/** Statement-level tests for the staged-copy bulk loader (no warehouse
  * in this environment): the staged gzip part files must exist and be
  * headerless, and the generated statements must match the reference's
  * COPY shapes (app/data.py:106-113 Redshift, :243-254 Snowflake).
  */
class StagedCopySpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def sample = {
    import spark.implicits._
    Seq(("a", "1"), ("b", ""), ("c", "3")).toDF("k", "v")
  }

  private def gunzipLines(path: String): Seq[String] = {
    val in = new GZIPInputStream(Files.newInputStream(Paths.get(path)))
    try Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  test("redshift staging writes headerless gzip parts and a prefix COPY") {
    val tmp = Files.createTempDirectory("stage-rs").toString
    val st = StagedCopy.redshift(sample, "mytable", "tenant-1", tmp,
      bucket = "my-bucket", iamRole = "arn:aws:iam::1:role/load")
    assert(st.nRecords == 3)
    assert(st.files.nonEmpty && st.files.forall(_.endsWith(".csv.gz")))
    val lines = st.files.flatMap(f => gunzipLines(s"${st.stageDir}/$f"))
    assert(lines.sorted == Seq("a,1", "b,", "c,3")) // no header, bare empty
    val copy = st.statements.head
    assert(copy.contains("COPY x_excel_tenant_1.mytable"))
    // prefix scoped by schema: tenants never share staged files
    assert(copy.contains(
      "FROM 's3://my-bucket/excel-to-database/x_excel_tenant_1/mytable/'"))
    assert(copy.contains("iam_role 'arn:aws:iam::1:role/load'"))
    assert(copy.contains("GZIP"))
    assert(copy.contains("COMPUPDATE OFF"))
    assert(copy.contains("region 'eu-central-1';"))
  }

  test("snowflake staging generates stage-recreate, REMOVE, PUTs, COPY INTO") {
    val tmp = Files.createTempDirectory("stage-sf").toString
    val st = StagedCopy.snowflake(sample, "mytable", "", tmp)
    assert(st.nRecords == 3)
    val s = st.statements
    assert(s.head == "USE SCHEMA x_excel")
    assert(s(1) == "CREATE OR REPLACE TEMPORARY STAGE mytable;")
    assert(s(2) == "REMOVE @%mytable;")
    val puts = s.filter(_.startsWith("PUT file://"))
    assert(puts.length == st.files.length)
    assert(puts.forall(_.endsWith("@%mytable OVERWRITE=TRUE")))
    val copy = s.last
    assert(copy.startsWith("COPY INTO mytable file_format = ("))
    assert(copy.contains("TYPE = CSV"))
    assert(copy.contains("FIELD_OPTIONALLY_ENCLOSED_BY = '\"'"))
  }
}
