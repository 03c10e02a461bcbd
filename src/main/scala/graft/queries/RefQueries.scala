package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.expr.ExcelDate
import graft.model.Identifiers

/** Declared queries for every SQL-expressible operator of the reference
  * engine (SURVEY.md §2 / §7.3), each paired with a DuckDB oracle.
  *
  * Conventions (driver compare = sorted-columns value hash):
  *  - every query ends in a *total order* `ORDER BY`, mirrored in the
  *    oracle, so row order can never cause a mismatch;
  *  - every computed column is aliased identically on both sides;
  *  - money/quantity aggregates go through DECIMAL (exact in both
  *    engines) — never float sums, whose result depends on add order.
  */
object RefQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // P2 sqlify (data.py:84-85): lowercase, collapse non-alnum runs to _.
    "q_sqlify" -> ((s, dir) =>
      t(s, dir, "part")
        .select(Identifiers.sqlifyCol(col("p_name")).as("sqlified"))
        .groupBy("sqlified").agg(count(lit(1)).as("n"))
        .orderBy("sqlified")),

    // P1 to_alnum (data.py:24-27): keep [A-Za-z0-9_], preserve case.
    "q_to_alnum" -> ((s, dir) =>
      t(s, dir, "customer")
        .select(col("c_custkey"),
          Identifiers.toAlnumCol(col("c_name")).as("alnum_name"))
        .orderBy("c_custkey")),

    // P3 quote-doubling (data.py:192).
    "q_escape" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          Identifiers.escapeQuotesCol(col("text")).as("escaped"))
        .orderBy("doc_id")),

    // P4/S8 header projection: select + rename with sanitized names
    // (data.py:121 + toDF over a dirty incoming header).
    "q_header_project" -> ((s, dir) => {
      val dirty = Seq("Nation Key!", "Nation-Name", "Region#Key")
      val clean = dirty.map(Identifiers.toAlnum) // NationKey NationName RegionKey
      t(s, dir, "nation").toDF(clean: _*).orderBy("NationKey")
    }),

    // S8/P5 empty-row trim: drop rows whose projected cells are all
    // empty/blank (xlsparser.js:189-210 semantics, set-based form).
    "q_trim_empty" -> ((s, dir) =>
      t(s, dir, "documents")
        .filter(!(trim(coalesce(col("text"), lit(""))) === "" &&
                  trim(coalesce(col("lang"), lit(""))) === "" &&
                  trim(coalesce(col("source"), lit(""))) === ""))
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy("doc_id")),

    // §2.5 record counts (data.py:122,148) across every table.
    "q_rowcount" -> ((s, dir) =>
      Tables.names.map { name =>
        t(s, dir, name).groupBy()
          .agg(count(lit(1)).as("n_records"))
          .select(lit(name).as("tbl"), col("n_records"))
      }.reduce(_ unionAll _).orderBy("tbl")),

    // D4 1000-row INSERT batching (data.py:194-200): row_number →
    // bucket (rn-1) div 1000 → per-batch stats.
    "q_batch" -> ((s, dir) => {
      val w = Window.orderBy("o_orderkey")
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .withColumn("batch_id", floor((col("rn") - 1) / 1000))
        .groupBy("batch_id")
        .agg(count(lit(1)).as("n"),
          min("o_orderkey").as("min_key"),
          max("o_orderkey").as("max_key"))
        .orderBy("batch_id")
    }),

    // Same batching semantics as q_batch, but through the scale-safe
    // per-partition-offset global index (ScaleOps.globalRowNumber —
    // the zipWithIndex shape): no single-partition window anywhere in
    // the plan (PlanSpec-pinned); same oracle as q_batch.
    "q_batch_scaled" -> ((s, dir) =>
      graft.ops.ScaleOps.globalRowNumber(
        t(s, dir, "orders").select("o_orderkey"),
        partitions = 32, col("o_orderkey"))
        .withColumn("batch_id", floor((col("rn") - 1) / 1000))
        .groupBy("batch_id")
        .agg(count(lit(1)).as("n"),
          min("o_orderkey").as("min_key"),
          max("o_orderkey").as("max_key"))
        .orderBy("batch_id")),

    // P6 list_to_matrix (data.py:18-21): reshape a flat ordered list
    // into rows of 7 columns (conditional-agg pivot).
    "q_reshape" -> ((s, dir) => {
      val w = Window.orderBy("v")
      val flat = t(s, dir, "lineitem")
        .select((col("l_orderkey") * 10 + col("l_linenumber")).as("v"))
        .withColumn("rn", row_number().over(w))
        .withColumn("row_id", floor((col("rn") - 1) / 7))
        .withColumn("colpos", (col("rn") - 1) % 7)
      val cells = (0 until 7).map(i =>
        max(when(col("colpos") === i, col("v"))).as(s"c$i"))
      flat.groupBy("row_id")
        .agg(cells.head, cells.tail: _*)
        .orderBy("row_id")
    }),

    // Same reshape semantics as q_reshape through the scale-safe
    // global index — lineitem never funnels through one task.
    "q_reshape_scaled" -> ((s, dir) => {
      val flat = t(s, dir, "lineitem")
        .select((col("l_orderkey") * 10 + col("l_linenumber")).as("v"))
      val indexed = graft.ops.ScaleOps.globalRowNumber(flat, 32, col("v"))
        .withColumn("row_id", floor((col("rn") - 1) / 7))
        .withColumn("colpos", (col("rn") - 1) % 7)
      val cells = (0 until 7).map(i =>
        max(when(col("colpos") === i, col("v"))).as(s"c$i"))
      indexed.groupBy("row_id")
        .agg(cells.head, cells.tail: _*)
        .orderBy("row_id")
    }),

    // §2.8 schema-diff set equality (data.py:120-131): case-folded,
    // sorted column-set compare → Truncate vs DropCreate, done
    // data-driven over a distinct value set.
    "q_schemadiff" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(lower(col("event_type")).as("c")).distinct()
        .agg(concat_ws(",", sort_array(collect_list("c"))).as("colset"))
        .select(col("colset"),
          when(col("colset") === "click,error,purchase,signup,view",
            "Truncated").otherwise("Dropped").as("action"))),

    // S7 Excel 1900 serial → date, both leap-bug-compatible (faithful
    // to xlsparser.js:168-183) and real-Excel-calendar variants.
    "q_serial_date" -> ((s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderkey") <= 2000)
        .select(col("o_orderkey"),
          (col("o_orderkey") % 59999 + 1).cast("int").as("serial"))
        .withColumn("excel_date",
          ExcelDate.toDateCol(col("serial"), leapBugCompat = true))
        .withColumn("excel_date_fixed",
          ExcelDate.toDateCol(col("serial"), leapBugCompat = false))
        .orderBy("o_orderkey")),

    // S4 A1 base-26 column decode (xlsparser.js:85-94): build a
    // two-letter ref from the key, decode it back with char math.
    "q_a1" -> ((s, dir) =>
      t(s, dir, "part")
        .filter(col("p_partkey") <= 2000)
        .select(col("p_partkey"),
          concat(
            expr("char(cast(65 + (p_partkey div 26) % 26 as int))"),
            expr("char(cast(65 + p_partkey % 26 as int))")).as("ref"))
        .withColumn("colnum",
          (ascii(substring(col("ref"), 1, 1)) - 64) * 26 +
            (ascii(substring(col("ref"), 2, 1)) - 64))
        .orderBy("p_partkey")),

    // S14 VBA hidden-row filter (Excel2Database.vb:46-88): visibility
    // predicate + column subset.
    "q_visible" -> ((s, dir) =>
      Tables.events(s, dir)
        .filter(col("event_type") =!= "error")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
        .orderBy("event_id")),

    // S1–S3/S5–S6/S8 end-to-end: the reference's core capability
    // (.xlsx → table, xlsparser.js:45-219) under the DuckDB gate. A
    // deterministic workbook is synthesized from the nation rows —
    // shared strings, builtin + custom date styles with serials
    // crossing the 1900-02-29 boundary (58 + 7k spans <60 and >=60), a
    // custom NON-date numFmt that must pass through raw, a gap cell the
    // dense fill must restore as '', and trailing empty rows the trim
    // must drop — then read back through the DataSourceV2 reader and
    // hash-matched against DuckDB over the same parquet rows with the
    // serial→ISO expression inlined. nation is a bounded dim table
    // (25 rows at every SF): the driver-side materialization here is
    // the xlsx path's documented envelope, not a data-path collect.
    "q_xlsx" -> ((s, dir) => {
      import graft.ingest.XlsxWriter
      import graft.ingest.XlsxWriter._
      val nation = t(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .collect().sortBy(_.getInt(0))
      val header: Seq[Cell] =
        Seq(Str("nkey"), Str("name"), Str("region_key"),
          Str("asof"), Str("asof_custom"))
      val body = nation.toSeq.map { r =>
        val k = r.getInt(0)
        Seq[Cell](
          Num(k.toString),
          Str(r.getString(1)),
          if (k == 13) Blank else StyledNum(r.getInt(2).toString),
          DateSerial(58 + k * 7),
          DateSerial(45000 + k, builtin = false))
      }
      // per-process scratch path: a FIXED name raced when two
      // Verify/Bench runs shared a machine (one process reads the
      // other's half-written zip — the Tables.scratchDir rule)
      val path = java.nio.file.Files.createDirectories(
        graft.Tables.scratchDir(s, "graft_q_xlsx"))
        .resolve("q_xlsx.xlsx")
      XlsxWriter.write(path, "Data", header +: body, trailingEmptyRows = 3)
      s.read.format("graft.sources.XlsxDataSource")
        .option("sheet", "Data").load(path.toString)
        .orderBy(col("nkey").cast("int"))
    }),

    // §3.1 upload lifecycle END-TO-END: deterministic one-sheet
    // workbooks (XlsxWriter) → parse (XlsxIngest) → sqlify the sheet
    // name (data.py:84-85) → sync decision against a simulated
    // warehouse catalog (SyncAction.decide, data.py:120-131) → local
    // sink (LocalDestination.write, data.py:137-153) → the reference's
    // exact report strings. The oracle rebuilds the same strings in
    // SQL with counts taken from the source tables, so table naming,
    // the truncate/drop/create decision AND the header-exclusive
    // record count (reference bug B4 fixed) are all hash-gated.
    "q_upload_report" -> ((s, dir) => {
      import graft.ingest.XlsxWriter
      import graft.ingest.XlsxWriter._
      import graft.sync.{LoadReport, LocalDestination, SyncAction}
      // FIXED base dir: the report string embeds the target path, and
      // the oracle SQL interpolates the same constant. The workbook
      // SOURCE paths never reach the oracle, so they are per-process
      // scratch (fixed names raced concurrent Verify/Bench runs)
      val baseDir = "/tmp/graft_upload_gate"
      val wbDir = java.nio.file.Files.createDirectories(
        graft.Tables.scratchDir(s, "graft_upload_wb"))
      val nation = t(s, dir, "nation").select("n_nationkey", "n_name")
        .collect().sortBy(_.getInt(0)) // 25 rows — workbook synthesis is driver-sized
      val wb1 = wbDir.resolve("graft_upload_nation.xlsx")
      XlsxWriter.write(wb1, "Nation Data",
        Seq[Seq[Cell]](Seq(Str("nkey"), Str("name"))) ++
          nation.toSeq.map(r =>
            Seq[Cell](Num(r.getInt(0).toString), Str(r.getString(1)))))
      val region = t(s, dir, "region").select("r_regionkey", "r_name")
        .collect().sortBy(_.getInt(0))
      val wb2 = wbDir.resolve("graft_upload_region.xlsx")
      XlsxWriter.write(wb2, "Region-List!",
        Seq[Seq[Cell]](Seq(Str("rkey"), Str("rname"))) ++
          region.toSeq.map(r =>
            Seq[Cell](Num(r.getInt(0).toString), Str(r.getString(1)))))
      val wb3 = wbDir.resolve("graft_upload_empty.xlsx")
      XlsxWriter.write(wb3, "Empty Sheet",
        Seq[Seq[Cell]](Seq(Str("a"), Str("b"))))
      val catalog = Map(
        // same column SET, case/order differ → TRUNCATE
        "nation_data" -> Seq("NAME", "nkey"),
        // an obsolete third column → DROP + CREATE
        "region_list_" -> Seq("rkey", "rname", "obsolete_col"))
      val rows = Seq(wb1, wb2, wb3).flatMap { p =>
        graft.ingest.XlsxIngest.readWorkbook(s, p.toString).map {
          case (sheetName, df) =>
            val table = graft.model.Identifiers.sqlify(sheetName)
            val action = catalog.get(table)
              .map(SyncAction.decide(_, df.columns.toSeq))
            val written = LocalDestination.write(df, table, "", baseDir)
            (table,
              LoadReport(action, written.target, written.nRecords).render)
        }
      }
      import s.implicits._
      rows.toDF("table_name", "report").orderBy("table_name")
    }),

    // S10 delimiter sniffing (csv_sniff.py:5-22) — not SQL-expressible,
    // declared without an oracle (rows-only check). Distributed form:
    // sniff a corpus of small CSV payloads per-row.
    "q_sniff" -> ((s, dir) => {
      import s.implicits._
      val samples = Seq(
        (0L, "c1|c2|c3\na ;b ;c;|d|e\n"), // reference assert #1 → '|'
        (1L, "c1c2|c3\na b c|d|e\n"), // reference assert #2 → ','
        (2L, "a\tb\tc\n1\t2\t3\n"),
        (3L, "x;y\n1;2\n"),
        (4L, "k,v\n1,2\n"))
      samples.toDF("sample_id", "payload")
        .as[(Long, String)]
        .map { case (id, text) =>
          val d = graft.ingest.Sniffer.sniffDelimiter(text)
          val cols = graft.ingest.Sniffer.parse(text, d).head.length
          (id, d.toString, cols)
        }
        .toDF("sample_id", "delimiter", "n_cols")
        .orderBy("sample_id")
    }),

    // D3–D5 warehouse sink, driver-gated end-to-end: nation flows
    // through the REAL JdbcDestination writer (plan → all-text DDL via
    // createTableColumnTypes → batched insert) into embedded Derby
    // (in /opt/spark/jars — the one warehouse reachable offline), is
    // read back over spark.read.jdbc, and must hash-match the parquet
    // original. This is the q_orc_roundtrip pattern for the JDBC
    // destination: the sink's value fidelity becomes a CORRECTNESS
    // row instead of spec-only evidence. The all-text contract is the
    // reference's (generate_table_stmt, app/data.py:57-62): values
    // go to the warehouse as text and are re-typed on the way out.
    "q_jdbc_roundtrip" -> ((s, dir) => {
      import graft.sync.JdbcDestination
      val url = "jdbc:derby:memory:graftgate;create=true"
      val derby = JdbcDestination.Dialect("derby", "VARCHAR(255)")
      val src = t(s, dir, "nation").select(
        col("n_nationkey").cast("string").as("n_nationkey"),
        col("n_name"),
        col("n_regionkey").cast("string").as("n_regionkey"))
      val p = JdbcDestination.plan("Nation RT", src.columns.toSeq,
        existingCols = Nil, derby)
      // bare table name: Derby's JDBC writer cannot auto-create the
      // x_excel schema (same bound as JdbcIntegrationSpec)
      JdbcDestination.write(src, url, p.copy(table = "nation_rt"))
      s.read.format("jdbc")
        .option("url", url).option("dbtable", "nation_rt").load()
        .select(col("n_nationkey").cast("long").as("n_nationkey"),
          col("n_name"),
          col("n_regionkey").cast("long").as("n_regionkey"))
        .orderBy("n_nationkey")
    }))

  // Shared by the reference-faithful form and its scale twin: both
  // must produce exactly these results, so each pair has one oracle.
  private val batchOracle =
    """WITH r AS (SELECT o_orderkey,
                    row_number() OVER (ORDER BY o_orderkey) AS rn FROM orders)
         SELECT CAST(floor((rn - 1) / 1000) AS BIGINT) AS batch_id,
                count(*) AS n, min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
         FROM r GROUP BY 1 ORDER BY batch_id"""

  private val reshapeOracle =
    """WITH flat AS (
           SELECT l_orderkey * 10 + l_linenumber AS v FROM lineitem),
         r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM flat)
         SELECT CAST(floor((rn - 1) / 7) AS BIGINT) AS row_id,
                max(CASE WHEN (rn - 1) % 7 = 0 THEN v END) AS c0,
                max(CASE WHEN (rn - 1) % 7 = 1 THEN v END) AS c1,
                max(CASE WHEN (rn - 1) % 7 = 2 THEN v END) AS c2,
                max(CASE WHEN (rn - 1) % 7 = 3 THEN v END) AS c3,
                max(CASE WHEN (rn - 1) % 7 = 4 THEN v END) AS c4,
                max(CASE WHEN (rn - 1) % 7 = 5 THEN v END) AS c5,
                max(CASE WHEN (rn - 1) % 7 = 6 THEN v END) AS c6
         FROM r GROUP BY 1 ORDER BY row_id"""

  val oracles: Map[String, String] = Map(
    "q_sqlify" ->
      """SELECT regexp_replace(lower(p_name), '[^a-zA-Z0-9]+', '_', 'g') AS sqlified,
         count(*) AS n FROM part GROUP BY 1 ORDER BY sqlified""",
    "q_to_alnum" ->
      """SELECT c_custkey, regexp_replace(c_name, '[^a-zA-Z0-9_]', '', 'g') AS alnum_name
         FROM customer ORDER BY c_custkey""",
    "q_escape" ->
      """SELECT doc_id, replace(text, '''', '''''') AS escaped
         FROM documents ORDER BY doc_id""",
    "q_header_project" ->
      """SELECT n_nationkey AS "NationKey", n_name AS "NationName",
         n_regionkey AS "RegionKey" FROM nation ORDER BY 1""",
    "q_trim_empty" ->
      """SELECT doc_id, lang, source FROM documents
         WHERE NOT (trim(coalesce(text,'')) = '' AND trim(coalesce(lang,'')) = ''
                AND trim(coalesce(source,'')) = '')
         ORDER BY doc_id""",
    "q_rowcount" ->
      """SELECT 'region' AS tbl, count(*) AS n_records FROM region
         UNION ALL SELECT 'nation', count(*) FROM nation
         UNION ALL SELECT 'customer', count(*) FROM customer
         UNION ALL SELECT 'supplier', count(*) FROM supplier
         UNION ALL SELECT 'part', count(*) FROM part
         UNION ALL SELECT 'orders', count(*) FROM orders
         UNION ALL SELECT 'lineitem', count(*) FROM lineitem
         UNION ALL SELECT 'events', count(*) FROM events
         UNION ALL SELECT 'documents', count(*) FROM documents
         UNION ALL SELECT 'embeddings', count(*) FROM embeddings
         ORDER BY tbl""",
    "q_batch" -> batchOracle,
    "q_batch_scaled" -> batchOracle,
    "q_reshape" -> reshapeOracle,
    "q_reshape_scaled" -> reshapeOracle,
    "q_schemadiff" ->
      """SELECT colset,
                CASE WHEN colset = 'click,error,purchase,signup,view'
                     THEN 'Truncated' ELSE 'Dropped' END AS action
         FROM (SELECT string_agg(c, ',' ORDER BY c) AS colset
               FROM (SELECT DISTINCT lower(event_type) AS c FROM events))""",
    "q_serial_date" ->
      """SELECT o_orderkey,
                CAST(o_orderkey % 59999 + 1 AS INTEGER) AS serial,
                DATE '1899-12-31' + CAST(o_orderkey % 59999 + 1 AS INTEGER) AS excel_date,
                CASE WHEN o_orderkey % 59999 + 1 < 60
                     THEN DATE '1899-12-31' + CAST(o_orderkey % 59999 + 1 AS INTEGER)
                     ELSE DATE '1899-12-30' + CAST(o_orderkey % 59999 + 1 AS INTEGER)
                END AS excel_date_fixed
         FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey""",
    "q_a1" ->
      """SELECT p_partkey,
                chr(65 + CAST((p_partkey // 26) % 26 AS INTEGER))
                  || chr(65 + CAST(p_partkey % 26 AS INTEGER)) AS ref,
                (ascii(substr(chr(65 + CAST((p_partkey // 26) % 26 AS INTEGER))
                  || chr(65 + CAST(p_partkey % 26 AS INTEGER)), 1, 1)) - 64) * 26
                + (ascii(substr(chr(65 + CAST((p_partkey // 26) % 26 AS INTEGER))
                  || chr(65 + CAST(p_partkey % 26 AS INTEGER)), 2, 1)) - 64) AS colnum
         FROM part WHERE p_partkey <= 2000 ORDER BY p_partkey""",
    "q_visible" ->
      """SELECT event_id, user_id, event_type, value FROM events
         WHERE event_type <> 'error' ORDER BY event_id""",
    // Mirrors the synthesized workbook cell-for-cell: all-string output
    // (the reference's data model), gap cell at n_nationkey = 13, and
    // the leap-bug-compatible serial conversion (1899-12-31 + serial)
    // for both the builtin-style and custom-style date columns.
    "q_xlsx" ->
      """SELECT CAST(n_nationkey AS VARCHAR) AS nkey,
                n_name AS name,
                CASE WHEN n_nationkey = 13 THEN ''
                     ELSE CAST(n_regionkey AS VARCHAR) END AS region_key,
                CAST(DATE '1899-12-31'
                     + CAST(58 + n_nationkey * 7 AS INTEGER) AS VARCHAR) AS asof,
                CAST(DATE '1899-12-31'
                     + CAST(45000 + n_nationkey AS INTEGER) AS VARCHAR) AS asof_custom
         FROM nation ORDER BY n_nationkey""",
    // The reference's report strings rebuilt literally: action past
    // tense + target path + header-exclusive count per table.
    "q_upload_report" -> {
      val b = "/tmp/graft_upload_gate"
      s"""SELECT * FROM (
           SELECT 'nation_data' AS table_name,
             'Truncated and loaded into $b/nation_data.csv.' || chr(10) ||
               CAST((SELECT count(*) FROM nation) AS VARCHAR) ||
               ' records loaded successfully.' || chr(10) AS report
           UNION ALL
           SELECT 'region_list_',
             'Dropped and loaded into $b/region_list_.csv.' || chr(10) ||
               CAST((SELECT count(*) FROM region) AS VARCHAR) ||
               ' records loaded successfully.' || chr(10)
           UNION ALL
           SELECT 'empty_sheet',
             'Created $b/empty_sheet.csv.' || chr(10) ||
               '0 records loaded successfully.' || chr(10)) AS u
         ORDER BY table_name"""
    },
    // The JDBC roundtrip must return EXACTLY the parquet original:
    // text-in, re-typed-out through the warehouse loses nothing.
    "q_jdbc_roundtrip" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
                CAST(n_regionkey AS BIGINT) AS n_regionkey
         FROM nation ORDER BY n_nationkey"""
    // q_sniff: intentionally no oracle (non-SQL-expressible; rows-only).
  )
}
