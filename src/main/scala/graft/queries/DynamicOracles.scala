package graft.queries

/** Oracle SQL that can only be authored AT RUN TIME — e.g. a
  * segmentation gate whose piece table comes from an in-query
  * training step that SQL cannot replicate (EM over doubles), while
  * segmentation UNDER that fixed table is fully SQL-expressible.
  * The query registers its interpolated oracle here while it runs;
  * [[graft.Verify]] rewrites `oracle_sql.json` after the query loop
  * so the driver's DuckDB compare picks the entry up (the pre-loop
  * write keeps the abort-safety contract for everything static).
  *
  * This is a per-JVM channel, not a file: concurrent Verify/Bench
  * runs at different scales each see their own registration, so the
  * fixed-scratch-path race (CLAUDE.md) cannot arise.
  */
object DynamicOracles {

  /** Queries CONTRACTED to register a run-time oracle — the static
    * twin of the runtime registry, so a fresh JVM (CountsStamp) can
    * count them as oracle-checked without running them. ToolsSpec
    * pins that every declared name actually registers when its query
    * builds, and that nothing undeclared registers.
    */
  val declared: Set[String] =
    Set("q_unigram_lm_segment", "q_wordpiece_segment",
      "q_tokenizer_compare")

  private val reg =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def put(name: String, sql: String): Unit = reg.put(name, sql)

  def entries: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    reg.asScala.toMap
  }
}
