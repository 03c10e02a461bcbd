package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftshim.Bridge

/** As-of join as a first-class operator: for every left row, the
  * latest right row of the same key with `rightTime <= leftTime`.
  *
  * Spark has no native as-of join; the composable workaround (tagged
  * union + keyed window + last(ignoreNulls)) is correct but buffers
  * and window-sorts *both* inputs per key. This operator is the
  * (c)-tier build from the preference ladder — custom `LogicalPlan` +
  * `Strategy` + `BinaryExecNode` — and executes as a single O(n+m)
  * forward merge per co-partition: EnsureRequirements gives both
  * children hash distribution on the key and (key, time) ordering, so
  * the probe never buffers more than one candidate row.
  *
  * Equal timestamps match (`<=`), like DuckDB's ASOF JOIN and the
  * declared `q_asof_join` semantics. Key/time types must be atomic
  * with `Comparable` runtime values (int/long/string/timestamp/date —
  * enforced at planning).
  */
object AsOfJoin {

  final case class AsOfJoinNode(
      left: LogicalPlan,
      right: LogicalPlan,
      leftKey: Expression,
      rightKey: Expression,
      leftTime: Expression,
      rightTime: Expression,
      isLeftOuter: Boolean) extends BinaryNode {
    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
      copy(left = newLeft, right = newRight)
  }

  object AsOfStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinNode(l, r, lk, rk, lt, rt, outer) =>
        AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, outer) :: Nil
      case _ => Nil
    }
  }

  final case class AsOfJoinExec(
      left: SparkPlan,
      right: SparkPlan,
      leftKey: Expression,
      rightKey: Expression,
      leftTime: Expression,
      rightTime: Expression,
      isLeftOuter: Boolean) extends BinaryExecNode {

    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))

    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(Seq(leftKey)) ::
        ClusteredDistribution(Seq(rightKey)) :: Nil

    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
        SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending)),
      Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
        SortOrder(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending)))

    override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

    // the output is row-for-row the left stream (plus appended right
    // columns), so the left child's key-clustering survives — without
    // this override the exec reports UnknownPartitioning and any
    // downstream groupBy/join on the same key pays a spurious full
    // exchange (the SortMergeJoin propagation pattern)
    override def outputPartitioning
        : org.apache.spark.sql.catalyst.plans.physical.Partitioning =
      left.outputPartitioning

    override protected def doExecute(): RDD[InternalRow] = {
      val lk = BindReferences.bindReference(leftKey, left.output)
      val lt = BindReferences.bindReference(leftTime, left.output)
      val rk = BindReferences.bindReference(rightKey, right.output)
      val rt = BindReferences.bindReference(rightTime, right.output)
      val rightLen = right.output.length
      val outputAttrs = output
      val leftOutput = left.output
      val rightOutput = right.output
      val outer = isLeftOuter

      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        // bind against the OUTPUT attrs (right side nullable): binding
        // the original non-nullable right attrs would make codegen skip
        // null checks and turn outer-join nulls into 0/false/NPE
        val proj = UnsafeProjection.create(outputAttrs, outputAttrs)
        val joined = new JoinedRow
        val nullRight = new GenericInternalRow(rightLen)

        @inline def cmp(a: Any, b: Any): Int =
          a.asInstanceOf[Comparable[Any]].compareTo(b)

        var rHead: InternalRow = null // lookahead (not yet consumed)
        var candidate: InternalRow = null // latest right row for candKey
        var candKey: Any = null
        var candTime: Any = null

        def advanceRightTo(k: Any, t: Any): Unit = {
          var done = false
          while (!done) {
            if (rHead == null) {
              if (rIter.hasNext) rHead = rIter.next() else done = true
            }
            if (rHead != null) {
              val hk = rk.eval(rHead)
              val ht = rt.eval(rHead)
              if (hk == null || ht == null) { rHead = null } // unusable
              else {
                val c = cmp(hk, k)
                if (c < 0 || (c == 0 && cmp(ht, t) <= 0)) {
                  candidate = rHead.copy(); candKey = hk; candTime = ht
                  rHead = null
                } else done = true
              }
            }
          }
        }

        new Iterator[InternalRow] {
          private var nextRow: InternalRow = _

          private def computeNext(): Unit = {
            nextRow = null
            while (nextRow == null && lIter.hasNext) {
              val l = lIter.next()
              val k = lk.eval(l)
              val t = lt.eval(l)
              if (k == null || t == null) {
                if (outer) nextRow = proj(joined(l, nullRight))
              } else {
                advanceRightTo(k, t)
                val matched =
                  candidate != null && cmp(candKey, k) == 0 &&
                    cmp(candTime, t) <= 0
                if (matched) nextRow = proj(joined(l, candidate))
                else if (outer) nextRow = proj(joined(l, nullRight))
              }
            }
          }

          override def hasNext: Boolean = {
            if (nextRow == null) computeNext()
            nextRow != null
          }
          override def next(): InternalRow = {
            if (!hasNext) throw new NoSuchElementException
            val r = nextRow; nextRow = null; r
          }
        }
      }
    }

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
      copy(left = newLeft, right = newRight)
  }

  /** Register the strategy once per session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val strategies = spark.experimental.extraStrategies
    if (!strategies.exists(_.isInstanceOf[AsOfStrategy.type]))
      spark.experimental.extraStrategies = strategies :+ AsOfStrategy
  }

  /** `asof(left, right, key, time)`: latest right row per left row with
    * rightTime <= leftTime on the same key. Right columns must not
    * collide with left ones (alias before joining).
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left_outer",
      s"unsupported asof join type: $joinType")
    val lkE = Bridge.expression(leftKey)
    val rkE = Bridge.expression(rightKey)
    val ltE = Bridge.expression(leftTime)
    val rtE = Bridge.expression(rightTime)
    require(lkE.dataType == rkE.dataType,
      s"asof key types differ: ${lkE.dataType} vs ${rkE.dataType}")
    require(ltE.dataType == rtE.dataType,
      s"asof time types differ: ${ltE.dataType} vs ${rtE.dataType}")
    locally {
      import org.apache.spark.sql.types._
      val ordered: Set[DataType] = Set(ByteType, ShortType, IntegerType,
        LongType, FloatType, DoubleType, StringType, TimestampType,
        TimestampNTZType, DateType, BooleanType)
      // the KEY additionally excludes float types: equality goes
      // through compareTo AND the hash exchange, and -0.0 vs 0.0
      // differ under both (Double.compare and Murmur3 of the raw
      // bits) while SQL `=` treats them equal — a float key would
      // silently miss matches. Float TIME is fine: the as-of
      // inequality only needs a total order, which compareTo is.
      val keyOrdered = ordered -- Set[DataType](FloatType, DoubleType)
      require(keyOrdered.contains(lkE.dataType),
        s"asof join key needs a non-float atomic ordered type, got " +
          s"${lkE.dataType} (float equality diverges from SQL = on " +
          "signed zeros; cast or bucket the key)")
      require(ordered.contains(ltE.dataType),
        s"asof join needs an atomic ordered time type, got ${ltE.dataType}")
    }
    val spark = left.sparkSession
    register(spark)
    val node = AsOfJoinNode(
      Bridge.logicalPlan(left), Bridge.logicalPlan(right),
      lkE, rkE, ltE, rtE,
      isLeftOuter = joinType == "left_outer")
    Bridge.ofRows(spark, node)
  }
}
