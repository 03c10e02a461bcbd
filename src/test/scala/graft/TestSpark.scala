package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for every Spark-touching suite (tests fork
  * into a single JVM; a per-suite session would pay ~10 s each).
  */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.local(4)
}
