package org.apache.spark.sql.graftshim

import org.apache.spark.sql.SparkSession

/** Accessor for the `private[sql]` cloneSession: a per-query session
  * clone (shared catalog, temp views, and function registry, but an
  * INDEPENDENT conf) is the correct scope for query-level SETTINGS —
  * overrides live as long as the query (AQE re-reads them at runtime)
  * and never leak to concurrent queries on the shared session.
  */
object SessionClone {
  def apply(spark: SparkSession): SparkSession = spark match {
    case c: org.apache.spark.sql.classic.SparkSession => c.cloneSession()
    case other => other.newSession() // no clone available: temp views absent
  }
}
