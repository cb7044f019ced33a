package org.apache.spark.sql.graftshim

import org.apache.spark.sql.SparkSession

/** Bridge to the classic session's `private[sql]` sessionUUID — unique for
  * the session's lifetime and never reused after GC, unlike an identity
  * hash (the failure mode it replaces in cache keys). Lives under
  * `org.apache.spark.sql` purely for access; contains no Spark code. */
object SessionBridge {
  def sessionUUID(s: SparkSession): String = s match {
    case c: org.apache.spark.sql.classic.SparkSession => c.sessionUUID
    case other => String.valueOf(System.identityHashCode(other))
  }
}
