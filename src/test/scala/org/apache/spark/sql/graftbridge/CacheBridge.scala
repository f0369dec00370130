package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession

/** Visibility shim for the cache manager (`sharedState` is `private[sql]`):
  * lets specs assert that dedup runs leave no cached relations behind. */
object CacheBridge {
  def noCachedRelations(spark: SparkSession): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty
}
