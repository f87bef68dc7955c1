package org.apache.spark.sql

/** Test-only access to the session's CacheManager (private[sql]): lets the
  * cache-lifecycle spec assert mechanically that the persist-managing
  * operators (LSH pairs, cluster labels, token-shard assignment, the
  * curation pipeline) leave no cache entries behind.
  */
object GraftSqlTestBridge {
  def cacheIsEmpty(spark: SparkSession): Boolean =
    spark.sharedState.cacheManager.isEmpty
}
