package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Legacy DB-table import (SURVEY.md §2.1 S4; ref
  * `bin/stats/import_access_table:101-193,243-359`): the reference
  * pages through the `access` table with LIMIT/OFFSET at 100k rows and
  * manual 10M-id tranches for parallelism. On Spark both collapse into
  * a single partitioned JDBC read: `numPartitions` concurrent
  * range-predicated SELECTs on the id column — restartable, parallel,
  * no OFFSET scans.
  *
  * Tested end-to-end against embedded Derby (JdbcImportSpec): rows
  * outside the declared bounds still arrive exactly once (bounds
  * stride, not filter) and engine predicates push down into the
  * JDBC source's WHERE clause. The paging/tranche machinery of the
  * reference is exactly what `partitionColumn` replaces. */
object JdbcImport {

  def readAccessTable(spark: SparkSession, url: String, table: String,
      idColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int = 32,
      props: java.util.Properties = new java.util.Properties): DataFrame =
    spark.read.jdbc(url, table, idColumn, lowerBound, upperBound,
      numPartitions, props)
}
