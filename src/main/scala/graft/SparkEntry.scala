package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's declared operator inventory (one entry per
  * implemented operator family from SURVEY.md §2 plus the
  * training-data-pipeline extensions); `oracleSql` carries the DuckDB
  * replay of EVERY registered entry (since round 13 the ANN/recall
  * family replays through pinned hyperplane/centroid/signature
  * fixtures — see tools.FixtureGen — so no query is rows-only).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.defs("q05_region_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.defs ++
      TextQueries.defs ++
      DedupQueries.defs ++
      SimilarityQueries.defs ++
      EventQueries.defs ++
      ImageQueries.defs ++
      DatasetQueries.defs ++
      ScaleQueries.defs ++
      AdvancedQueries.defs ++
      GraphQueries.defs ++
      DqQueries.defs ++
      FeatureQueries.defs ++
      IoQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++
      TextQueries.oracles ++
      DedupQueries.oracles ++
      SimilarityQueries.oracles ++
      EventQueries.oracles ++
      ImageQueries.oracles ++
      DatasetQueries.oracles ++
      ScaleQueries.oracles ++
      AdvancedQueries.oracles ++
      GraphQueries.oracles ++
      DqQueries.oracles ++
      FeatureQueries.oracles ++
      IoQueries.oracles
}
