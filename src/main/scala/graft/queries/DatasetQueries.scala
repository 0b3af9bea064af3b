package graft.queries

import graft.core.ImagePlane
import graft.dataset.{Balancer, DatasetBuilder, Splitter}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q._

/** Dataset-assembly operator queries (R2/R3/R5/R6/R7 + A2). Seeded
  * random splits cannot be replayed by DuckDB (different RNG), so
  * these are rows-only; the determinism contracts are asserted in
  * SplitterSpec/DatasetBuilderSpec, and each result row carries its
  * own invariant verdict.
  */
object DatasetQueries {

  /** R2 on real data: split the orders table, report exact counts. */
  private def qDsSplitContract(s: SparkSession, dir: String): DataFrame =
    Splitter.trainValTestSplit(t(s, dir, "orders"), (0.8, 0.1, 0.1), seed = 42)
      .groupBy("split")
      .agg(count(lit(1)).as("n"))
      .orderBy("split")

  /** R3: nested prefix splits of customer; each row checks the subset
    * property against the next larger split — expressed as a
    * left-anti-join count (rows of the smaller split absent from the
    * larger one), so nothing is collected to the driver and the check
    * runs at any split size.
    */
  private def qDsNestedPrefix(s: SparkSession, dir: String): DataFrame = {
    val df = t(s, dir, "customer").select("c_custkey")
    val splits = Splitter.nestedSplit(df, splitCounts = Seq(10, 100, 500), seed = 42)
    Seq(("10", "100"), ("100", "500")).map { case (k1, k2) =>
      val smaller = splits(k1)
      val larger = splits(k2)
      val violations = smaller
        .join(larger, smaller("c_custkey") === larger("c_custkey"), "left_anti")
      smaller.agg(count(lit(1)).as("n"))
        .crossJoin(violations.agg(count(lit(1)).as("n_violations")))
        .select(lit(k1).as("split"), col("n"),
          (col("n_violations") === 0).as("is_prefix_of_next"))
    }.reduce(_ unionByName _).orderBy("split")
  }

  /** R5 on real data: balance customers by segment; every category
    * must land exactly on the max count.
    */
  private def qDsBalance(s: SparkSession, dir: String): DataFrame =
    Balancer.balance(t(s, dir, "customer"), "c_mktsegment", seed = 42)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), countDistinct("c_custkey").as("n_distinct"))
      .orderBy("c_mktsegment")

  /** R7 flagship: the full build_dataset pipeline on a synthetic
    * 3-experiment fixture -> per-tissue summary + split census.
    */
  private def qDsBuild(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val planes = (for {
      e <- 1 to 3
      i <- 0 until 10
    } yield {
      val p = ImagePlane.gridLabels(ImagePlane.blankPlanes(1, 1, 20, 20).head, 5)
      (s"exp$e", s"fov_e${e}_i$i", p.stack, p.crop, p.slice,
        p.nRows, p.nCols, p.channels, p.pixels, p.labels)
    }).toDF("experiment", "fov", "stack", "crop", "slice",
      "nRows", "nCols", "channels", "pixels", "labels")
    val meta = Seq(
      ("exp1", "breast", "mibi"), ("exp2", "breast", "vectra"),
      ("exp3", "lung", "mibi")).toDF("experiment", "tissue", "platform")
    val built = DatasetBuilder.buildDataset(s, planes, meta,
      outRows = 10, outCols = 10, balance = true, seed = 42)
    built.toDF()
      .groupBy("tissue", "split")
      .agg(count(lit(1)).as("n_images"),
        sum(graft.functions.LabelExprs.distinctNonzeroCount(col("labels"))).as("n_cells"))
      .orderBy("tissue", "split")
  }

  val defs: Map[String, QueryFn] = Map(
    "q_ds_split_contract" -> qDsSplitContract _,
    "q_ds_nested_prefix" -> qDsNestedPrefix _,
    "q_ds_balance" -> qDsBalance _,
    "q_ds_build" -> qDsBuild _,
  )

  val oracles: Map[String, String] = Map.empty
}
