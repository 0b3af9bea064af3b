package graft.dataset

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A3/A4 `DatasetBenchmarker` (dataset_benchmarker.py:73-121):
  * per-category model-accuracy rollup.
  *
  * Input: one row per image with a category column and the per-image
  * counts `n_true`, `n_pred`, `correct_detections`, plus pixel-level
  * `inter`/`union` counts for jaccard. Output: per category AND the
  * reference's `'all'` pseudo-category — which is exactly the grand-
  * total row of a ROLLUP (SURVEY.md §2.4 A4).
  *
  * recall = correct/n_true, precision = correct/n_pred,
  * f1 = harmonic mean, jaccard = sum(inter)/sum(union).
  */
object Benchmarker {

  def benchmark(perImage: DataFrame, categoryCol: String): DataFrame = {
    val g = perImage
      .rollup(col(categoryCol))
      .agg(
        sum("n_true").as("n_true"),
        sum("n_pred").as("n_pred"),
        sum("correct_detections").as("correct"),
        sum("inter").as("inter"),
        sum("union").as("union"),
        count(lit(1)).as("n_images"))
      .select(
        coalesce(col(categoryCol), lit("all")).as(categoryCol),
        col("n_true"), col("n_pred"), col("correct"),
        col("inter"), col("union"), col("n_images"))
    g.withColumn("recall", col("correct").cast("double") / col("n_true"))
      .withColumn("precision", col("correct").cast("double") / col("n_pred"))
      .withColumn("f1",
        when(col("recall") + col("precision") > 0,
          lit(2) * col("recall") * col("precision") / (col("recall") + col("precision")))
          .otherwise(lit(0.0)))
      .withColumn("jaccard", col("inter").cast("double") / col("union"))
      .orderBy(categoryCol)
  }
}
