package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Supervised feature-encoding operators for the training-pipeline
  * surface — the tabular-feature step between raw columns and a model.
  */
object Encoding {

  /** Out-of-fold target encoding of a categorical column — the leakage-
    * safe mean-target featurizer: a row in fold f gets its category's
    * target mean computed from the OTHER folds
    * (`(S_cat − S_cat,f)/(n_cat − n_cat,f)`), so a row never sees its
    * own label — the textbook guard against the target-leak that makes
    * naive mean encoding look great in training and collapse in
    * production. Folds assign by a counter-based affine hash of the row
    * id (the q275 convention — partition-independent, reproducible).
    *
    * Output is the ENCODING GRID `(category, fold, n_in_fold, enc_e6)`,
    * not the encoded rows: the grid is what a pipeline persists and
    * broadcast-joins onto any table (train now, serve later) — emitting
    * rows would weld the featurizer to one consumer. Categories living
    * entirely inside one fold emit null `enc_e6` for that fold (no
    * out-of-fold evidence — the honest answer; callers back off to the
    * global prior).
    *
    * Exactness: per-(category, fold) sums are exact integers; the
    * encoding is an exact DECIMAL-widened integer `div`. Scale shape:
    * ONE map-side-combined aggregate to the (category, fold) grid; the
    * per-category totals re-aggregate the grid. */
  def targetEncode(df: DataFrame, catCol: String, idCol: String,
                   targetCol: String, folds: Int = 5): DataFrame = {
    require(folds >= 2 && folds <= 100, s"folds must be in [2, 100], got $folds")
    val cells = df
      .filter(col(catCol).isNotNull && col(idCol).isNotNull &&
        col(targetCol).isNotNull)
      .select(col(catCol).as("category"),
        expr(s"pmod(pmod(cast(`$idCol` as bigint), 1000003) * 1103515245 + 12345, " +
          s"2147483647) % $folds").as("fold"),
        col(targetCol).cast("long").as("__t"))
      .groupBy(col("category"), col("fold"))
      .agg(count(lit(1)).as("n_in_fold"), sum(col("__t")).as("__s"))
    val totals = cells.groupBy(col("category"))
      .agg(sum(col("n_in_fold")).as("__nc"), sum(col("__s")).as("__sc"))
    cells.join(totals, "category")
      .withColumn("enc_e6", expr(
        """case when __nc - n_in_fold > 0 then
          |  cast(cast(__sc - __s as decimal(38,0)) * 1000000
          |       div (__nc - n_in_fold) as bigint)
          |end""".stripMargin))
      .select(col("category"), col("fold"), col("n_in_fold"), col("enc_e6"))
  }
}
