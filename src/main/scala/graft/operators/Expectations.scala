package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation (the Deequ/Great-Expectations
  * shape): a constraint suite evaluated against a table in a FIXED, small
  * number of jobs, returning one verdict row per constraint —
  * `(constraint, n_rows, n_violations, passed)`.
  *
  * Cost model at the 100 TB design point:
  *   - ALL row-level checks (not-null, range, accepted-values, regex —
  *     any boolean `Column`) fold into ONE aggregate over ONE scan: each
  *     check is a `sum(violates)` beside its siblings, map-side combined.
  *     Adding a 50th check adds a column to the aggregate, not a job.
  *   - The optional unique-key check rides the SAME aggregate as a
  *     `count_distinct(struct(keys))` (one Expand inside the one
  *     shuffle), so uniqueness does not rescan either.
  *   - Each referential check is its own key-projected anti-join — the
  *     only part that shuffles more than an aggregate row, and it
  *     broadcasts whenever the parent side is dimension-sized.
  *
  * Violation semantics: a row violates a check when the predicate is
  * FALSE or NULL (SQL three-valued logic would otherwise let a null
  * slip through exactly where data quality checks care most). The
  * returned frame is sorted by constraint name — verdicts are
  * set-shaped, not order-shaped. */
object Expectations {

  /** One referential-integrity expectation: `childKeys` of the frame
    * under validation must all exist as `parentKeys` of `parent`. */
  final case class RefCheck(name: String, childKeys: Seq[String],
                            parent: DataFrame, parentKeys: Seq[String])

  def validate(df: DataFrame,
               rowChecks: Seq[(String, Column)],
               uniqueKey: Option[(String, Seq[String])] = None,
               refChecks: Seq[RefCheck] = Nil): DataFrame = {
    require(rowChecks.nonEmpty || uniqueKey.nonEmpty || refChecks.nonEmpty,
      "validate needs at least one constraint")
    val spark = df.sparkSession
    import spark.implicits._

    val pieces = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

    if (rowChecks.nonEmpty || uniqueKey.nonEmpty) {
      // one scan, one aggregate: per-check violation sums + row count
      // (+ the exact distinct-key count when a unique key is declared)
      val sums = rowChecks.map { case (name, pred) =>
        sum(when(pred, 0L).otherwise(1L)).as(s"__v_$name")
      }
      val uniq = uniqueKey.toSeq.map { case (name, keys) =>
        count_distinct(struct(keys.map(col): _*)).as(s"__u_$name")
      }
      val aggCols = (sums ++ uniq) :+ count(lit(1)).as("__n")
      val one = df.agg(aggCols.head, aggCols.tail: _*)
      val stacked = rowChecks.map { case (name, _) =>
        (lit(name), col(s"__v_$name"))
      } ++ uniqueKey.toSeq.map { case (name, _) =>
        // violations of uniqueness = surplus rows beyond one per key
        (lit(name), col("__n") - col(s"__u_$name"))
      }
      pieces += one.select(explode(array(stacked.map { case (n, v) =>
        struct(n.as("constraint"), col("__n").as("n_rows"), v.as("n_violations"))
      }: _*)).as("c")).select(col("c.*"))
    }

    refChecks.foreach { rc =>
      // key-projected anti-join: only the (distinct-free) child keys and
      // the DEDUPED parent keys move; a missing parent key is one
      // violation per child row carrying it (count BEFORE dedup, so the
      // verdict row reports affected rows, not affected keys).
      // CONTRACT: plain SQL equality, not null-safe <=> — a NULL child
      // key can never reference a parent row, so it IS a violation
      // (matching the standard LEFT JOIN ... IS NULL orphan count);
      // parent keys are deduped so the semantics don't depend on parent
      // multiplicity either.
      val childN = df.count() // cheap: parquet count-from-metadata / cached plan
      val missing = df.select(rc.childKeys.map(col): _*)
        .join(rc.parent.select(rc.parentKeys.map(col): _*).distinct(),
          rc.childKeys.zip(rc.parentKeys).map { case (c, p) => col(c) === col(p) }
            .reduce(_ && _),
          "left_anti")
        .count()
      pieces += Seq((rc.name, childN, missing))
        .toDF("constraint", "n_rows", "n_violations")
    }

    pieces.reduce(_ unionByName _)
      .withColumn("passed", col("n_violations") === 0L)
      .orderBy("constraint")
  }
}
