package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.{Tables, ZOrder}
import graft.functions.Cols
import graft.operators.{CalendarOps, Cdc, Collapse, Features, Graph, MonteCarlo, RangeJoin, Sketch}
import graft.sim.Similarity
import graft.text.{Corpus, Dedup, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query naming: `q<nn>_<survey-id>_<desc>` where `<survey-id>` is the
  * SURVEY.md §2 operator id the query exercises (a1 = §2.5 A1, w8 = §2.6 W8,
  * j4 = §2.4 J4, u9 = §2.11 U9, …; x* = builder-brief extension operators).
  * Every query has a DuckDB oracle in [[oracleSql]] unless inherently
  * non-SQL (noted inline). All queries ORDER BY a deterministic key and
  * alias every computed column identically on both sides.
  */
object SparkEntry {

  /** Flagship (driver smoke-checks rows>0 on sf0.001): the CES career
    * collapse re-expressed over the TPC-H-shaped tables — scan → broadcast
    * dim join → routing predicate → long-format stack → weighted monthly
    * collapse (SURVEY M0-M2 end-to-end). */
  def entry(spark: SparkSession): DataFrame =
    EntryHelpers.cesCollapse(GraftSession.tune(spark), "/root/testdata/sf0.001")

  /** The full query registry — per-tranche objects merged; one entry per
    * SURVEY §2 operator / extension (see the object doc above). */
  val queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesA.m ++ QueriesB.m ++ QueriesB.m2

  def oracleSql: Map[String, String] = {
    val m = OraclesA.m ++ OraclesB.m ++ OraclesC.m
    // streaming twins whose drained complete-mode state equals the batch
    // aggregate share the batch oracle VERBATIM — one definition, one gate
    m ++ Map(
      "q266_x_stream_nmi" -> m("q256_x_nmi"),
      "q267_x_stream_vocab_jsd" -> m("q258_x_vocab_jsd"),
      "q285_x_stream_cvm" -> m("q281_x_cramer_von_mises"),
      "q290_x_stream_best_split" -> m("q282_x_best_split"),
      "q293_x_stream_sprt" -> m("q292_x_sprt"),
      "q298_x_stream_chi_square" -> m("q297_x_chi_square"),
      "q302_x_stream_hist_drift" -> m("q301_x_hist_drift"),
      "q318_x_stream_page_hinkley" -> m("q317_x_page_hinkley"),
      "q327_x_stream_vocab_coverage" -> m("q325_x_vocab_coverage"),
      "q333_x_stream_topk_stability" -> m("q319_x_topk_stability"),
      "q344_x_stream_cem_att" -> m("q342_x_cem_att"),
      "q355_x_stream_diff_in_diff" -> m("q352_x_diff_in_diff"),
      "q359_x_stream_conformal" -> m("q353_x_conformal_interval"),
      "q364_x_stream_group_sequential" -> m("q362_x_group_sequential"),
      "q365_x_stream_qn_scale" -> m("q363_x_qn_scale"),
      "q367_x_stream_t_closeness" -> m("q361_x_t_closeness"),
      // auto-routed hot-key dials: both routes are contractually
      // row-identical, so the plain-path oracles serve them
      "q368_x_sessions_auto" -> m("q110_x_batch_sessions"),
      "q369_x_funnel_auto" -> m("q147_x_funnel"),
      "q372_x_stream_seasonal_grid" -> m("q370_u6_seasonal_grid"),
      "q378_x_stream_cmh" -> m("q377_x_cmh_test"),
      "q384_x_stream_jonckheere" -> m("q383_x_jonckheere_trend"))
  }
}
