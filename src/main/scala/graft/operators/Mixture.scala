package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Domain-mixture subsampling to token budgets — the "data mixing" step of
  * a pretraining pipeline: each domain (language, source, quality tier) is
  * downsampled to a target token count, so the final corpus realizes a
  * chosen mixture (e.g. 40% web, 30% code, ...) instead of the crawl's
  * natural skew.
  *
  * Selection is deterministic and re-ingestion-stable: within a domain,
  * documents are taken in (md5(id), id) order — a content-free uniform
  * permutation — until the cumulative token count reaches the domain's
  * budget. The document straddling the boundary is included iff it STARTS
  * inside the budget, so the realized count overshoots by at most one
  * document; every engine replays the same pick (t23's oracle re-derives
  * it in DuckDB with one window).
  *
  * Scale shape: ONE shuffle on the domain key carrying (id, domain,
  * n_tokens) only — never text. A domain funnels through one task in the
  * window sort; with few domains and 100 TB, first cut each domain with
  * the [[Sampling]] hash-prefix prefilter (select ids whose md5 prefix
  * falls below ≈ budget/domain_tokens, a zero-shuffle row filter that
  * discards the never-selectable bulk), then run the exact window on the
  * survivors — identical output, sort input shrunk to ≈ the budget.
  */
object Mixture {

  /** Pick documents per domain to fill `budget` tokens (a per-row Column —
    * a `when` ladder over the domain or a broadcast-joined budgets table).
    * Returns (domainCols..., id, n_tokens, start_off) for picked docs;
    * `start_off` is the document's token offset in its domain's order.
    */
  def byTokenBudget(docs: DataFrame, domainCols: Seq[String], idCol: String,
      tokenCount: Column, budget: Column): DataFrame = {
    val w = Window.partitionBy(domainCols.map(col): _*)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    docs
      .select(domainCols.map(col) ++ Seq(col(idCol), tokenCount.as("n_tokens")): _*)
      .withColumn("end_off", sum(col("n_tokens")).over(w))
      .withColumn("start_off", col("end_off") - col("n_tokens"))
      .where(col("start_off") < budget)
      .select(domainCols.map(col) ++
        Seq(col(idCol), col("n_tokens"), col("start_off")): _*)
  }
}
