package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared staging for pairwise near-dup pipelines (MinHash, SimHash):
  * collapse exact-duplicate content first, run the expensive candidate
  * generation + verification on one representative per distinct content,
  * then expand representative pairs back to member cross products.
  *
  * Correctness: any content-derived similarity metric (Jaccard over word
  * sets, SimHash Hamming distance) is constant across a group of
  * byte-identical texts, so within-group pairs carry the metric's
  * self-value and expanded cross-group pairs carry the representatives'
  * value. At scale this bounds pair work by DISTINCT content — a k-copy
  * clique costs k(k-1)/2 emitted rows but zero verification.
  */
object StagedDedup {

  /** (h, ids, rep) per distinct content; `docs` must have doc_id + text. */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("h"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"), min(col("doc_id")).as("rep"))

  /** One doc row per distinct content (the group representative). */
  def representatives(docs: DataFrame, groups: DataFrame): DataFrame =
    groups.select(col("rep").as("doc_id")).join(docs, "doc_id")

  /** All (a < b) pairs within each multi-member group, labeled with the
    * metric's identical-content value (Jaccard 1.0, Hamming 0, ...).
    */
  def withinGroupPairs(groups: DataFrame, metric: String, selfValue: Column): DataFrame =
    groups.filter(size(col("ids")) > 1)
      .select(explode(expr(
        """flatten(transform(sequence(0, size(ids) - 2), i ->
          |  transform(sequence(i + 1, size(ids) - 1), j ->
          |    struct(ids[i] AS a, ids[j] AS b))))""".stripMargin)).as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"), selfValue.as(metric))

  /** Expand verified representative pairs (doc_a, doc_b, metric) to the
    * member cross product of their groups, (a < b)-normalized.
    */
  def expandToMembers(repPairs: DataFrame, groups: DataFrame, metric: String): DataFrame = {
    val ga = groups.select(col("rep").as("doc_a"), col("ids").as("ids_a"))
    val gb = groups.select(col("rep").as("doc_b"), col("ids").as("ids_b"))
    repPairs.join(ga, "doc_a").join(gb, "doc_b")
      .select(col(metric), explode(expr(
        "flatten(transform(ids_a, x -> transform(ids_b, y -> struct(least(x, y) AS a, greatest(x, y) AS b))))")).as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"), col(metric))
  }

  /** Full staged pipeline: `repPairsFn` receives the representative docs
    * and returns verified (doc_a, doc_b, metric) pairs among them.
    */
  def stagedPairs(docs: DataFrame, metric: String, selfValue: Column)(
      repPairsFn: DataFrame => DataFrame): DataFrame = {
    val d = docs.select(col("doc_id"), col("text"))
    val groups = exactGroups(d)
    val within = withinGroupPairs(groups, metric, selfValue)
    val expanded = expandToMembers(repPairsFn(representatives(d, groups)), groups, metric)
    within.unionByName(expanded).orderBy(col("doc_a"), col("doc_b"))
  }
}
