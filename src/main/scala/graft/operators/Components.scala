package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the step that turns near-dup
  * CANDIDATE PAIRS (from [[Dedup.minhashLsh]] / [[Similarity.nearDupPairs]])
  * into duplicate GROUPS with one keeper each, which is what a corpus
  * pipeline actually deletes against.
  *
  * Algorithm: iterative min-label propagation (each vertex adopts the
  * smallest label among itself and its neighbors) to a fixpoint —
  * O(diameter) rounds, each one join + one aggregation. Duplicate
  * clusters are star-like (diameter 2–3); the default round budget still
  * covers pathological chains; the only driver-side value per round is
  * the changed-row COUNT. Every round the label frame is
  * localCheckpoint-ed —
  * iterative plans grow exponentially otherwise and the driver OOMs
  * building plan strings long before executors feel anything; with a
  * reliable checkpoint dir configured, use checkpoint instead to also
  * remove lineage-recompute risk.
  */
object Components {
  /** @param edges two-column DataFrame of undirected pairs (ids of any
    *              integral type); vertices not present in any pair are
    *              (by construction) their own singleton component and are
    *              not emitted.
    * @return (id, component) where component = min id in the component.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 64): DataFrame = {
    val Array(sc, dc) = edges.columns
    val e = edges.select(col(sc).cast("long").as("a"),
        col(dc).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    val undirected = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .distinct().persist()

    var labels = undirected.select(col("a").as("id"))
      .distinct().withColumn("comp", col("id")).persist()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // candidate for each vertex: the smallest neighbor label (+ its own)
      val viaNeighbors = undirected
        .join(labels, undirected("b") === labels("id"))
        .select(col("a").as("id"), col("comp"))
      // convergence check IN the propagation round (saves the extra
      // confirmation round a sum-fixpoint needs): the own-label branch of
      // the union is tagged with the vertex's PREVIOUS label (`own`);
      // every id has exactly one tagged row, so after the min-aggregation
      // `comp < own` ⇔ this round lowered the label. One integer-exact
      // scalar per round reaches the driver, same as before.
      val viaSelf = labels.select(col("id"), col("comp"))
        .withColumn("own", col("comp"))
      // LAZY checkpoint: the changed-count action right below
      // materializes it, so an eager checkpoint would run a second job
      val next = viaNeighbors.withColumn("own", lit(null).cast("long"))
        .union(viaSelf)
        .groupBy("id").agg(min("comp").as("comp"), min("own").as("own"))
        .localCheckpoint(false) // truncate lineage every round
      val changed = Option(next
        .agg(sum(when(col("comp") < col("own"), 1L).otherwise(0L)))
        .head.get(0)).map(_.asInstanceOf[Long]).getOrElse(0L)
      labels.unpersist()
      labels = next.select("id", "comp")
      converged = changed == 0L
      i += 1
    }
    undirected.unpersist()
    if (!converged)
      // returning partially-propagated labels would silently split one
      // true component into several "groups" — fail loudly instead
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIter rounds — " +
          "the graph's diameter exceeds the budget; raise maxIter")
    labels
  }

  /** Full dedup resolution: candidate pairs → per-document verdict.
    * Returns (id, keeper): every id in a duplicate group points at the
    * group's smallest id (keeper == id for the keeper itself). */
  def resolveDuplicates(pairs: DataFrame): DataFrame = {
    val cc = connectedComponents(pairs)
    cc.select(col("id"), col("comp").as("keeper"))
  }
}
