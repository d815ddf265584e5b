package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components by alternating large-star / small-star
  * contraction (Kiveris et al., "Connected Components in MapReduce
  * and Beyond", SoCC 2014) — the O(log n)-round scale path for the
  * cluster-labeling contract of [[NearDup.dupClusters]].
  *
  * Min-label propagation converges in O(diameter) rounds, which is
  * fine for near-dup graphs (tiny cliques) but degenerates on long
  * chains — a pathological corpus (e.g. overlapping-window shingle
  * links) can chain thousands of docs. The star operations instead
  * contract whole subtrees toward the component minimum every round:
  *
  *  - large-star: every node's strictly-LARGER neighbors re-attach to
  *    the minimum of its closed neighborhood;
  *  - small-star: every node and its smaller-or-equal neighbors
  *    re-attach to that set's minimum.
  *
  * Alternating the two converges to per-component stars (every node
  * directly linked to its component minimum) in O(log n) rounds
  * regardless of diameter, proven in the paper. Per round the work is
  * two groupBy shuffles over the CURRENT edge set — which only ever
  * shrinks toward one edge per non-root node — and high-degree hubs
  * self-heal: a supernode's edges re-point to the component minimum
  * in one round instead of re-shuffling through the hub forever.
  *
  * Scale shape: edges are the only shuffled relation (skinny id
  * pairs); per-round frames are localCheckpointed so plan depth stays
  * O(1) at any round count; the driver sees one scalar
  * changed-edge count per round. Refuses (IllegalStateException)
  * instead of returning possibly-non-minimal labels if `maxIter` is
  * hit — with the default 50 that would take a graph of ~2^50 nodes.
  */
object ConnectedComponents {

  /** Component labels for every endpoint in `pairs`: (id, cluster_id)
    * where cluster_id is the component's minimum id — the exact
    * contract of [[NearDup.dupClusters]] (spec-asserted equal).
    */
  def labels(pairs: DataFrame, aCol: String, bCol: String, maxIter: Int = 50): DataFrame =
    labelsWithRounds(pairs, aCol, bCol, maxIter)._1

  private[graft] def labelsWithRounds(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int
  ): (DataFrame, Int) = {
    val raw = pairs
      .select(col(aCol).as("u"), col(bCol).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()

    // materialize the input FIRST and derive everything from the
    // checkpoint: `pairs` is typically an expensive unpersisted plan
    // (an LSH verify), and the previous shape executed it three times
    // (once per union branch of `nodes`, once for the edge
    // checkpoint — measured 2/3 of q_cc_labels' task time)
    val edges0 = raw.localCheckpoint(true)

    // every endpoint, fixed up front: star contraction drops nodes
    // from the edge set as they become roots, but each keeps a label.
    // Derived from the checkpoint and only consumed by the final
    // join, so it needs no persist/count of its own.
    val nodes = edges0.select(col("u").as("id"))
      .unionByName(edges0.select(col("v").as("id")))
      .distinct()

    var edges = edges0
    // carried across rounds: this round's edge count IS next round's
    // — re-counting the checkpointed previous set was one driver job
    // per round for a number already in hand
    var edgeCount = edges.count()
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxIter) {
      // large-star: center u over its symmetric closed neighborhood;
      // m = min(neighbors ∪ {u}); larger neighbors re-attach to m.
      val sym = edges.unionByName(edges.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u")
        .agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val large = sym.join(mins, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()

      // small-star: orient (hi, lo); m = min of hi's smaller
      // neighborhood; everything in {hi} ∪ Γ≤(hi) except m re-attaches
      val oriented = large
        .select(greatest(col("u"), col("v")).as("hi"), least(col("u"), col("v")).as("lo"))
        .distinct()
      val smallMins = oriented.groupBy("hi").agg(min(col("lo")).as("m"))
      val withM = oriented.join(smallMins, "hi")
      // LAZY checkpoint: the count below materializes it — one job
      // per round instead of an eager-checkpoint job plus a count job
      val small = withM
        .where(col("lo") =!= col("m"))
        .select(col("lo").as("u"), col("m").as("v"))
        .unionByName(withM.select(col("hi").as("u"), col("m").as("v")))
        .distinct()
        .localCheckpoint(false)
      val smallCount = small.count()

      // fixpoint: both star ops leave a set of minimum-rooted stars
      // unchanged. Both sides are distinct sets, so equal counts plus
      // an empty one-sided difference proves equality (A⊆B ∧ |A|=|B|)
      // — one difference job instead of two
      converged = smallCount == edgeCount && small.exceptAll(edges).isEmpty
      edges = small
      edgeCount = smallCount
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter alternating rounds")

    // final edges are (node, componentMin) stars; roots carry no edge
    val out = nodes.join(edges.withColumnRenamed("u", "id"), Seq("id"), "left")
      .select(col("id"), coalesce(col("v"), col("id")).as("cluster_id"))
    (out, rounds)
  }
}
