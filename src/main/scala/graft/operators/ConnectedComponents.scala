package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

/** Connected components over an undirected pair list, with the canonical
  * label = MIN reachable node id (so "keep one doc per near-dup cluster"
  * becomes a groupBy on the label).
  *
  * Adaptive execution — the broadcast-join size decision applied to graph
  * iteration:
  *
  *  - **Subcritical graphs** (≤ `driverEdgeThreshold` edges, the near-dup
  *    common case: dup pairs are a tiny fraction of any healthy corpus)
  *    collect to the driver and run union-find with path compression —
  *    microseconds of CPU versus one Spark job PER ROUND of the iterative
  *    alternative. 2^20 edges ≈ 16 MB of longs, comfortably driver-scale;
  *    the result broadcasts back out.
  *  - **Large graphs** run Pregel-style iterative min-label propagation
  *    (hash-join per round, rounds ≈ graph diameter): every frame stays
  *    distributed, the driver holds only a convergence scalar (Σlbl is
  *    strictly decreasing until fixpoint), superseded label snapshots are
  *    unpersisted each round, and lineage is truncated every 5 rounds.
  *
  * Both paths produce identical labels for the edge ENDPOINTS only —
  * isolated nodes never enter the graph (callers left-join and coalesce to
  * the node's own id), which keeps per-round work O(edges), not O(corpus).
  */
object ConnectedComponents {

  /** Labels `(id, lbl)` for every node appearing in `pairs` (cols: two long
    * columns, one row per undirected edge). `pairs` should be materialized
    * (checkpointed/persisted) by the caller — both paths traverse it at
    * least twice.
    */
  def labels(
      spark: SparkSession,
      pairs: DataFrame,
      driverEdgeThreshold: Long = 1L << 20,
      knownEdgeCount: Option[Long] = None
  ): DataFrame = {
    import spark.implicits._
    val pr = pairs.toDF("id_a", "id_b")
    // callers that already counted the (checkpointed) pair list pass it in
    // so the operator doesn't launch a second count job
    val nPairs = knownEdgeCount.getOrElse(pr.count())
    if (nPairs == 0) {
      spark.emptyDataset[(Long, Long)].toDF("id", "lbl")
    } else if (nPairs <= driverEdgeThreshold) {
      driverUnionFind(spark, pr)
    } else {
      distributedPropagation(spark, pr, nPairs)
    }
  }

  /** Driver-side union-find (path compression + union by rank), for graphs
    * whose edge list fits the driver with room to spare.
    *
    * All driver state is PRIMITIVE arrays: edges land as two long arrays,
    * node ids are index-compressed through one sorted distinct array +
    * binary search, and parent/rank are int/byte arrays over those
    * indices. At the 2^20-edge threshold that is ~16 MB of longs plus
    * ~10 MB of indices — the boxed-HashMap formulation this replaces
    * realistically cost hundreds of MB at the same threshold (a boxed
    * entry per node in two maps), which could OOM a default-sized driver.
    */
  private def driverUnionFind(spark: SparkSession, pr: DataFrame): DataFrame = {
    import spark.implicits._
    val rows = pr.select(col("id_a").cast("long"), col("id_b").cast("long"))
      .as[(Long, Long)].collect()
    val m = rows.length
    val ea = new Array[Long](m); val eb = new Array[Long](m)
    var i = 0
    while (i < m) { ea(i) = rows(i)._1; eb(i) = rows(i)._2; i += 1 }
    // index-compress node ids: sorted distinct array; id → index by search
    val nodes: Array[Long] = {
      val all = new Array[Long](2 * m)
      System.arraycopy(ea, 0, all, 0, m); System.arraycopy(eb, 0, all, m, m)
      java.util.Arrays.sort(all)
      var n = 0; var j = 0
      while (j < all.length) {
        if (n == 0 || all(j) != all(n - 1)) { all(n) = all(j); n += 1 }
        j += 1
      }
      java.util.Arrays.copyOf(all, n)
    }
    def idx(id: Long): Int = java.util.Arrays.binarySearch(nodes, id)
    val n = nodes.length
    val parent = Array.tabulate(n)(identity)
    val rank = new Array[Byte](n) // rank ≤ log2(n) < 127 always
    def find(x: Int): Int = {
      var root = x
      while (parent(root) != root) root = parent(root)
      var cur = x
      while (cur != root) { val nxt = parent(cur); parent(cur) = root; cur = nxt }
      root
    }
    i = 0
    while (i < m) {
      val ra = find(idx(ea(i))); val rb = find(idx(eb(i)))
      if (ra != rb) {
        if (rank(ra) > rank(rb)) parent(rb) = ra
        else if (rank(ra) < rank(rb)) parent(ra) = rb
        else { parent(rb) = ra; rank(ra) = (rank(ra) + 1).toByte }
      }
      i += 1
    }
    // component label = min node id in the component; node ids ascend with
    // index, so the FIRST index seen per root is the component minimum
    val lbl = new Array[Long](n)
    java.util.Arrays.fill(lbl, Long.MinValue)
    val out = new Array[(Long, Long)](n)
    i = 0
    while (i < n) {
      val r = find(i)
      if (lbl(r) == Long.MinValue) lbl(r) = nodes(i)
      out(i) = (nodes(i), lbl(r))
      i += 1
    }
    spark.createDataset(out.toSeq).toDF("id", "lbl")
  }

  /** Distributed min-label propagation — the ≥ threshold scale path. */
  private def distributedPropagation(
      spark: SparkSession,
      pr: DataFrame,
      nPairs: Long
  ): DataFrame = {
    import spark.implicits._
    // partition the loop frames by edge volume, not the session default — a
    // small subgraph on 32 shuffle partitions pays ~30x task overhead per
    // round for no parallelism
    val parts = math.max(1, (nPairs / 500000L).toInt)
    val edges = pr.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pr.select(col("id_b").as("src"), col("id_a").as("dst")))
      .repartition(parts, col("src"))
      .persist(MEMORY_AND_DISK)
    var labels = edges.select($"src".as("id")).distinct()
      .select($"id", $"id".as("lbl"))
    // labels only ever decrease, so Σlbl strictly decreases until the
    // fixpoint: convergence is one exact decimal-sum aggregate per round
    // instead of a join against the previous labels.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum($"lbl".cast("decimal(38,0)"))).head.getDecimal(0)
    var prevSum = labelSum(labels)
    var prevCached: Option[DataFrame] = None
    var rounds = 0
    var converged = false
    val maxRounds = 50
    while (!converged && rounds < maxRounds) {
      val prop = edges.join(labels.select($"id".as("src"), $"lbl"), Seq("src"))
        .select($"dst".as("id"), $"lbl")
      // coalesce collapses the shuffle output back to the graph-scaled
      // partition count (narrow — one task drains all reducers)
      var merged = labels.union(prop).groupBy($"id").agg(min($"lbl").as("lbl"))
        .coalesce(parts)
      // localCheckpoint every 5 rounds truncates the per-round
      // join-union-agg lineage chain (otherwise linear in rounds)
      if ((rounds + 1) % 5 == 0) merged = merged.localCheckpoint(false)
      merged = merged.persist(MEMORY_AND_DISK)
      val curSum = labelSum(merged) // materializes this round's snapshot
      // the superseded snapshot is dead once the new one is materialized:
      // unpersist it so executor storage stays O(1) in rounds
      prevCached.foreach(_.unpersist())
      prevCached = Some(merged)
      converged = curSum.compareTo(prevSum) == 0
      prevSum = curSum
      labels = merged
      rounds += 1
    }
    // A fixpoint past the cap would mean silently-wrong labels for nodes
    // farther than maxRounds hops from their component minimum — fail loudly
    // instead. Rounds ≈ graph diameter, so 50 covers any realistic near-dup
    // graph; a genuine >50-diameter graph needs pointer-jumping, not a
    // bigger cap.
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge within $maxRounds rounds " +
          s"($nPairs edges); the graph diameter exceeds the propagation cap")
    // cut the result loose from the loop's caches: eager localCheckpoint
    // materializes the final labels, then the edge cache can go
    val result = labels.localCheckpoint()
    edges.unpersist()
    prevCached.foreach(_.unpersist())
    result
  }
}
