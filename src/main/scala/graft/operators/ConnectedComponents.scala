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
    */
  private def driverUnionFind(spark: SparkSession, pr: DataFrame): DataFrame = {
    import spark.implicits._
    val edges = pr.select(col("id_a").cast("long"), col("id_b").cast("long"))
      .as[(Long, Long)].collect()
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    val rank = scala.collection.mutable.HashMap.empty[Long, Int]
    def find(x: Long): Long = {
      var root = x
      while (parent.getOrElse(root, root) != root) root = parent.getOrElse(root, root)
      var cur = x
      while (cur != root) { val nxt = parent(cur); parent(cur) = root; cur = nxt }
      root
    }
    def union(a: Long, b: Long): Unit = {
      val ra = find(a); val rb = find(b)
      if (ra != rb) {
        val (hi, lo) =
          if (rank.getOrElse(ra, 0) >= rank.getOrElse(rb, 0)) (ra, rb) else (rb, ra)
        parent(lo) = hi
        if (rank.getOrElse(ra, 0) == rank.getOrElse(rb, 0))
          rank(hi) = rank.getOrElse(hi, 0) + 1
      }
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      union(a, b)
    }
    val byRoot = parent.keys.toSeq.groupBy(find)
    val out = byRoot.valuesIterator.flatMap { members =>
      val lbl = members.min
      members.iterator.map(id => (id, lbl))
    }.toSeq
    spark.createDataset(out).toDF("id", "lbl")
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
