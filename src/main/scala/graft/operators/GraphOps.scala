package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The reference's crawl frontier (O8: BFS work-list with visited-set
  * dedup, index.py:117-142) as distributed iteration.
  *
  * Each round is one distributed job: expand the frontier through the
  * edge table, anti-join against the visited set, union. `localCheckpoint`
  * caps lineage growth per iteration (SURVEY.md §7.4 hard part (b)) — at
  * 100 TB this is the standard iterate-with-checkpoint shape (same as
  * GraphX/Pregel supersteps); depth is bounded so the loop terminates.
  */
object GraphOps {

  /** Deterministic synthetic link graph over documents: each doc links to
    * (id*7+1) % N — one edge per doc, same formula in the DuckDB oracle. */
  def linkEdges(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select("doc_id")
    val n = docs.count() // metadata-scale action: one number on the driver
    docs.select(col("doc_id").as("src"),
      ((col("doc_id") * 7 + 1) % n).as("dst"))
  }

  /** Multi-out-edge deterministic link graph for rank iteration: every
    * doc links to (id·7+1) % N and (id·13+3) % N, even docs additionally
    * to (id·3+5) % N — out-degree 2–3, varied in-degree (the BFS graph's
    * single out-edge is a near-permutation, which would make every
    * PageRank uniform). Multi-edges/self-loops that fall out of formula
    * collisions are kept on BOTH engines (outdeg counts them, each
    * contributes), so the oracle is exact. */
  def rankEdges(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select("doc_id")
    val n = docs.count() // metadata-scale action: one number on the driver
    // one scan: each doc emits its 2-3 out-edges via explode (the
    // union-of-three-selects spelling scanned the table per branch)
    def edge(mul: Int, add: Int) =
      struct(col("doc_id").as("src"), ((col("doc_id") * mul + add) % n).as("dst"))
    docs.select(explode(
        when(col("doc_id") % 2 === 0, array(edge(7, 1), edge(13, 3), edge(3, 5)))
          .otherwise(array(edge(7, 1), edge(13, 3)))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
  }

  /** PageRank in INTEGER arithmetic — the rank-iteration shape
    * (power method with damping 0.85) with every operation an exact
    * BIGINT op, so distributed sums are order-independent and the
    * DuckDB oracle hash-matches bitwise: ranks are scaled by 1e6,
    * per-edge contribution is `rank DIV outdeg`, damping is
    * `150000 + (85 · Σcontrib) DIV 100` (floor division in both
    * engines for these all-positive values; no doubles anywhere, the
    * same no-rounding discipline as the BM25/chi-square scores).
    *
    * Scale shape: each iteration is ONE equi-join of the checkpointed
    * (src, dst, outdeg) edge table with the narrow (node, rank) state
    * plus ONE map-side-combined aggregate; `localCheckpoint` caps
    * lineage per round exactly like [[frontierBfs]] and the CC loop —
    * the standard iterate-with-checkpoint shape at 100 TB. Iteration
    * count is fixed (power iteration converges geometrically; the
    * oracle unrolls the same count). */
  def pageRank(spark: SparkSession, sfDir: String, iters: Int = 3): DataFrame =
    pageRankOf(
      Tables.documents(spark, sfDir).select(col("doc_id").as("node")),
      rankEdges(spark, sfDir), iters)._1

  /** Injectable form of [[pageRank]]: rank iteration over an arbitrary
    * (node) list and (src, dst) edge list. Returns (ranks, rounds run).
    *
    * CONVERGENCE TERMINATION: each round observes the integer-rank
    * delta sum Σ|pr' − pr| riding the round's own checkpoint job
    * (CollectMetrics accumulator — same one-action-per-round shape as
    * [[frontierBfs]] and the CC loop). Delta 0 means the power
    * iteration hit its exact integer fixpoint: every later round is
    * the identity, so stopping early is indistinguishable from running
    * all `iters` rounds — the fixed-unroll oracle still hash-matches
    * bitwise. The delta accumulates in DECIMAL(38,0) (exact at any
    * node count; a Long sum could in principle wrap). `iters` stays
    * the hard cap: geometric convergence in DOUBLE arithmetic never
    * reaches an exact integer fixpoint on most graphs, so the floor
    * only fires when it is provably safe. */
  def pageRankOf(nodesDf: DataFrame, edgesDf: DataFrame,
                 iters: Int = 3): (DataFrame, Int) = {
    // node list checkpointed hash-partitioned on the join key: the
    // per-iteration rank update joins contrib (already partitioned by
    // dst, its groupBy key) against the rank state — with both sides in
    // place that join crosses NO exchange
    val nodes = nodesDf.select(col("node"))
      .repartition(col("node")).localCheckpoint()
    // out-degree via a window over src instead of agg + self-join: ONE
    // pass over ONE edge build (the old form constructed rankEdges twice
    // — two scans and two driver count() jobs — and joined them). The
    // window's exchange doubles as pre-partitioning: the checkpointed
    // (src, dst, outdeg) table is already hash-partitioned on src, so
    // every iteration's contribution join moves only the narrow
    // (node, rank) state
    val wSrc = org.apache.spark.sql.expressions.Window.partitionBy("src")
    val ej = edgesDf.select("src", "dst")
      .withColumn("outdeg", count(lit(1)).over(wSrc))
      .localCheckpoint()
    var r = nodes.select(col("node"), lit(1000000L).as("pr"))
    var rounds = 0
    var converged = false
    while (rounds < iters && !converged) {
      rounds += 1
      val obs = org.apache.spark.sql.Observation(s"pr_round_$rounds")
      val contrib = ej.join(r, ej("src") === r("node"))
        .select(col("dst"), expr("pr DIV outdeg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("cs"))
      // join contrib against the CURRENT rank state (same key set as
      // the node list) so the old rank is in scope for the delta metric
      val next = r.select(col("node"), col("pr").as("pr_old"))
        .join(contrib, col("node") === contrib("dst"), "left")
        .select(col("node"), col("pr_old"),
          expr("CAST(150000 + (85 * coalesce(cs, 0)) DIV 100 AS BIGINT)").as("pr"))
        .observe(obs, coalesce(
          sum(abs(col("pr") - col("pr_old")).cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)")).as("delta"))
        .select(col("node"), col("pr"))
        .localCheckpoint()
      converged = obs.get("delta").asInstanceOf[java.math.BigDecimal]
        .signum == 0
      r = next
    }
    (r.orderBy("node"), rounds)
  }

  /** Deterministic synthetic graph WITH triangles for [[triangleCounts]]:
    * within each block of 4 consecutive ids, doc i links to i+1 (unless
    * i%4 == 3) and to i+2 (when i%4 < 2) — every full block contributes
    * the triangles (4k, 4k+1, 4k+2) and (4k+1, 4k+2, 4k+3). Edges are
    * emitted once with a < b by construction; the BFS/rank graphs are
    * near-permutations and triangle-free, hence the separate formula. */
  def triEdges(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select("doc_id")
    val n = docs.count() // metadata-scale action: one number on the driver
    def edge(off: Int, maxMod: Int) =
      when(col("doc_id") % 4 < maxMod && col("doc_id") + off < n,
        struct(col("doc_id").as("a"), (col("doc_id") + off).as("b")))
    docs.select(explode(filter(array(edge(1, 3), edge(2, 2)),
        e => e.isNotNull)).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
  }

  /** Per-node triangle counts by degree-ordered edge orientation — the
    * standard distributed triangle algorithm (Schank–Wagner ordering;
    * the MapReduce form is Suri–Vassilvitskii 2011, public): orient each
    * undirected edge from its (degree, id)-smaller endpoint, build
    * wedges by self-joining oriented edges on their low endpoint, and
    * close each wedge against the undirected edge set. Orientation
    * bounds every node's out-list by O(√m) on skew-free graphs, so the
    * wedge join — the only quadratic-looking step — generates
    * Σ outdeg² = O(m^1.5) candidates instead of Σ deg² (which a hub
    * node would otherwise blow up); this is exactly the reason the
    * oriented form, not the naive three-way join, is the 100 TB shape.
    * Each triangle is enumerated exactly once (lo < mid < hi in
    * orientation order); per-node counts explode the three corners and
    * aggregate map-side. */
  def triangleCounts(spark: SparkSession, sfDir: String, topN: Int = 20): DataFrame =
    perNodeTriangles(spark, sfDir)._2
      .orderBy(col("n_tri").desc, col("node"))
      .limit(topN)

  /** Shared tail of the triangle family: (degree table, per-node
    * triangle counts) over [[triEdges]]. Degree table is node-sized;
    * triangle counts cover only nodes in ≥1 triangle (the callers
    * outer-join back). */
  private def perNodeTriangles(spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    val und = triEdges(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = und.select(explode(array(col("a"), col("b"))).as("x"))
      .groupBy("x").agg(count(lit(1)).as("d"))
    // degree table is node-sized: AQE broadcasts while it fits, shuffle
    // equi-join beyond (no pin — the graft broadcast-discipline default)
    val o = und
      .join(deg.select(col("x").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("x").as("b"), col("d").as("db")), "b")
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("lo"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("hi"))
    val e1 = o.select(col("lo"), col("hi").as("y"))
    val e2 = o.select(col("lo"), col("hi").as("z"))
    val wedges = e1.join(e2, Seq("lo")).filter(col("y") < col("z"))
    val tri = wedges.join(und,
        least(col("y"), col("z")) === col("a") &&
        greatest(col("y"), col("z")) === col("b"))
      .select(col("lo").as("x"), col("y"), col("z"))
    val counts = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
    (deg, counts)
  }

  /** Local clustering coefficient per node — the standard "how much of
    * a community sits around this node" graph statistic (Watts–Strogatz
    * 1998, public): cc(v) = 2·T(v) / (deg(v)·(deg(v)−1)), emitted in
    * floored BASIS POINTS so the division is exact integer arithmetic
    * on both engines (the float quotient would be fold-order-safe here
    * but the integer discipline keeps it hash-gated like every other
    * ratio in the repo). Nodes in no triangle outer-join back with
    * T = 0; degree-1 nodes have an undefined coefficient and emit 0.
    *
    * Scale shape: the O(m^1.5) oriented wedge join is shared with
    * [[triangleCounts]]; everything after is node-sized (degree ⋈
    * triangle-count is |V| rows — AQE broadcasts while it fits). For a
    * dedup pair graph this is the query that separates genuine
    * duplicate communities (cc → 1) from hub-spoke false-positive
    * stars (cc → 0) before canonical selection. */
  def clusteringCoefficients(spark: SparkSession, sfDir: String): DataFrame = {
    val (deg, counts) = perNodeTriangles(spark, sfDir)
    deg.join(counts, col("x") === col("node"), "left")
      .select(col("x").as("node"), col("d").cast("long").as("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("cc_bp", expr(
        "CASE WHEN degree >= 2 THEN (2 * n_tri * 10000) DIV (degree * (degree - 1)) " +
        "ELSE CAST(0 AS BIGINT) END"))
      .orderBy("node")
  }

  /** BFS from doc 0, max depth 6: minimum-depth label per reachable node.
    * The loop is driver-side control flow only; all data stays
    * distributed. Oracle: recursive CTE with min(depth). */
  def frontierBfs(spark: SparkSession, sfDir: String, maxDepth: Int = 6): DataFrame = {
    // static edge table pre-partitioned on the expansion key: each
    // round's frontier join moves only the (tiny) frontier side
    val edges = linkEdges(spark, sfDir).repartition(col("src")).localCheckpoint()
    var frontier = spark.range(1).select(lit(0L).as("node"), lit(0).as("depth"))
    var visited = frontier
    var depth = 0
    var exhausted = false
    while (depth < maxDepth && !exhausted) {
      depth += 1
      // the new-frontier size rides the checkpoint job as an observe
      // metric — the old `frontier.isEmpty` probe was a second action
      // per round
      val obs = org.apache.spark.sql.Observation(s"bfs_depth_$depth")
      val next = frontier
        .join(edges, frontier("node") === edges("src"))
        .select(col("dst").as("node"), lit(depth).as("depth"))
        .distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .observe(obs, count(lit(1)).as("n"))
        .localCheckpoint() // cap lineage: each round starts from materialized state
      exhausted = obs.get("n").asInstanceOf[Long] == 0L
      // visited is a union of already-checkpointed frontiers — cheap
      // lineage, no second materialization per round
      visited = visited.union(next)
      frontier = next
    }
    visited.orderBy("node")
  }

  /** Synchronous label propagation (Raghavan 2007) over the
    * [[rankEdges]] graph — the community-detection pass that groups
    * pages into topical neighborhoods without a cluster-count knob:
    * every node starts labeled by itself; each round it adopts the most
    * frequent label among its neighbors, ties to the SMALLEST label —
    * the deterministic tie rule that makes synchronous LPA
    * engine-portable (textbook LPA breaks ties randomly; min-label
    * keeps both engines and every rerun identical). Multi-edges count
    * as weight, matching the PageRank convention on this graph.
    *
    * Each round is exactly the CC/PageRank iteration shape: ONE
    * equi-join of the pre-partitioned checkpointed undirected edge
    * table with the narrow (node, lbl) state, ONE map-side-combined
    * count per (node, label), and the argmax as `max(struct(c, -lbl))`
    * — no window, nothing quadratic. Fixed 3 rounds (the oracle unrolls
    * the same 3; an observe-metric fixpoint probe would work exactly as
    * in [[pageRankOf]] but the unrolled oracle pins the round count).
    * State stays O(N) narrow rows; the edge table shuffles once, ever. */
  def labelPropagation(spark: SparkSession, sfDir: String,
                       rounds: Int = 3): DataFrame = {
    val e = rankEdges(spark, sfDir)
    val und = e.select(col("src").as("v"), col("dst").as("u"))
      .union(e.select(col("dst").as("v"), col("src").as("u")))
      .repartition(col("u")).localCheckpoint()
    val nodes = Tables.documents(spark, sfDir)
      .select(col("doc_id").as("node"), col("doc_id").as("lbl"))
    labelPropagationOn(und, nodes, rounds)
  }

  /** The LPA loop over an arbitrary undirected edge list `und` (v, u)
    * and initial labeling `labels0` (node, lbl) — split out so the
    * zero-degree contract is testable on synthetic graphs. */
  private[graft] def labelPropagationOn(und: DataFrame, labels0: DataFrame,
                                        rounds: Int): DataFrame = {
    var labels = labels0
    for (_ <- 1 to rounds) {
      val adopted = und
        .join(labels, und("u") === labels("node"))
        .groupBy(col("v"), col("lbl")).agg(count(lit(1)).as("c"))
        .groupBy(col("v"))
        .agg(max(struct(col("c").as("c"), (-col("lbl")).as("nl"))).as("m"))
        .select(col("v").as("node"), (-col("m.nl")).as("adopted"))
      // left-join back onto the FULL node set (ADVICE r8): a zero-degree
      // node has no neighbor votes and must KEEP its own label, not
      // vanish from the output — the inner-join spelling was only
      // correct because every rankEdges doc happens to have out-edges
      labels = labels
        .join(adopted, Seq("node"), "left_outer")
        .select(col("node"), coalesce(col("adopted"), col("lbl")).as("lbl"))
        .localCheckpoint() // cap lineage per round, as in the CC loop
    }
    labels.orderBy("node")
  }
}
