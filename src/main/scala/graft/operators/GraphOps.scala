package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    // the manifest's count (parquet footers / synth arithmetic) — same
    // value as count(*), zero jobs (see Tables.rowCount)
    val n = Tables.rowCount(spark, sfDir, "documents")
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
    // manifest count, not a scan job (see Tables.rowCount)
    val n = Tables.rowCount(spark, sfDir, "documents")
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

  /** PERSONALIZED PageRank (Haveliwala 2002, "Topic-Sensitive
    * PageRank" — public): the rank mass teleports to a SEED set
    * instead of uniformly, so scores measure proximity to the seeds —
    * the engine behind "more like these" corpus expansion (seed a few
    * curated documents, harvest the high-PPR neighborhood) and
    * link-graph spam/quality propagation. Same exact-integer power
    * iteration as [[pageRankOf]] (ranks ×1e6, contribution
    * `pr DIV outdeg`, damping 85/100 in floor division) with two
    * changes: rank starts AT the seeds (1e6 each, 0 elsewhere) and the
    * 150000 teleport term is paid only to seeds. Non-seed mass can
    * legitimately be 0 (unreached in `iters` hops) — floor division
    * never manufactures mass, so reachability is exact.
    *
    * Scale shape: identical to [[pageRankOf]] — the seed flag is one
    * boolean riding the checkpointed node state; per round one
    * key-partitioned join + agg over edges. Seeds here are the
    * deterministic doc_id % 97 == 0 slice (both engines derive the
    * same set at any scale factor). */
  def personalizedPageRank(spark: SparkSession, sfDir: String,
                           iters: Int = 3): DataFrame =
    pprOf(
      Tables.documents(spark, sfDir).select(col("doc_id").as("node"),
        (col("doc_id") % 97 === 0).as("is_seed")),
      rankEdges(spark, sfDir), iters)._1

  /** Injectable form of [[personalizedPageRank]]: (node, is_seed)
    * list + (src, dst) edges. Convergence discipline is
    * [[pageRankOf]]'s — integer delta-sum observed per round, early
    * stop only at the exact fixpoint. */
  def pprOf(nodesDf: DataFrame, edgesDf: DataFrame,
            iters: Int = 3): (DataFrame, Int) = {
    val nodes = nodesDf.select(col("node"), col("is_seed"))
      .repartition(col("node")).localCheckpoint()
    val wSrc = org.apache.spark.sql.expressions.Window.partitionBy("src")
    val ej = edgesDf.select("src", "dst")
      .withColumn("outdeg", count(lit(1)).over(wSrc))
      .localCheckpoint()
    var r = nodes.select(col("node"), col("is_seed"),
      when(col("is_seed"), lit(1000000L)).otherwise(lit(0L)).as("pr"))
    var rounds = 0
    var converged = false
    while (rounds < iters && !converged) {
      rounds += 1
      val obs = org.apache.spark.sql.Observation(s"ppr_round_$rounds")
      val contrib = ej.join(r, ej("src") === r("node"))
        .select(col("dst"), expr("pr DIV outdeg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("cs"))
      val next = r.select(col("node"), col("is_seed"), col("pr").as("pr_old"))
        .join(contrib, col("node") === contrib("dst"), "left")
        .select(col("node"), col("is_seed"), col("pr_old"),
          (when(col("is_seed"), lit(150000L)).otherwise(lit(0L)) +
            expr("CAST((85 * coalesce(cs, 0)) DIV 100 AS BIGINT)")).as("pr"))
        .observe(obs, coalesce(
          sum(abs(col("pr") - col("pr_old")).cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)")).as("delta"))
        .select(col("node"), col("is_seed"), col("pr"))
        .localCheckpoint()
      converged = obs.get("delta").asInstanceOf[java.math.BigDecimal]
        .signum == 0
      r = next
    }
    (r.select(col("node"), col("pr")).orderBy("node"), rounds)
  }

  /** Deterministic synthetic graph WITH triangles for [[triangleCounts]]:
    * within each block of 4 consecutive ids, doc i links to i+1 (unless
    * i%4 == 3) and to i+2 (when i%4 < 2) — every full block contributes
    * the triangles (4k, 4k+1, 4k+2) and (4k+1, 4k+2, 4k+3). Edges are
    * emitted once with a < b by construction; the BFS/rank graphs are
    * near-permutations and triangle-free, hence the separate formula. */
  def triEdges(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select("doc_id")
    // manifest count, not a scan job (see Tables.rowCount)
    val n = Tables.rowCount(spark, sfDir, "documents")
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

  /** HITS hubs-and-authorities (Kleinberg, JACM 1999, public — the
    * link-analysis dual of PageRank a crawl-quality pipeline runs next
    * to it: a good HUB links to many good authorities, a good AUTHORITY
    * is linked from many good hubs) in EXACT INTEGER arithmetic: both
    * scores start at 1 and each round is the plain unnormalized power
    * step `auth(v) = Σ_{(u,v)} hub(u)` then `hub(u) = Σ_{(u,v)} auth(v)`
    * — every value a sum of integer products, so distributed partial
    * sums are order-free and the DuckDB oracle (same rounds unrolled)
    * hash-matches bitwise. Normalization is a per-round global scalar
    * divide that never changes the RANKING — dropping it is what makes
    * the scores exact; with max degree d the values grow ≤ d^(2·iters),
    * far inside BIGINT at any realistic degree/round count (the
    * spec pins the overflow margin). Multi-edges contribute per copy on
    * both engines, same as [[pageRankOf]].
    *
    * Scale shape: the edge table is checkpointed ONCE, pre-partitioned
    * on src (the window exchange doubles as layout, as in pageRank);
    * each half-round is one equi-join of edges with the narrow
    * (node, score) state plus one map-side-combined sum; state is
    * checkpointed per round to cap lineage. The final report is a
    * bounded TakeOrdered top-k — no global sort. */
  def hits(spark: SparkSession, sfDir: String, iters: Int = 2,
           topN: Int = 20): DataFrame =
    hitsOn(
      Tables.documents(spark, sfDir).select(col("doc_id").as("node")),
      rankEdges(spark, sfDir), iters, topN)

  /** The HITS loop over an arbitrary node set and directed edge list —
    * split out so the spec can hand-check a known hub/authority graph. */
  private[graft] def hitsOn(nodesDf: DataFrame, edgesDf: DataFrame,
                            iters: Int, topN: Int): DataFrame = {
    val nodes = nodesDf.select(col("node"))
      .repartition(col("node")).localCheckpoint()
    val e = edgesDf.select("src", "dst")
      .repartition(col("src")).localCheckpoint()
    var hub = nodes.select(col("node"), lit(1L).as("hub"))
    var auth = nodes.select(col("node"), lit(1L).as("auth"))
    for (_ <- 1 to iters) {
      auth = nodes
        .join(e.join(hub, e("src") === hub("node"))
          .groupBy(col("dst")).agg(sum(col("hub")).as("s")),
          col("node") === col("dst"), "left")
        .select(col("node"), coalesce(col("s"), lit(0L)).as("auth"))
        .localCheckpoint()
      hub = nodes
        .join(e.join(auth, e("dst") === auth("node"))
          .groupBy(col("src")).agg(sum(col("auth")).as("s")),
          col("node") === col("src"), "left")
        .select(col("node"), coalesce(col("s"), lit(0L)).as("hub"))
        .localCheckpoint()
    }
    auth.join(hub, "node")
      .orderBy(col("auth").desc, col("hub").desc, col("node"))
      .limit(topN)
      .select(col("node"), col("auth"), col("hub"))
  }

  /** Approximate Neighbourhood Function via per-node bottom-k sketches
    * (ANF — Palmer, Gibbons & Faloutsos, KDD 2002; the HyperANF of
    * Boldi & Vigna WWW 2011 is the HLL-register variant of the same
    * loop; both public): N(r) = how many (source, target) pairs lie
    * within distance ≤ r — THE statistic behind effective-diameter and
    * reachability profiling of a web/link graph, exact computation of
    * which is an all-pairs BFS nobody can afford. Instead every node
    * keeps a bottom-k sketch of the hashed ids it can reach; one round
    * of merging each node's sketch with its neighbours' extends the
    * radius by one, and |union| is read off each sketch — k longs per
    * node per round, independent of graph size.
    *
    * Exactness contract (the evt_kmv_* discipline): below capacity k
    * the bottom-k set IS the exact distinct reachable set, and this
    * graph's ≤2-hop closed neighbourhoods max out at 26 ≪ k = 64 at
    * both test SFs, so the DuckDB oracle counts exact pairs through the
    * reflexive-closure join and the hash gate is bitwise. At 100 TB
    * neighbourhoods blow past k and the SAME loop degrades to the
    * (k−1)/h_k estimator (spec-pinned on a dense synthetic graph); the
    * hash (id·2654435761 mod 1000000007 — a BIJECTION below the prime,
    * injectivity is what makes the exact regime exact) is the
    * uniformizer the estimator needs.
    *
    * Scale shape: state is (node, k longs); each round is ONE equi-join
    * of the symmetrized edge list with the state plus ONE
    * map-side-combinable agg (array union-sort-truncate), lineage cut
    * per round — the iterate-with-checkpoint shape of [[pageRank]] /
    * [[frontierBfs]]. The per-round report rows are 1-row aggs. */
  def anf(spark: SparkSession, sfDir: String, rounds: Int = 2,
          k: Int = 64): DataFrame = {
    val e = rankEdges(spark, sfDir)
    val nodes = Tables.documents(spark, sfDir).select(col("doc_id").as("node"))
    anfOn(nodes, e, rounds, k)
  }

  /** KMV cardinality readout of one bottom-k sketch (sorted ascending):
    * EXACT size below capacity; at capacity the classic (k−1)/h_k
    * estimate with the hash normalized to (0,1) by the modulus —
    * floored to a long so the distributed sum stays order-free exact
    * integers (the repo's no-float-folds discipline). */
  private val ANF_PRIME = 1000000007L
  private def kmvSize(sk: Column, k: Int): Column =
    when(size(sk) < k, size(sk).cast("long"))
      .otherwise(floor(lit((k - 1).toDouble * ANF_PRIME.toDouble) /
        element_at(sk, k).cast("double")).cast("long"))

  /** The ANF loop over an arbitrary node set and directed edge list
    * (src, dst) — split out so the estimator regime is testable on a
    * dense synthetic graph whose neighbourhoods exceed k. */
  private[graft] def anfOn(nodes: DataFrame, edges: DataFrame,
                           rounds: Int, k: Int): DataFrame = {
    // reflexive symmetric closure: r-fold merge then reaches dist ≤ r
    val und = edges.select(col("src").as("v"), col("dst").as("u"))
      .union(edges.select(col("dst"), col("src")))
      .union(nodes.select(col("node"), col("node")))
      .distinct()
      .localCheckpoint()
    val nNodes = nodes.count() // metadata-scale: one number on the driver
    var state = nodes.select(col("node"),
      array((col("node") * lit(2654435761L)) % lit(ANF_PRIME)).as("sk"))
      .localCheckpoint()
    val perRound = (1 to rounds).map { r =>
      state = und.join(state, und("u") === state("node"))
        .groupBy(col("v").as("node"))
        .agg(slice(array_sort(array_distinct(flatten(collect_list(col("sk"))))),
          1, k).as("sk"))
        .localCheckpoint() // cap lineage per round
      state.agg(sum(kmvSize(col("sk"), k)).as("nf_pairs"))
        .select(lit(r.toLong).as("radius"), col("nf_pairs"),
          expr(s"nf_pairs * 1000 div $nNodes").as("avg_size_milli"))
    }
    perRound.reduce(_.union(_)).orderBy("radius")
  }

  /** Link prediction by neighborhood overlap (Liben-Nowell & Kleinberg
    * CIKM 2003, public) over the [[triEdges]] graph: for every
    * NON-adjacent pair sharing ≥1 neighbor, score by common-neighbor
    * count, Jaccard of neighborhoods (floored BASIS POINTS — the
    * clustering-coefficient integer discipline), and preferential
    * attachment deg·deg. On a dedup pair graph this is "which near-dup
    * edge did LSH miss"; on a link graph, "which page should link
    * here". On this graph the top predictions are exactly the missing
    * (4k, 4k+3) chord of every 4-block — cn = 2, Jaccard = 10000 bp.
    *
    * Scale shape: candidates are generated by the wedge self-join on
    * the shared-neighbor CENTER, so cost is Σ_z deg(z)² — inherent to
    * the statistic (the output can be that large), and bounded the way
    * every production link predictor bounds it: centers above a degree
    * cap are EXCLUDED (super-node wedges predict nothing — a hub's
    * neighbors are not similar for being co-linked by it). The cap is
    * far above this graph's max degree (3), so the answer here is
    * exact and the oracle applies the same cap as a no-op. Adjacent
    * pairs leave via one anti-join; degree table is node-sized (AQE
    * broadcasts while it fits); the report ends in TakeOrdered top-k,
    * never a global sort. */
  def linkPrediction(spark: SparkSession, sfDir: String, topN: Int = 20,
                     degCap: Int = 64): DataFrame = {
    val und = triEdges(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // adjacency both ways: (node, nbr); triEdges emits each edge once
    val adj = und.select(col("a").as("node"), col("b").as("nbr"))
      .union(und.select(col("b"), col("a")))
    val deg = adj.groupBy("node").agg(count(lit(1)).as("d"))
    // wedge join on the center: every unordered pair (x < y) of the
    // center's neighbors is a candidate, counted once per shared nbr
    val centered = adj.select(col("nbr").as("c"), col("node").as("x"))
      .join(deg.select(col("node").as("c"), col("d")), "c")
      .filter(col("d") <= degCap).drop("d")
    val cand = centered
      .join(centered.select(col("c"), col("x").as("y")), "c")
      .filter(col("x") < col("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("cn"))
      // drop pairs that are already edges (x < y matches triEdges' a < b)
      .join(und, col("x") === col("a") && col("y") === col("b"), "left_anti")
    cand
      .join(deg.select(col("node").as("x"), col("d").as("dx")), "x")
      .join(deg.select(col("node").as("y"), col("d").as("dy")), "y")
      .select(col("x").as("a"), col("y").as("b"), col("cn"),
        expr("cn * 10000 DIV (dx + dy - cn)").as("jaccard_bp"),
        (col("dx") * col("dy")).as("pref_attach"))
      .orderBy(col("cn").desc, col("jaccard_bp").desc, col("a"), col("b"))
      .limit(topN)
  }

  /** k-core peel (Seidman 1983; the distributed peel is Montresor et
    * al.'s k-core decomposition shape, public): repeatedly delete every
    * node of degree < k until the k-core remains — THE cheap "is this
    * dup-cluster/community structurally dense or a fragile chain"
    * triage before anything expensive runs on it. Runs over the
    * symmetrized, self-loop-free [[rankEdges]] graph and reports the
    * peel TRAJECTORY (round, n_removed, n_alive, n_edges) — the curve a
    * graph-health dashboard plots. The registered query runs a FIXED
    * number of rounds so the DuckDB oracle can unroll the identical
    * rounds (the ANF/HITS/LPA convention); the spec drives the
    * fixpoint form on a hand graph.
    *
    * Scale shape: each round is one map-side-combined degree count +
    * one semi-join of the edge list against survivors on EACH endpoint
    * — the iterate-with-checkpoint discipline of [[frontierBfs]] (live
    * edge set localCheckpointed per round, lineage never stacks).
    * State is the edge list itself, shrinking monotonically; no
    * per-node auxiliary structure. */
  def kcorePeel(spark: SparkSession, sfDir: String, k: Int = 3,
                rounds: Int = 3): DataFrame = {
    val e = rankEdges(spark, sfDir)
    // manifest count, not a scan job (see Tables.rowCount)
    val nNodes = Tables.rowCount(spark, sfDir, "documents")
    val und = e.filter(col("src") =!= col("dst"))
      .select(col("src").as("v"), col("dst").as("u"))
      .union(e.filter(col("src") =!= col("dst"))
        .select(col("dst"), col("src")))
      .distinct()
      .localCheckpoint()
    kcorePeelOn(spark, und, nNodes, k, rounds)
  }

  /** The peel loop over a symmetrized edge list `und` (v, u) carrying
    * each edge in BOTH directions, and `nNodes` total nodes (isolated
    * nodes have no edge row; they peel in round 1 with degree 0).
    * Textbook staging: round r computes degrees over the CURRENT live
    * edges, removes every node with degree < k (a survivor whose
    * neighbors all peeled keeps "alive" status this round and peels
    * next round at degree 0), then drops edges touching removed nodes.
    * `rounds` < 0 runs to the fixpoint (removed = 0, probed by the
    * survivor checkpoint's observe metric — spec path); ≥ 0 runs
    * exactly that many rounds (the unrolled-oracle path). */
  private[graft] def kcorePeelOn(spark: SparkSession, und: DataFrame,
                                 nNodes: Long, k: Int,
                                 rounds: Int): DataFrame = {
    var live = und
    var alive = nNodes
    var r = 0
    var done = false
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    while (!done && (rounds < 0 || r < rounds)) {
      r += 1
      // survivors: nodes with current degree ≥ k (each edge appears in
      // both directions, so group-by v counts the undirected degree);
      // the survivor count rides the checkpoint job as an observe
      // metric — the frontierBfs probe discipline, no second action
      val obsS = org.apache.spark.sql.Observation(s"kcore_surv_${r}_${System.nanoTime}")
      val surv = live.groupBy(col("v")).agg(count(lit(1)).as("dg"))
        .filter(col("dg") >= k)
        .select(col("v").as("s"))
        .observe(obsS, count(lit(1)).as("n_alive"))
        .localCheckpoint()
      // keep only edges whose BOTH endpoints survive
      val obsE = org.apache.spark.sql.Observation(s"kcore_edges_${r}_${System.nanoTime}")
      live = live
        .join(surv, live("v") === surv("s"), "left_semi")
        .join(surv, live("u") === surv("s"), "left_semi")
        .observe(obsE, count(lit(1)).as("n_edges"))
        .localCheckpoint() // cap lineage per round
      val nAlive = obsS.get("n_alive").asInstanceOf[Long]
      val nEdges = obsE.get("n_edges").asInstanceOf[Long]
      val removed = alive - nAlive
      out += ((r.toLong, removed, nAlive, nEdges / 2))
      done = rounds < 0 && (removed == 0L || nAlive == 0L)
      alive = nAlive
    }
    import spark.implicits._
    out.toSeq.toDF("round", "n_removed", "n_alive", "n_edges")
      .orderBy("round")
  }
}
