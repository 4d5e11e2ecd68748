package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational graph analytics over an undirected pair set (the
  * near-dup candidate graph, an entity-link graph): the classic
  * MapReduce formulations — ordered-edge joins, never an adjacency
  * matrix — so every step is an AQE-planned hash join/aggregate like
  * the rest of the engine. The transitive-closure sibling lives in
  * [[Dedup.clusters]] (large-star/small-star).
  *
  * Scale shape: edges canonicalize to `a < b` once; triangle
  * enumeration is the two-join ordered-wedge plan of Suri &
  * Vassilvitskii 2011 ("Counting Triangles and the Curse of the Last
  * Reducer") with the construction's actual total order — edges are
  * oriented low→high along '''(degree, id)''', so a hub is never a
  * wedge pivot: its wedges are charged to its (rarer) higher-degree
  * neighbors, bounding total wedge volume at O(m^1.5) instead of the
  * O(Σ deg²) an id-only orientation pays on a skewed graph. A skewed
  * hub is then an ordinary hot join key under AQE. Nothing is
  * quadratic in nodes; all joins key on node ids.
  */
object GraphOps {

  private def intDiv(x: org.apache.spark.sql.Column,
      y: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(new org.apache.spark.sql.catalyst.expressions
      .IntegralDivide(ColumnBridge.expression(x),
        ColumnBridge.expression(y)))
  }

  /** `⌊x / y⌋` true FLOOR division for a possibly-negative numerator
    * over a positive denominator. BOTH engines' native integer
    * division truncates toward zero (Spark's div and DuckDB's `//`
    * alike), so the oracle replays this same sign-split as an
    * explicit CASE — see EventOps.floorDiv. [[modularity]]'s
    * per-community numerator goes negative on sparse communities. */
  private def floorDiv(x: org.apache.spark.sql.Column,
      y: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(x < 0, -intDiv(-x + y - lit(1), y)).otherwise(intDiv(x, y))

  /** Canonical undirected edge list: `a < b`, deduplicated,
    * self-loops dropped. */
  private def edges(pairs: DataFrame, aCol: String, bCol: String)
      : DataFrame =
    pairs
      .select(col(aCol).cast("long").as("u"),
        col(bCol).cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull &&
        col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("a"),
        greatest(col("u"), col("v")).as("b"))
      .distinct()

  /** All triangles `(a, b, c)` with `a < b < c`: orient every edge
    * low→high along the `(degree, id)` total order, wedge-join at the
    * low endpoint, then probe the closing edge — two hash joins on
    * node ids, each triangle emitted exactly once (at its unique
    * order-minimum corner).
    *
    * Degree ordering is what makes this survive a hub: a node of
    * degree d pivots only its order-HIGHER neighbors, of which there
    * are at most O(√m), so a degree-10⁶ hub contributes O(m) wedges,
    * not 10¹². The output triangle set is identical to any other
    * orientation — only the wedge volume changes.
    *
    * @return `(a, b, c)` ordered rows, ids ascending within each row
    */
  def triangles(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b"): DataFrame =
    trianglesFromEdges(
      edges(pairs, aCol, bCol).transform(graft.Materialize.barrier))
      .orderBy(col("a"), col("b"), col("c"))

  /** [[triangles]] over an ALREADY-MATERIALIZED canonical edge list,
    * unsorted — the shared body. `e` must be checkpointed by the
    * caller: it feeds the degree rollup (twice, via the union) and
    * the oriented-edge projection, and the degree table itself is
    * joined on both endpoints — without materialization the upstream
    * pair pipeline re-executed up to five times per action (at bench
    * scale AQE broadcasts the degree sides, which defeats exchange
    * reuse). */
  private[operators] def trianglesFromEdges(e: DataFrame): DataFrame = {
    val deg = e.select(col("a").as("n"))
      .unionAll(e.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
      .transform(graft.Materialize.barrier)
    val withDeg = e
      .join(deg.select(col("n").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("d").as("db")), Seq("b"))
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    // oriented edge (lo ≺ hi); the hi endpoint carries its degree so
    // the wedge join can order the two spokes without another lookup.
    // Shared by the wedge self-join and the closing probe — one lazy
    // checkpoint so the 3-consumer subplan runs once.
    val o = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("lo"),
      when(aFirst, col("b")).otherwise(col("a")).as("hi"),
      when(aFirst, col("db")).otherwise(col("da")).as("dhi"))
      .transform(graft.Materialize.barrier)
    val wedges = o.select(col("lo"), col("hi").as("x"), col("dhi").as("dx"))
      .join(o.select(col("lo"), col("hi").as("y"), col("dhi").as("dy")),
        Seq("lo"))
      .filter(col("dx") < col("dy") ||
        (col("dx") === col("dy") && col("x") < col("y")))
    wedges
      .join(o.select(col("lo").as("x"), col("hi").as("y")),
        Seq("x", "y"), "left_semi")
      .select(array_sort(array(col("lo"), col("x"), col("y"))).as("t"))
      .select(element_at(col("t"), 1).as("a"),
        element_at(col("t"), 2).as("b"),
        element_at(col("t"), 3).as("c"))
  }

  /** Degree histogram: how many nodes have each degree — the one-line
    * shape check (dedup graphs should be near-degree-1; a heavy tail
    * is a shingle storm). Two hash aggregates.
    *
    * @return `(degree, n_nodes)` ordered by degree
    */
  def degreeDistribution(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b"): DataFrame = {
    // the union reads the edge list twice — one materialization
    val e = edges(pairs, aCol, bCol).transform(graft.Materialize.barrier)
    e.select(col("a").as("node"))
      .unionAll(e.select(col("b").as("node")))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("degree"))
      .groupBy(col("degree"))
      .agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("degree"))
  }

  /** Local clustering coefficient per node with degree ≥ 2:
    * `2·triangles(v)·10⁶ // (deg·(deg−1))` — exact integer ppm (the
    * triangle count comes from the SAME ordered-wedge enumeration as
    * [[triangles]], each triangle credited to its three corners by
    * one explode). The "is this neighborhood a clique or a hub"
    * readout over a dedup/link graph.
    *
    * @return `(node, degree, triangles, cc_ppm)` ordered by node
    */
  def clusteringCoefficient(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b"): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    def intDiv(x: org.apache.spark.sql.Column,
        y: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      ColumnBridge.column(new org.apache.spark.sql.catalyst.expressions
        .IntegralDivide(ColumnBridge.expression(x),
          ColumnBridge.expression(y)))
    // ONE materialized edge list feeds both the degree rollup and the
    // triangle enumeration (previously the whole pair pipeline was
    // re-derived by each); the per-corner explode needs no global
    // triangle sort, so the unsorted body is used directly
    val e = edges(pairs, aCol, bCol).transform(graft.Materialize.barrier)
    val deg = e.select(col("a").as("node"))
      .unionAll(e.select(col("b").as("node")))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("degree"))
    val triPerNode = trianglesFromEdges(e)
      .select(explode(array(col("a"), col("b"), col("c")))
        .as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("triangles"))
    deg.filter(col("degree") >= 2)
      .join(triPerNode, Seq("node"), "left_outer")
      .select(col("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .select(col("node"), col("degree"), col("triangles"),
        // product on decimal(38,0): a degree-10⁶ hub's triangle count
        // × 2e6 overflows BIGINT silently where the oracle's HUGEINT
        // does not (vwap/chiCells precedent)
        intDiv(col("triangles").cast("decimal(38,0)") * lit(2000000L),
          (col("degree") * (col("degree") - 1L)).cast("decimal(38,0)"))
          .as("cc_ppm"))
      .orderBy(col("node"))
  }

  /** PageRank over the undirected pair graph, UNROLLED to a fixed
    * iteration count under the FULLY INTEGER contract: ranks are
    * `scale`-fixed-point longs, each step is
    * {{{ r'(v) = ((den−num)·scale + num·Σ_{u∼v} (r(u) // deg(u))) // den }}}
    * (α = num/den, default 85/100) — exact integral division at every
    * floor, so any engine replays the ranks bit-for-bit (the DuckDB
    * oracle unrolls the same iterations as chained CTEs on BIGINT).
    * The centrality readout for dedup/link graphs: which documents
    * anchor a near-dup neighborhood.
    *
    * Scale shape: per iteration ONE join of the directed edge list
    * against the rank table plus one hash rollup — all keyed on node
    * ids, AQE-planned; the edge list and degree table materialize
    * once (lazy checkpoint) and are reused by every iteration. Every
    * node of the pair graph has degree ≥ 1, so there are no dangling
    * redistributions.
    *
    * @return `(node, pr_c)` — the rank at `scale` fixed point,
    *         ordered by node
    */
  def pageRank(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", iters: Int = 3, scale: Long = 1000000L,
      alphaNum: Long = 85L, alphaDen: Long = 100L): DataFrame = {
    require(iters >= 1 && iters <= 16, s"iters must be in [1,16]: $iters")
    require(alphaNum > 0 && alphaDen > alphaNum,
      s"alpha must be in (0, 1): $alphaNum/$alphaDen")
    // the union reads the canonical edge list twice — materialize it
    // once so the upstream pair pipeline runs once, not twice
    val e = edges(pairs, aCol, bCol).transform(graft.Materialize.barrier)
    val dir = e.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(e.select(col("b").as("src"), col("a").as("dst")))
      .transform(graft.Materialize.barrier)
    val deg = dir.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .transform(graft.Materialize.barrier)
    // the rank table carries the (static) degree so each iteration is
    // ONE edge⋈rank join + rollup + the node-list join-back — the
    // separate per-iteration deg join is folded away (same math:
    // `pr // d` moves into the join projection)
    var ranks = deg.select(col("src").as("node"),
      lit(scale).as("pr"), col("d"))
    (1 to iters).foreach { _ =>
      val contrib = dir
        .join(ranks.select(col("node").as("src"),
          intDiv(col("pr"), col("d")).as("c")), Seq("src"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("cs"))
        .select(col("dst").as("node"), col("cs"))
      ranks = deg.select(col("src").as("node"), col("d"))
        .join(contrib, Seq("node"), "left_outer")
        .select(col("node"),
          intDiv(lit((alphaDen - alphaNum) * scale) +
            lit(alphaNum) * coalesce(col("cs"), lit(0L)),
            lit(alphaDen)).as("pr"), col("d"))
    }
    ranks.select(col("node"), col("pr").as("pr_c"))
      .orderBy(col("node"))
  }

  /** k-core peel, UNROLLED to a fixed round count: each round drops
    * every node of current degree < k and the edges touching it; the
    * survivors of round r are exactly what both engines compute after
    * r replayed stages, and on graphs whose peel converges within
    * `rounds` (any bounded-degeneracy near-dup graph converges in a
    * handful) the result IS the exact k-core — the dense-nucleus
    * readout (which documents sit in tightly-meshed duplicate
    * neighborhoods). One degree aggregate + two semi-joins per round,
    * all keyed on node ids, edge set checkpointed per round.
    *
    * '''Convergence is CHECKED, not assumed''': a stable survivor set
    * has every degree ≥ k, so the output projection fail-fasts
    * (`raise_error`, the abLift pattern — zero extra stages, still
    * lazy) the moment any surviving node's degree is < k, i.e. when
    * the peel needed more than `rounds` rounds (a length-L path needs
    * ~L/2) and the result would otherwise be a silent SUPERSET of the
    * k-core. Callers on deep graphs raise `rounds`.
    *
    * @return `(node, degree)` of the surviving subgraph, ordered
    */
  def kCore(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", k: Int = 2, rounds: Int = 6): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(rounds >= 1 && rounds <= 16,
      s"rounds must be in [1,16]: $rounds")
    var e = edges(pairs, aCol, bCol).transform(graft.Materialize.barrier)
    (1 to rounds).foreach { _ =>
      val deg = e.select(col("a").as("n"))
        .unionAll(e.select(col("b").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("d"))
      val keep = deg.filter(col("d") >= k).select(col("n"))
        .transform(graft.Materialize.barrier)
      e = e.join(keep.select(col("n").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("n").as("b")), Seq("b"), "left_semi")
        .transform(graft.Materialize.barrier)
    }
    e.select(col("a").as("n")).unionAll(e.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("degree"))
      .select(col("n").as("node"),
        when(col("degree") < k, raise_error(lit(
          s"kCore: the peel did not stabilize within $rounds " +
            s"rounds (a surviving node still has degree < $k), so " +
            "the result would be a superset of the k-core — " +
            "increase `rounds`")))
          .otherwise(col("degree")).as("degree"))
      .orderBy(col("node"))
  }

  /** Label-propagation communities, UNROLLED to a fixed round count
    * (synchronous LPA with an explicit tie rule): labels start as the
    * node's own id, and each round every node takes its neighbors'
    * MOST FREQUENT label, ties to the SMALLEST label — the argmin of
    * `(−count, label)` under the field-wise struct order both engines
    * share, so the rounds replay bit-for-bit (the DuckDB oracle
    * unrolls the same rounds as chained CTEs). Complements the
    * connected-component readout: components say what's reachable,
    * communities say what's DENSELY knit — two near-dup blobs joined
    * by one accidental bridge pair are one component but two
    * communities, and deleting by component would over-collapse them.
    *
    * Scale shape: per round ONE join of the directed edge list
    * against the label table plus two hash rollups ((node, label)
    * counts, then the per-node argmin) — all keyed on node ids,
    * AQE-planned; the edge list materializes once and every node of
    * the pair graph has degree ≥ 1, so the rollup covers all nodes.
    *
    * @return `(node, community)` ordered by node
    */
  def labelPropagation(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 16, s"iters must be in [1,16]: $iters")
    // the union reads the canonical edge list twice — materialize it
    // once so the upstream pair pipeline runs once, not twice
    val e = edges(pairs, aCol, bCol).transform(graft.Materialize.barrier)
    val dir = e.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(e.select(col("b").as("src"), col("a").as("dst")))
      .transform(graft.Materialize.barrier)
    var labels = dir.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
    (1 to iters).foreach { _ =>
      labels = dir
        .join(labels.select(col("node").as("src"), col("lbl")),
          Seq("src"))
        .groupBy(col("dst"), col("lbl"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("dst"))
        .agg(min(struct((-col("c")).as("negc"), col("lbl").as("l")))
          .as("m"))
        .select(col("dst").as("node"), col("m.l").as("lbl"))
    }
    labels.select(col("node"), col("lbl").as("community"))
      .orderBy(col("node"))
  }

  /** Modularity readout for the [[labelPropagation]] communities —
    * the partition-quality go/no-go before acting on a community
    * split. Per community c the exact integer contribution
    * {{{ contrib_ppm = ⌊(4m·e_c − d_c²)·10⁶ / 4m²⌋ }}}
    * (e_c = internal edges, d_c = degree sum, m = |E|; Newman's
    * `e_c/m − (d_c/2m)²` cleared of fractions, FLOOR division per
    * community since a sparse community's numerator is legitimately
    * negative) — the global Q·10⁶ is their sum up to the disclosed
    * per-community flooring. Products ride DECIMAL(38,0).
    *
    * Scale shape: the pair set checkpoints once and feeds both the
    * LPA rounds and the two rollups here (edge-endpoint label join →
    * internal-edge counts; degree⋈label → degree sums); `m` is a
    * broadcast one-row cross — no collect, no cartesian.
    *
    * @return `(community, n_nodes, internal_edges, degree_sum,
    *         contrib_ppm)` ordered by community
    */
  def modularity(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", iters: Int = 3): DataFrame = {
    val p = pairs.transform(graft.Materialize.barrier)
    val e = edges(p, aCol, bCol).transform(graft.Materialize.barrier)
    val lab = labelPropagation(p, aCol, bCol, iters)
      .transform(graft.Materialize.barrier)
    val dec = "decimal(38,0)"
    val m = e.agg(count(lit(1)).cast(dec).as("m"))
    val eInC = e
      .join(lab.select(col("node").as("a"), col("community").as("la")),
        Seq("a"))
      .join(lab.select(col("node").as("b"), col("community").as("lb")),
        Seq("b"))
      .filter(col("la") === col("lb"))
      .groupBy(col("la").as("community"))
      .agg(count(lit(1)).as("internal_edges"))
    val dir = e.select(col("a").as("n")).unionAll(
      e.select(col("b").as("n")))
    val degC = dir.groupBy(col("n")).agg(count(lit(1)).as("d"))
      .join(lab.select(col("node").as("n"), col("community")),
        Seq("n"))
      .groupBy(col("community"))
      .agg(count(lit(1)).as("n_nodes"),
        sum(col("d")).cast("long").as("degree_sum"))
    degC.join(eInC, Seq("community"), "left_outer")
      .crossJoin(broadcast(m))
      .select(col("community"), col("n_nodes"),
        coalesce(col("internal_edges"), lit(0L)).as("internal_edges"),
        col("degree_sum"),
        floorDiv((lit(4).cast(dec) * col("m") *
          coalesce(col("internal_edges"), lit(0L)).cast(dec) -
          col("degree_sum").cast(dec) * col("degree_sum").cast(dec)) *
          lit(1000000L).cast(dec),
          lit(4).cast(dec) * col("m") * col("m")).as("contrib_ppm"))
      .orderBy(col("community"))
  }

  /** Cross-community (bridge) pairs: the edges whose endpoints land
    * in DIFFERENT [[labelPropagation]] communities — precisely the
    * "accidental bridge" candidates that make one connected component
    * out of two near-dup blobs (the [[modularity]] story made
    * actionable: review/cut these pairs before deleting by
    * component). One pair set checkpoint feeding the LPA rounds and
    * two label join-backs.
    *
    * @return `(id_a, id_b, community_a, community_b)` ordered
    */
  def bridgePairs(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", iters: Int = 3): DataFrame = {
    val p = pairs.transform(graft.Materialize.barrier)
    val e = edges(p, aCol, bCol)
    val lab = labelPropagation(p, aCol, bCol, iters)
      .transform(graft.Materialize.barrier)
    e.join(lab.select(col("node").as("a"),
        col("community").as("community_a")), Seq("a"))
      .join(lab.select(col("node").as("b"),
        col("community").as("community_b")), Seq("b"))
      .filter(col("community_a") =!= col("community_b"))
      .select(col("a").as(aCol), col("b").as(bCol),
        col("community_a"), col("community_b"))
      .orderBy(col(aCol), col(bCol))
  }

  /** Bridge-cut re-clustering — the near-dup hygiene loop closed:
    * drop the cross-community ([[bridgePairs]]) edges from the pair
    * graph, then re-cluster what remains with the DataFrame
    * large-star/small-star closure ([[Dedup.clusters]]). The result
    * is the DELETE-BY-COMMUNITY grouping: two near-dup blobs fused
    * into one component by an accidental bridge come back as two
    * clusters, while genuinely dense groups keep their component.
    * Nodes isolated by the cut (every incident edge was a bridge)
    * cluster as themselves, so every node of the ORIGINAL pair graph
    * appears exactly once.
    *
    * Scale shape: one pair-set checkpoint feeds the LPA rounds, the
    * two label join-backs and the closure seed; the closure itself is
    * the proven star-forest alternation (AQE-planned hash joins, no
    * collect). The final size join-back is a hash rollup on the
    * cluster key.
    *
    * @return `(node, cluster, cluster_size)` ordered by node, with
    *         `cluster` the component-minimum id after the cut
    */
  def cutBridges(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", iters: Int = 3): DataFrame = {
    val p = pairs.transform(graft.Materialize.barrier)
    val e = edges(p, aCol, bCol).transform(graft.Materialize.barrier)
    val lab = labelPropagation(p, aCol, bCol, iters)
      .transform(graft.Materialize.barrier)
    val kept = e
      .join(lab.select(col("node").as("a"), col("community").as("la")),
        Seq("a"))
      .join(lab.select(col("node").as("b"), col("community").as("lb")),
        Seq("b"))
      .filter(col("la") === col("lb"))
      .select(col("a"), col("b"))
    val cl = Dedup.clusters(kept, "a", "b")
    val verts = e.select(col("a").as("node"))
      .unionAll(e.select(col("b").as("node"))).distinct()
    val full = verts
      .join(cl.select(col("doc_id").as("node"), col("cluster")),
        Seq("node"), "left_outer")
      .select(col("node"),
        coalesce(col("cluster"), col("node")).as("cluster"))
      .transform(graft.Materialize.barrier)
    val sizes = full.groupBy(col("cluster"))
      .agg(count(lit(1)).as("cluster_size"))
    full.join(sizes, Seq("cluster"))
      .select(col("node"), col("cluster"), col("cluster_size"))
      .orderBy(col("node"))
  }

  /** Connected-component SIZE distribution: how many components have
    * each member count — the dedup-graph health histogram (a giant
    * component is a shingle storm; healthy near-dup graphs are
    * dominated by 2s and 3s). Rides [[Dedup.clusters]]' DataFrame
    * large-star/small-star closure plus two hash aggregates.
    *
    * @return `(size, n_components)` ordered by size
    */
  def componentSizes(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b"): DataFrame =
    Dedup.clusters(pairs, aCol, bCol)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("size"))
      .groupBy(col("size"))
      .agg(count(lit(1)).as("n_components"))
      .orderBy(col("size"))
}
