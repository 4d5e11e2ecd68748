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
  * enumeration is the two-join ordered-wedge plan (Suri & Vassilvitskii
  * 2011, "Counting Triangles and the Curse of the Last Reducer" —
  * ordering by id bounds each wedge pivot's fan-out to its
  * HIGHER-id neighbors), and a skewed hub is an ordinary hot join key
  * under AQE. Nothing is quadratic in nodes; all joins key on node
  * ids.
  */
object GraphOps {

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

  /** All triangles `(a, b, c)` with `a < b < c`: wedge join
    * `e(a,b) ⋈ e(b,c)` then the closing-edge probe `e(a,c)` — two
    * hash joins on node ids, each triangle emitted exactly once.
    *
    * @return `(a, b, c)` ordered rows
    */
  def triangles(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b"): DataFrame = {
    val e = edges(pairs, aCol, bCol)
    val wedges = e.select(col("a"), col("b"))
      .join(e.select(col("a").as("b"), col("b").as("c")), Seq("b"))
    wedges
      .join(e.select(col("a"), col("b").as("c")), Seq("a", "c"),
        "left_semi")
      .select(col("a"), col("b"), col("c"))
      .orderBy(col("a"), col("b"), col("c"))
  }

  /** Degree histogram: how many nodes have each degree — the one-line
    * shape check (dedup graphs should be near-degree-1; a heavy tail
    * is a shingle storm). Two hash aggregates.
    *
    * @return `(degree, n_nodes)` ordered by degree
    */
  def degreeDistribution(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b"): DataFrame = {
    val e = edges(pairs, aCol, bCol)
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
    val e = edges(pairs, aCol, bCol)
    val deg = e.select(col("a").as("node"))
      .unionAll(e.select(col("b").as("node")))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("degree"))
    val triPerNode = triangles(pairs, aCol, bCol)
      .select(explode(array(col("a"), col("b"), col("c")))
        .as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("triangles"))
    deg.filter(col("degree") >= 2)
      .join(triPerNode, Seq("node"), "left_outer")
      .select(col("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .select(col("node"), col("degree"), col("triangles"),
        intDiv(col("triangles") * lit(2000000L),
          col("degree") * (col("degree") - 1L)).as("cc_ppm"))
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
