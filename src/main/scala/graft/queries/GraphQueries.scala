package graft.queries

import org.apache.spark.sql.functions._

import QueryDsl._
import graft.pipeline.Graph

/** Iterative link-graph operators (corpus quality weighting by graph
  * centrality — the host-PageRank signal used by web-scale training
  * pipelines). The demonstration graph links suppliers co-occurring in
  * an order; ranks are fixed-point BIGINTs so the 10-iteration result
  * is hash-exact against DuckDB's unrolled-CTE replay of the same
  * integer recurrence (see [[graft.pipeline.Graph]]).
  */
object GraphQueries {

  val entries: List[(String, Q, Option[String])] = List(

    // ---- PageRank over the supplier co-occurrence graph: 10
    // synchronous iterations, damping 0.85, integer fixed-point — the
    // iterative-join counterpart of Dedup.dedupGroups' pointer jumping
    // (that one converges on a predicate; this one runs a fixed
    // recurrence). One shuffle per side per iteration, O(|E|). --------
    ("q119_pagerank",
      (s, dir) => {
        val ranks = Graph.pagerank(Graph.supplierCooccurrence(t(s, dir, "lineitem")), iters = 10)
        ranks.select(col("v").as("s_suppkey"), col("rank").as("rank_scaled"))
          .orderBy(col("rank_scaled").desc, col("s_suppkey"))
      },
      Some(Graph.pagerankOracleSql(iters = 10))),

    // ---- personalized PageRank / TrustRank: the walk teleports only
    // to a SEED set (every 10th supplier id — standing in for curated
    // trusted domains), so rank measures proximity to the seeds — the
    // quality-propagation signal web-scale pipelines use to weight
    // hosts by distance from a trusted core. Same integer fixed-point
    // machinery as q119; seed-conditional base term. -----------------
    ("q130_trustrank",
      (s, dir) => {
        val ranks = Graph.personalizedPagerank(
          Graph.supplierCooccurrence(t(s, dir, "lineitem")),
          isSeed = v => pmod(v, lit(10)) === 0, iters = 10)
        ranks.select(col("v").as("s_suppkey"), col("rank").as("trust_scaled"))
          .orderBy(col("trust_scaled").desc, col("s_suppkey"))
      },
      Some(Graph.personalizedPagerankOracleSql(seedMod = 10, iters = 10))),

    // ---- per-node triangle counts (clustering-coefficient numerator)
    // over the STRONG-TIE graph (co-occurrence weight >= 8 — weak
    // single-co-occurrence ties make the demo graph near-complete and
    // triangle counting on a complete graph is inherently cubic; real
    // link graphs are sparse, and the strong-tie filter is the
    // standard densification guard): canonical a<b edges, wedge self-
    // join on the middle vertex, semi-join close — each triangle
    // found once, fanned to its 3 corners ----------------------------
    ("q125_triangles",
      (s, dir) => {
        val strong = Graph.supplierCooccurrence(t(s, dir, "lineitem"))
          .filter(col("w") >= 8)
        Graph.triangleCounts(strong)
          .select(col("v").as("s_suppkey"), col("n_triangles"))
          .orderBy(col("n_triangles").desc, col("s_suppkey"))
      },
      Some(Graph.triangleCountsOracleSql(minW = 8))),

    // ---- bounded-radius harmonic centrality (Σ 1/d, d ≤ 3) on the
    // strong-tie graph: multi-source BFS with first-distance-wins
    // anti joins, 1/d on the 1e6 integer grid — the closeness-family
    // quality signal; the unbounded production variant is HyperBall
    // (per-node HLL counters) ----------------------------------------
    ("q133_harmonic",
      (s, dir) => {
        val strong = Graph.supplierCooccurrence(t(s, dir, "lineitem"))
          .filter(col("w") >= 8)
        Graph.harmonicCentrality(strong, radius = 3)
          .select(col("v").as("s_suppkey"), col("harmonic_q6"), col("n_reached"))
          .orderBy(col("harmonic_q6").desc, col("s_suppkey"))
      },
      Some(Graph.harmonicCentralityOracleSql(minW = 8, radius = 3))),

    // ---- approximate neighborhood function (HyperBall with a KMV
    // bottom-k sketch instead of HLL registers): |ball_r(v)| for
    // r = 1..3 from mergeable bottom-32 sketches — the sketch-state
    // scale path for the centralities q133 computes exactly; every
    // sketch and estimate replays bit-for-bit in DuckDB ---------------
    ("q134_neighborhood",
      (s, dir) => {
        val strong = Graph.supplierCooccurrence(t(s, dir, "lineitem"))
          .filter(col("w") >= 8)
        Graph.neighborhoodFunction(strong, radius = 3, k = 32)
          .select(col("v").as("s_suppkey"), col("r"), col("k_used"),
            col("kth"), col("nb_est"))
          .orderBy(col("r"), col("s_suppkey"))
      },
      Some(Graph.neighborhoodFunctionOracleSql(minW = 8, radius = 3, k = 32))),

    // ---- bounded-hop cheapest paths (min-plus Bellman-Ford rounds)
    // from the same every-10th seed set, cost = 1e6 div w (strong tie
    // = cheap edge): the path-cost sibling of q130's walk-mass signal;
    // integer min-plus is reduction-order-free, hash-exact -----------
    ("q135_cheapest_paths",
      (s, dir) => {
        val strong = Graph.supplierCooccurrence(t(s, dir, "lineitem"))
          .filter(col("w") >= 8)
          .withColumn("cost", expr("1000000 div w"))
        Graph.cheapestPaths(strong, isSeed = v => pmod(v, lit(10)) === 0,
            hops = 4)
          .select(col("v").as("s_suppkey"), col("cost").as("path_cost"))
          .orderBy(col("path_cost"), col("s_suppkey"))
      },
      Some(Graph.cheapestPathsOracleSql(minW = 8, seedMod = 10, hops = 4))),

    // ---- k-core extraction (k = 12 on the w ≥ 28 tie graph — the
    // threshold pair where this near-regular synthetic graph actually
    // has core structure: 63 of 100 nodes survive 7 peel rounds at
    // sf0.01) by iterative peeling: the densest-substructure filter
    // separating organically-linked cores from sparsely-attached
    // tendrils; peeling is confluent, so the fixed-round oracle
    // unroll is exact and the Spark side asserts convergence ----------
    ("q136_kcore",
      (s, dir) => {
        val ties = Graph.supplierCooccurrence(t(s, dir, "lineitem"))
          .filter(col("w") >= 28)
        Graph.kCore(ties, k = 12, maxRounds = 12)
          .select(col("v").as("s_suppkey"), col("core_deg"))
          .orderBy(col("core_deg").desc, col("s_suppkey"))
      },
      Some(Graph.kCoreOracleSql(minW = 28, k = 12, rounds = 12))),

    // ---- community detection: 5 rounds of deterministic synchronous
    // weighted label propagation (min-label ties, fixed rounds) over
    // the strong-tie graph ------------------------------------------
    ("q127_communities",
      (s, dir) => {
        val strong = Graph.supplierCooccurrence(t(s, dir, "lineitem"))
          .filter(col("w") >= 8)
        Graph.labelPropagation(strong, iters = 5)
          .select(col("v").as("s_suppkey"), col("label").cast("long").as("community"))
          .orderBy(col("community"), col("s_suppkey"))
      },
      Some(Graph.labelPropagationOracleSql(minW = 8, iters = 5))),

    // ---- community quality audit: per LPA community, node count,
    // internal edges, degree sum, and the exact integer Newman
    // modularity numerator 4·m·internal − degsum² (denominator 4m²
    // implicit — every emitted number is an exact BIGINT) ------------
    ("q143_modularity",
      (s, dir) => {
        // w >= 30: the co-occurrence graph's community structure only
        // emerges above the background tie weight (18 communities on
        // the sf0.01 graph; the q127 threshold of 8 merges everything
        // into one, which would make this audit vacuous)
        val strong = Graph.supplierCooccurrence(t(s, dir, "lineitem"))
          .filter(col("w") >= 30)
        Graph.communityModularity(strong, iters = 5)
      },
      Some(Graph.communityModularityOracleSql(minW = 30, iters = 5))),

    // ---- local clustering coefficient: exact-rational 2T/(d(d-1))
    // on the 1e6 integer grid, with the (T, d) inputs alongside ------
    ("q128_clustering_coeff",
      (s, dir) => {
        val strong = Graph.supplierCooccurrence(t(s, dir, "lineitem"))
          .filter(col("w") >= 8)
        Graph.clusteringCoefficient(strong)
          .select(col("v").as("s_suppkey"), col("deg"), col("n_triangles"), col("cc_q6"))
          .orderBy(col("s_suppkey"))
      },
      Some(Graph.clusteringCoefficientOracleSql(minW = 8))),

    // ---- link prediction (recommend missing edges): common-neighbour,
    // Jaccard and resource-allocation indices for non-adjacent pairs,
    // wedge-generated with the middle-degree cap that bounds the one
    // inherently hub-quadratic join at 100 TB (cap mirrored in the
    // oracle — it is the operator's contract, not a truncation) ------
    ("q145_link_prediction",
      (s, dir) => {
        // minW = 24: at 8 the demo graph is near-complete (every 2-hop
        // pair is already an edge — zero missing links to predict);
        // 24 leaves ~2.2k edges and ~2.8k non-adjacent candidates
        val strong = Graph.supplierCooccurrence(t(s, dir, "lineitem"))
          .filter(col("w") >= 24)
        Graph.linkPrediction(strong, maxMiddleDegree = 100000L, topK = 100)
      },
      Some(Graph.linkPredictionOracleSql(minW = 24, cap = 100000L, topK = 100))))
}
