package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over document-relation graphs (near-dup
  * candidates, shared-phrase co-occurrence, citation-style links). The
  * family's invariant: per iteration the work is O(edges) with shuffles
  * carrying only (long id, long value) rows — the Pregel shape — and
  * lineage is truncated every round with `localCheckpoint` (the same
  * discipline [[Dedup.connectedComponents]] follows), so a 10-iteration
  * run does not compile a 10-deep plan.
  */
object GraphOps {

  /** PageRank over an UNDIRECTED pair list in q6 fixed-point arithmetic —
    * used to rank documents by centrality in the shared-rare-phrase graph
    * ([[Dedup.rareShingleCandidatePairs]]): high-centrality docs share rare
    * phrases with many other documents, which at corpus scale is the
    * signature of template/boilerplate hubs and mass near-translations —
    * exactly the documents a curation pass inspects first. Also the
    * canonical-pick signal inside a duplicate component (most-central
    * member, vs [[Dedup.bestSurvivors]]' quality-argmax).
    *
    * Semantics (fixed, engine-portable): nodes = endpoints of `pairs`
    * (degree ≥ 1 by construction — no dangling mass); rank and all
    * intermediates are q6 micro-units on longs with FLOOR division
    * (`div`), so every engine computes bit-identical ranks:
    * r_0 = 1e6 div N;
    * r_{t+1}(v) = (1e6−damp·1e4) div N + Σ_{u~v} (damp·r_t(u)) div (100·deg(u)).
    * Quantization drops ≤1 micro-unit per edge per round (display is
    * round4, far above the error), in exchange for exact cross-engine
    * reproducibility — the same trade every q6 gate in this engine makes.
    *
    * Scale shape: degree table and adjacency are built ONCE and
    * checkpointed; each iteration is one O(edges) join on `src` (both
    * sides hash-partitioned on the same key) and one aggregate on `dst`
    * carrying (long, long) rows; ranks localCheckpoint per round. At
    * 100 TB with a df-capped candidate graph, edges ≪ corpus² and the
    * iteration cost is bounded by the candidate volume, never the corpus.
    *
    * Output: (doc_id, degree, pr_q6, pagerank) — `pr_q6` the exact
    * fixed-point rank, `pagerank` its round4 display value. */
  def quantizedPageRank(pairs: DataFrame, aCol: String, bCol: String,
      iterations: Int = 5, dampingPct: Int = 85): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be in [0,100], got $dampingPct")
    val sym = pairs.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .union(pairs.select(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst")))
    val deg = sym.groupBy("src").agg(count(lit(1)).as("deg")).localCheckpoint()
    val n = deg.count()
    require(n > 0, "pairs must contain at least one edge")
    val adj = sym.join(deg, "src").localCheckpoint()
    val baseQ6 = (1000000L - dampingPct * 10000L) / n
    var ranks = deg.select(col("src").as("id"), lit(1000000L / n).as("r"))
    for (_ <- 1 to iterations) {
      val contrib = adj.join(ranks, adj("src") === ranks("id"))
        .select(col("dst"), expr(s"($dampingPct * r) div (100 * deg)").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("c"))
      ranks = deg.select(col("src").as("id"))
        .join(contrib, col("id") === col("dst"), "left")
        .select(col("id"), (lit(baseQ6) + coalesce(col("c"), lit(0L))).as("r"))
        .localCheckpoint()
    }
    ranks.join(deg, ranks("id") === deg("src"))
      .select(col("id").as("doc_id"), col("deg").as("degree"), col("r").as("pr_q6"),
        (floor(col("r").cast("double") / lit(100.0) + lit(0.5)) / lit(10000.0))
          .as("pagerank"))
  }
}
