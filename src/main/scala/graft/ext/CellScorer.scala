package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Coarse-quantizer seam shared by the IVF paths ([[Similarity.ivfTopK]]
  * family and [[VectorStore]]): a codebook is, to the engine, just three
  * things — a per-row argbest cell assignment (the corpus/store-side
  * cost that scales), a per-cell score array for query-side probe
  * ranking, and the direction in which scores rank cells. Both
  * implementations are codegen'd Catalyst expressions whose plan size is
  * independent of k, and both keep the bit-exact, engine-portable
  * arithmetic their oracles replay.
  *
  * [[LcgCellScorer]] — the deterministic LCG codebook
  * ([[graft.functions.NearestCentroid]] / [[Similarity.centroidScores]]):
  * zero training cost, available before any data exists.
  * [[TrainedCellScorer]] — fitted k-means centroids
  * ([[KMeans.fit]], quantized-integer domain, scored by
  * [[graft.functions.TrainedNearestCell]]/[[graft.functions.TrainedCellDists]]):
  * cells shaped by the data, which buys recall at the same probe budget
  * (RecallSpec pins 0.744 vs 0.400 recall@5 on the checked corpus).
  */
sealed trait CellScorer {
  /** Number of cells (positional ids `0 until nCells`). */
  def nCells: Int
  /** Argbest cell of an embedding — ties to the lowest cell id. */
  def cell(emb: Column): Column
  /** The `min(nProbe, nCells)` best cells, best-first, ties to the
    * lowest cell id — probe generation as ONE codegen'd expression
    * ([[graft.functions.TrainedTopCells]] /
    * [[graft.functions.LcgTopCells]]): O(k·dim) compute and O(nProbe)
    * output rows per vector, no k-wide explode, no Window, no Exchange
    * — the formulation every probe path uses (the shard side of
    * [[VectorStore.dedupAgainstStoreWith]] is the one that scales).
    * Selection is order-identical to ranking [[cellScores]] by
    * ([[probeRank]] asc, cell asc) — the parity spec pins it. */
  def topCells(emb: Column, nProbe: Int): Column
  /** Per-cell score array (index = cell id) — the readable semantic
    * spec of [[topCells]]'s ranking and the parity-test reference;
    * probe paths use [[topCells]]. */
  def cellScores(emb: Column): Column
  /** A column whose ASCENDING order ranks cells best-first. NaN scores
    * (non-finite embeddings — out of contract upstream) rank LAST on
    * the LCG path (`negate` maps NaN to NaN, which Spark sorts
    * largest), matching [[topCells]]'s NaN-never-beats rule. */
  def probeRank(score: Column): Column
}

/** The deterministic LCG codebook: cell score = dot(v, c_k)/‖c_k‖
  * (higher is better), assignment via the codegen'd
  * [[graft.functions.NearestCentroid]]. */
final case class LcgCellScorer(nCentroids: Int, dim: Int, seedOffset: Long)
    extends CellScorer {
  def nCells: Int = nCentroids
  def cell(emb: Column): Column =
    graft.functions.NearestCentroid(emb, nCentroids, dim, seedOffset)
  def topCells(emb: Column, nProbe: Int): Column =
    graft.functions.LcgTopCells(emb, nCentroids, dim, seedOffset, nProbe)
  def cellScores(emb: Column): Column =
    Similarity.centroidScores(emb, nCentroids, dim, seedOffset)
  def probeRank(score: Column): Column = negate(score) // higher = better
}

/** A trained k-means codebook ([[KMeans.fit]]'s `(cid, c)` rows,
  * collected to k·dim quantized longs of driver-side algorithm state —
  * the [[KMeans]] broadcast convention): cell score = exact integer
  * squared L2 in the quantized domain (lower is better). Cells are
  * indexed POSITIONALLY in `cid` order (training may drop empty
  * clusters); `cid` order and positional order coincide, so rankings and
  * tie-breaks are order-isomorphic with the training cids. */
final case class TrainedCellScorer(cents: Array[Long], dim: Int)
    extends CellScorer {
  require(cents.nonEmpty && cents.length % dim == 0,
    s"codebook size ${cents.length} is not a multiple of dim $dim")
  def nCells: Int = cents.length / dim
  def cell(emb: Column): Column =
    graft.functions.TrainedNearestCell(emb, cents, dim)
  def topCells(emb: Column, nProbe: Int): Column =
    graft.functions.TrainedTopCells(emb, cents, dim, nProbe)
  def cellScores(emb: Column): Column =
    graft.functions.TrainedCellDists(emb, cents, dim)
  def probeRank(score: Column): Column = score // lower = better
}

object TrainedCellScorer {
  /** Collect a [[KMeans.fit]] codebook frame `(cid, c)` into a scorer.
    * k·dim longs of driver state; cells indexed positionally in `cid`
    * order. */
  def fromCodebook(codebook: DataFrame): TrainedCellScorer = {
    val rows = codebook.orderBy("cid").collect()
    require(rows.nonEmpty, "empty codebook")
    val dim = rows.head.getSeq[Long](rows.head.fieldIndex("c")).length
    val flat = rows.flatMap(r => r.getSeq[Long](r.fieldIndex("c"))).toArray
    TrainedCellScorer(flat, dim)
  }
}
