package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column, engineered for
  * exactness: coordinates are quantized to integers up front
  * (`round(v·2²⁰) + 2²¹` — every step exact in IEEE double, the shift
  * makes all values non-negative so truncating integer division is
  * engine-portable), and from there assignment distances, centroid
  * sums, and the round-half-up centroid update are pure int64
  * arithmetic. No floating-point reduction ever happens across a
  * shuffle, so the result is deterministic under any partitioning and
  * reproducible bit-for-bit in the DuckDB oracle (x23).
  *
  * Shape at 100 TB: each assignment round is a broadcast of the k
  * centroid rows against the corpus (the MLlib shape — centroids are
  * algorithm state, k·dim values), a narrow zip_with/aggregate distance
  * fold, and a min(struct) argmin; each update round is one
  * posexplode + (cluster, pos)-keyed sum — map-side-combined, k·dim
  * result rows. The corpus never self-joins and never shuffles on
  * anything wider than (cluster, pos).
  */
object KMeans {

  /** Exact integer quantization of a float/double embedding:
    * round-half-up of v·2²⁰, shifted by +2²¹ into non-negative range
    * (float→double is exact, ·2²⁰ is exact scaling by a power of two,
    * floor(x+0.5) is exact, and |v| < 2 keeps everything far inside
    * the 53-bit mantissa). */
  def quantize(emb: Column): Column =
    transform(emb, v => floor(v.cast("double") * 1048576d + 0.5d).cast("long")
      + lit(2097152L))

  /** One assignment round: nearest centroid by exact integer L2, ties
    * to the lowest cluster id via min(struct(dist, cid)). */
  private def assign(q: DataFrame, idCol: String, centroids: DataFrame): DataFrame =
    q.crossJoin(broadcast(centroids))
      .select(col(idCol), col("cid"),
        aggregate(zip_with(col("u"), col("c"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x).as("dist"))
      .groupBy(idCol)
      .agg(min(struct(col("dist"), col("cid"))).as("m"))
      .select(col(idCol), col("m.cid").as("cluster"), col("m.dist").as("dist"))

  /** One update round: per-(cluster, position) integer sums, centroid
    * coordinate = round-half-up mean (`(2s+n) div (2n)` — exact on the
    * non-negative quantized domain), reassembled into an array via an
    * order-restoring sort (collect order is free; pos is unique). */
  private def update(q: DataFrame, idCol: String, assigned: DataFrame): DataFrame =
    q.join(assigned.select(col(idCol), col("cluster").as("cid")), idCol)
      .select(col("cid"), posexplode(col("u")).as(Seq("pos", "x")))
      .groupBy("cid", "pos")
      .agg(sum("x").as("s"), count(lit(1)).as("n"))
      .select(col("cid"), col("pos"), expr("(2*s + n) DIV (2*n)").as("cx"))
      .groupBy("cid")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cx")))),
        e => e.getField("cx")).as("c"))

  /** The shared Lloyd schedule: initial centroids are the vectors with
    * the k lowest ids (a deterministic, data-defined seed); `rounds`
    * assignment rounds with a centroid update between consecutive
    * rounds. Returns BOTH lazy frames — the codebook the final
    * assignment round used, and that assignment. */
  private def run(vecs: DataFrame, idCol: String, embCol: String,
                  k: Int, rounds: Int): (DataFrame, DataFrame) = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val q = vecs.select(col(idCol), quantize(col(embCol)).as("u"))
    // the k lowest ids regardless of the id space (a TakeOrdered of k
    // rows, not an `id < k` guess that breaks for 1-based or sparse
    // ids), numbered 0..k-1 in id order — a k-row local window
    var centroids = q.orderBy(col(idCol).asc).limit(k)
      .select((org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col(idCol).asc)) - 1)
          .as("cid"),
        col("u").as("c"))
    var assigned = assign(q, idCol, centroids)
    for (_ <- 2 to rounds) {
      centroids = update(q, idCol, assigned)
      assigned = assign(q, idCol, centroids)
    }
    (centroids, assigned)
  }

  /** Lloyd's iterations — returns the final (id, cluster, dist)
    * assignment, `dist` in exact quantized-integer units. */
  def lloyd(vecs: DataFrame, idCol: String, embCol: String,
            k: Int, rounds: Int): DataFrame =
    run(vecs, idCol, embCol, k, rounds)._2

  /** The FITTED quantized codebook `(cid, c)` — exactly the centroids
    * [[lloyd]]'s final assignment round scores against, so
    * `assignTo(vecs, …, fit(vecs, …, k, rounds))` reproduces
    * `lloyd(vecs, …, k, rounds)` bit-for-bit. This is the trained
    * codebook that drops into the IVF paths
    * ([[Similarity.ivfTopKTrained]]); clusters that lost every member
    * during training are absent (the consumer indexes cells
    * positionally). */
  def fit(vecs: DataFrame, idCol: String, embCol: String,
          k: Int, rounds: Int): DataFrame =
    run(vecs, idCol, embCol, k, rounds)._1

  /** Assign vectors to their nearest centroid (exact integer L2, ties
    * to the lowest cid) from an EXPLICIT codebook `(cid, c)` — the
    * drop-in assignment for a store/corpus that must never be
    * re-trained, only re-scored. */
  def assignTo(vecs: DataFrame, idCol: String, embCol: String,
               centroids: DataFrame): DataFrame =
    assign(vecs.select(col(idCol), quantize(col(embCol)).as("u")),
      idCol, centroids)
}
