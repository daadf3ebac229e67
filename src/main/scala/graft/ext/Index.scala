package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted-index construction — the IR-side consumer of a curated
  * corpus (search/retrieval over the training set, deduplication
  * forensics, RAG stores all start here).
  *
  * Shape: one (term, doc) partial-aggregated shuffle builds the
  * posting rows, one term-keyed aggregation builds the lists. The
  * full posting list of a stop-grade term is corpus-sized, so the
  * operator never materializes it: per term it keeps the document
  * frequency, the collection frequency, and a bounded CHAMPION LIST
  * (the top `k` postings by term frequency — the impact-ordered
  * prefix classic IR keeps hot in memory; Manning et al., IIR §7.1.3).
  * The bound rides INSIDE the aggregation — the native
  * [[graft.functions.TopKAgg]] keeps ≤ k (tf, doc) pairs per partial,
  * so shuffle and reducer memory stay O(terms · k) even for a term
  * present in every document; nothing ever collects a full posting
  * list or sorts the posting stream.
  *
  * At 100 TB the posting rows themselves would additionally be
  * hash-sharded by term ([[graft.io.JsonLines.writeSharded]] /
  * [[graft.io.Buckets]]) to make term lookups single-shard; the
  * champion build here is that pipeline's final aggregation stage.
  */
object Index {

  /** Champion-list inverted index over whitespace tokens.
    *
    * Returns one row per term: `(term, df, cf, champions)` where
    * `df` = number of docs containing the term, `cf` = total
    * occurrences, and `champions` = the `k` highest-tf postings as
    * `"doc:tf"` joined by `";"` — ordered by (tf desc, doc asc), a
    * total order, so the list is engine-deterministic. */
  def championIndex(df: DataFrame, id: String, text: String,
                    k: Int): DataFrame = {
    require(k >= 1, s"championIndex needs k >= 1, got $k")
    val toks = filter(split(col(text), " "), t => t =!= "")
    val postings = df
      .select(col(id).as("doc"), explode(toks).as("term"))
      .groupBy("term", "doc").agg(count(lit(1)).as("tf"))
    postings
      .groupBy("term")
      .agg(
        count(lit(1)).as("df"),
        sum(col("tf")).as("cf"),
        graft.functions.TopKAgg.topk(col("tf"), col("doc"), k).as("top"))
      .select(col("term"), col("df"), col("cf"),
        concat_ws(";", transform(col("top"),
          s => concat(s("id").cast("string"), lit(":"),
            s("v").cast("long").cast("string")))).as("champions"))
  }
}
