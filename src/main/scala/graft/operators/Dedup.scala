package graft.operators

import graft.Tables
import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents` / `embeddings` tables —
  * the LLM-training-data pipeline surface (BASELINE.json north star).
  *
  * Every algorithm is expressed as a shuffle-conscious DataFrame plan:
  *   - exact dedup: one hash-shuffle on the content digest;
  *   - MinHash-LSH: linear signature pass (custom one-pass Catalyst
  *     expression), then a self-join keyed on (band, band-hash) — shuffle
  *     volume is #docs × #bands rows of 24 bytes, never the text;
  *   - SimHash: 64-bit sketch + pigeonhole banding (4×16 bits) so any pair
  *     within Hamming distance 3 shares at least one exact band key;
  *   - n-gram Jaccard: inverted-index join with a document-frequency cap
  *     (stop-shingle removal) — the standard skew guard: without it one
  *     ubiquitous shingle produces a quadratic bucket at 100 TB;
  *   - embedding near-dup: random-hyperplane LSH banding, exact cosine
  *     only on bucket collisions.
  * None of them collect to the driver; all scale by adding partitions.
  */
object Dedup {

  private def docs(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    // shingles are 64-bit hashes of word 3-grams, computed in one pass by
    // a custom expression — shingle strings never materialize, so both the
    // signature pass and the inverted-index shuffle move 8 bytes per
    // shingle regardless of text size
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text"))
      .withColumn("toks", split(lower(col("text")), "\\s+"))
      .withColumn("shingles", expr("shingle_hashes(toks, 3)"))
  }

  import OracleRound.stableRound

  /** MinHash-LSH candidate pairs with estimated Jaccard ≥ threshold —
    * shared by the pair query (d02) and the clustering query (d06). */
  private[operators] def minhashPairs(s: SparkSession, dir: String, threshold: Double): DataFrame = {
    val d = docs(s, dir)
      .withColumn("sig", expr("minhash_sig(shingles, 64)"))
      .select(col("doc_id"), col("sig"))
    d.persist()
    val bands = d.select(
      col("doc_id"),
      posexplode(expr("transform(sequence(0, 15), b -> xxhash64(slice(sig, b*4+1, 4)))"))
        .as(Seq("band", "bh")))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    val sa = d.select(col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val sb = d.select(col("doc_id").as("id_b"), col("sig").as("sig_b"))
    cand.join(sa, "id_a").join(sb, "id_b")
      .withColumn("est_jaccard", stableRound(
        expr("aggregate(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v)")
          .cast("double") / 64.0, 4))
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
  }

  val queries: Seq[NamedQuery] = Seq(

    // exact dedup: keep the smallest doc_id per distinct content. Grouping
    // key is the 256-bit digest, not the text, so the shuffle carries 32
    // bytes per row regardless of document size.
    NamedQuery(
      "d01_dedup_exact",
      Some("SELECT min(doc_id) AS doc_id FROM documents GROUP BY text ORDER BY doc_id"),
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .groupBy(sha2(col("text"), 256))
          .agg(min(col("doc_id")).as("doc_id"))
          .select(col("doc_id"))
          .orderBy(col("doc_id"))),

    // MinHash (k=64) + LSH banding (16 bands × 4 rows): candidate pairs
    // share a band; signature agreement estimates Jaccard.
    NamedQuery(
      "d02_dedup_minhash",
      None,
      (s, dir) =>
        minhashPairs(s, dir, 0.35).orderBy(col("id_a"), col("id_b"))),

    // near-dup CLUSTERS: connected components over the MinHash pair graph
    // via iterative min-label propagation (5 synchronous rounds — dup
    // clusters have tiny diameter). Each round is one join + one
    // aggregation; at 100 TB this is the standard Pregel-style pattern,
    // with no driver-side graph state. Output: member → cluster
    // representative (= smallest doc_id in the component).
    NamedQuery(
      "d06_dedup_clusters",
      None,
      (s, dir) => {
        val pairs = minhashPairs(s, dir, 0.35).select(col("id_a"), col("id_b"))
        // materialize once and truncate lineage: iterative plans otherwise
        // recompute every prior round (and the whole LSH pipeline) per
        // iteration — the standard Pregel-in-DataFrames requirement
        val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
          .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
          .localCheckpoint()
        var labels = edges.select(col("src").as("id")).distinct()
          .withColumn("label", col("id"))
        for (_ <- 1 to 5) {
          val msgs = edges.join(labels, edges("dst") === labels("id"))
            .select(edges("src").as("id"), col("label"))
          labels = labels.unionByName(msgs)
            .groupBy(col("id")).agg(min(col("label")).as("label"))
            .localCheckpoint()
        }
        labels
          .select(col("id").as("doc_id"), col("label").as("cluster_rep"))
          .filter(col("doc_id") =!= col("cluster_rep"))
          .orderBy(col("cluster_rep"), col("doc_id"))
      }),

    // SimHash near-dup: pairs within Hamming distance 3 of the 64-bit
    // sketch; 4 bands of 16 bits guarantee a shared band key (pigeonhole).
    NamedQuery(
      "d03_dedup_simhash",
      None,
      (s, dir) => {
        val d = docs(s, dir)
          .withColumn("sim", expr("simhash64(toks)"))
          .select(col("doc_id"), col("sim"))
        val bands = d.select(
          col("doc_id"), col("sim"),
          posexplode(expr("transform(sequence(0, 3), b -> shiftright(sim, b*16) & 65535)"))
            .as(Seq("band", "bucket")))
        bands.as("a")
          .join(bands.as("b"),
            col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
            expr("bit_count(a.sim ^ b.sim)").as("hamming"))
          .filter(col("hamming") <= 3)
          .distinct()
          .orderBy(col("id_a"), col("id_b"))
      }),

    // exact n-gram Jaccard via inverted-index join. Shingles above the
    // doc-frequency cap are dropped on BOTH sides of the ratio (numerator
    // co-counts and per-doc set sizes), so the measure stays consistent:
    // "Jaccard over discriminative shingles". The cap is the skew guard —
    // at 100 TB one ubiquitous shingle would otherwise create a quadratic
    // join bucket; Σ C(df, 2) with df ≤ 50 is linear in corpus size.
    NamedQuery(
      "d04_dedup_ngram",
      None,
      (s, dir) => {
        val d = docs(s, dir)
        val sh = d.select(col("doc_id"), explode(col("shingles")).as("shingle"))
        val rare = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= 50)
        val filtered = sh.join(rare, "shingle").select(col("doc_id"), col("shingle"))
        filtered.persist()
        val co = filtered.as("a")
          .join(filtered.as("b"),
            col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
          .agg(count(lit(1)).as("co"))
        val sizes = filtered.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
        co.join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
          .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
          .withColumn("jaccard",
            stableRound(col("co").cast("double") / (col("sz_a") + col("sz_b") - col("co")), 4))
          .filter(col("jaccard") >= 0.4)
          .select(col("id_a"), col("id_b"), col("jaccard"))
          .orderBy(col("id_a"), col("id_b"))
      }),

    // embedding near-dup: 60-bit hyperplane signature split into 5 bands of
    // 12 bits; a random pair collides with p ≈ 5/4096, so the candidate set
    // is linear-ish in corpus size while sign-correlated (near-dup) pairs
    // collide with high probability. Candidates travel as id pairs only —
    // the vectors are joined back AFTER dedup, and exact cosine runs on the
    // small candidate set. Output: top-20 most-similar candidate pairs.
    NamedQuery(
      "d05_dedup_embedding",
      None,
      (s, dir) => {
        GraftFunctions.register(s)
        val e = Tables.load(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"),
            expr("hyperplane_sig(embedding, 60)").as("sig"))
        val bands = e.select(
          col("vec_id"),
          posexplode(expr("transform(sequence(0, 4), b -> shiftright(sig, b*12) & 4095)"))
            .as(Seq("band", "bucket")))
        val cand = bands.as("a")
          .join(bands.as("b"),
            col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
              col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
          .distinct()
        val ea = e.select(col("vec_id").as("id_a"), col("embedding").as("a_emb"))
        val eb = e.select(col("vec_id").as("id_b"), col("embedding").as("b_emb"))
        val dot = "aggregate(zip_with(a_emb, b_emb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)"
        val na = "sqrt(aggregate(a_emb, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
        val nb = "sqrt(aggregate(b_emb, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
        cand.join(ea, "id_a").join(eb, "id_b")
          .withColumn("cos_sim", stableRound(expr(s"$dot / ($na * $nb)"), 4))
          .select(col("id_a"), col("id_b"), col("cos_sim"))
          .orderBy(col("cos_sim").desc, col("id_a"), col("id_b"))
          .limit(20)
      })
  )
}
