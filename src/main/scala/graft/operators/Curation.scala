package graft.operators

import graft.Tables
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

/** Capstone: the full training-data curation pass composed as ONE lazy
  * DataFrame plan — the pipeline a 100 TB pretraining corpus actually
  * runs:
  *
  *   1. quality gate: length / stopword-ratio heuristics;
  *   2. exact dedup: keep the smallest doc_id per content digest;
  *   3. near-dup removal: MinHash-LSH pair graph → connected components →
  *      drop every non-representative member;
  *   4. emit the surviving doc_ids with their quality score.
  *
  * Everything stays declarative, so Catalyst fuses the quality projection
  * into the scan and the three stages share one pass over the text. The
  * anti-joins that realize "drop duplicates/members" are broadcast-able
  * when the drop lists are small (the common case: dup rate ≪ corpus) and
  * degrade gracefully to shuffle joins when not.
  */
object Curation {

  val queries: Seq[NamedQuery] = Seq(
    NamedQuery(
      "p01_pipeline_curation",
      None,
      (s, dir) => {
        GraftFunctions.register(s)
        val docs = Tables.load(s, dir, "documents")

        // 1. quality gate
        val scored = docs
          .withColumn("toks", split(lower(col("text")), "\\s+"))
          .withColumn("n_tokens", size(col("toks")))
          .withColumn("quality",
            least(col("n_tokens") / 50.0, lit(1.0)) * 0.5 +
              expr("size(filter(toks, t -> array_contains(array('the','a','of','to','in','is'), t)))")
                .cast("double") / col("n_tokens") * 0.5)
          .filter(col("n_tokens") >= 5 && col("quality") >= 0.2)

        // 2. exact dedup: smallest doc_id per digest survives
        val exactKeep = scored
          .groupBy(sha2(col("text"), 256).as("digest"))
          .agg(min(col("doc_id")).as("doc_id"))
          .select(col("doc_id"))

        // 3. near-dup components: drop members, keep representatives
        val members = Dedup.minhashPairs(s, dir, 0.5)
          .select(col("id_a"), col("id_b"))
          .select(greatest(col("id_a"), col("id_b")).as("doc_id"))
          .distinct()

        scored.join(exactKeep, "doc_id", "left_semi")
          .join(members, Seq("doc_id"), "left_anti")
          .select(col("doc_id"), OracleRound.stableRound(col("quality"), 4).as("quality"))
          .orderBy(col("doc_id"))
      })
  )
}
