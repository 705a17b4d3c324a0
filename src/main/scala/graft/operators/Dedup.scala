package graft.operators

import graft.Tables
import graft.functions.{GraftFunctions, VectorFunctions}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators — the LLM-training-data pipeline surface
  * (BASELINE.json north star).
  *
  * The public API is DataFrame-first: every operator takes a corpus
  * DataFrame with `(doc_id: long, text: string)` columns (or
  * `(vec_id, embedding)` for the embedding variant) and returns a plan —
  * a user points them at ANY table; the `queries` entries below only bind
  * them to the driver's testdata.
  *
  * Every algorithm is expressed as a shuffle-conscious DataFrame plan:
  *   - exact dedup: one hash-shuffle on the content digest; incremental
  *     admission (new batch vs a persisted digest index) anti-joins
  *     digests so the historical corpus is never re-read;
  *   - MinHash-LSH: linear signature pass (custom one-pass Catalyst
  *     expression), then a self-join keyed on (band, band-hash) — shuffle
  *     volume is #docs × #bands rows of 24 bytes, never the text;
  *   - SimHash: 64-bit sketch + pigeonhole banding (4×16 bits) so any pair
  *     within Hamming distance 3 shares at least one exact band key;
  *   - n-gram Jaccard: grouped inverted index with a document-frequency
  *     cap (stop-shingle removal) — the standard skew guard: without it
  *     one ubiquitous shingle produces a quadratic bucket at 100 TB;
  *   - embedding near-dup: random-hyperplane LSH banding, exact cosine
  *     only on bucket collisions.
  * None of them collect to the driver; all scale by adding partitions.
  */
object Dedup {

  import OracleRound.{stableRound, stableRoundSql}
  import org.apache.spark.sql.{Column, GraftColumnBridge => B}

  /** posexplode-able LSH band arrays as CODEGEN kernels (guide §4): the
    * transform(sequence, shiftright/xxhash64-slice) spellings are
    * CodegenFallback, which exiled every banding Generate from
    * whole-stage codegen — the same interpreted-eval defect class as the
    * r17 t20 stall. Value parity with the SQL spellings is pinned in
    * KernelParitySpec; the d02/d03/d05/d09/d18 oracles replay the values
    * end-to-end. */
  private[operators] def bandBitsCol(c: Column, bands: Int, width: Int): Column =
    B.column(graft.functions.BandBits(B.expression(c), bands, width))
  private def sliceXxBandsCol(c: Column, groups: Int, width: Int): Column =
    B.column(graft.functions.SliceXxBands(B.expression(c), groups, width))

  /** Tokenizes and shingles a `(doc_id, text)` corpus: 64-bit hashes of
    * word n-grams, computed in one pass by a custom expression — shingle
    * strings never materialize, so the signature pass and the
    * inverted-index shuffle move 8 bytes per shingle regardless of text
    * size. */
  def shingled(corpus: DataFrame, n: Int = 3): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    corpus
      .withColumn("toks", split(lower(col("text")), "\\s+"))
      .withColumn("shingles", expr(s"shingle_hashes(toks, $n)"))
  }

  /** Exact dedup: smallest doc_id per distinct content. The grouping key
    * is the 256-bit digest, not the text, so the shuffle carries 32 bytes
    * per row regardless of document size. */
  def exactDedup(corpus: DataFrame): DataFrame =
    corpus
      .groupBy(sha2(col("text"), 256))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))

  /** Incremental exact dedup against a PERSISTED digest index — the
    * admission pattern a growing corpus needs at 100 TB: each new
    * increment is deduplicated WITHOUT re-reading the historical corpus.
    * Stage 1 keeps the first occurrence (min doc_id) of each digest
    * within the increment; stage 2 anti-joins the survivors against the
    * index. Digests travel as raw 32-byte BINARY on the wire (sha2
    * returns 64-char hex — unhexed before the first exchange, re-hexed
    * only on the final output projection), so both stages shuffle
    * (32-byte digest, 8-byte id) rows regardless of document size, and
    * the history side ships only its unhexed digest column. Returns the
    * admitted `(doc_id, digest)` rows, digest in the index's hex-text
    * contract. */
  def incrementalAdmit(increment: DataFrame, index: DataFrame): DataFrame =
    increment
      .select(unhex(sha2(col("text"), 256)).as("dg"), col("doc_id"))
      .groupBy(col("dg"))
      .agg(min(col("doc_id")).as("doc_id"))
      .join(index.select(unhex(col("digest")).as("dg")), Seq("dg"), "left_anti")
      .select(col("doc_id"), lower(hex(col("dg"))).as("digest"))

  /** Digest index of a corpus — what [[incrementalAdmit]] joins against.
    * In production this is a persisted managed table, appended per
    * increment via [[updatedIndex]]; rebuilding it here binds the
    * operator to the driver's testdata. */
  def digestIndex(corpus: DataFrame): DataFrame =
    corpus.select(sha2(col("text"), 256).as("digest")).distinct()

  /** SimHash sketches of a `(doc_id, text)` corpus: one codegen'd pass,
    * 8 bytes per doc. */
  def simSketch(corpus: DataFrame): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    corpus.select(col("doc_id"),
      expr("simhash64(split(lower(text), '\\\\s+'))").as("sim"))
  }

  /** The persisted NEAR-dup index unit: DISTINCT 4×16-bit band rows over
    * the corpus's sketches — `(band, bucket, sim)`, ~20 B/row, ≤4 rows
    * per DISTINCT sketch (clones contribute nothing — a clone-heavy
    * 10¹¹-row history indexes only its distinct sketch set, and the
    * [[incrementalNearAdmit]] probe's join output scales with distinct
    * sketches per bucket, not rows). Appending an increment's admissions
    * is `bandRows(admitted)` with NO re-distinct against history: an
    * admitted sketch sits at Hamming > maxHamming ≥ 1 from every indexed
    * sketch (else it would have been rejected), so equality with an
    * existing index row is impossible, and admitted sketches are distinct
    * among themselves (identical sketches share a cluster, which admits
    * one representative). */
  def bandRows(sketched: DataFrame): DataFrame =
    bandSims(sketched.select(col("sim")).distinct())

  /** Per-DOC band rows `(band, bucket, sim, doc_id)` — the provenance-
    * carrying variant for stores that track which doc contributed a row
    * (the streaming band table). The probe side never needs it: admission
    * is a property of the sketch alone. */
  def docBandRows(sketched: DataFrame): DataFrame =
    sketched.select(col("doc_id"), col("sim"),
      posexplode(bandBitsCol(col("sim"), 4, 16))
        .as(Seq("band", "bucket")))
      .select(col("band").cast("bigint").as("band"), col("bucket"), col("sim"), col("doc_id"))

  /** Bands a relation of (distinct) `sim` sketches: `(band, bucket, sim)`
    * with band 0..3 over 16-bit chunks. */
  private def bandSims(sims: DataFrame): DataFrame =
    sims.select(col("sim"),
      posexplode(bandBitsCol(col("sim"), 4, 16))
        .as(Seq("band", "bucket")))
      .select(col("band").cast("bigint").as("band"), col("bucket"), col("sim"))

  /** Incremental NEAR-dup admission against a PERSISTED band index — the
    * d08 growing-corpus pattern extended from exact to near duplicates:
    * each increment is admitted WITHOUT re-sketching the historical
    * corpus. A doc is rejected when any of its 4 band buckets holds an
    * index sketch within `maxHamming` (the pigeonhole guarantee: Hamming
    * ≤ 3 on 64 bits always shares one exact 16-bit band). Within the
    * increment, survivors cluster by the same band rule over their
    * DISTINCT sketches (clone groups collapse to one banding row — see
    * [[simhashPairs]]) plus connected components, and each cluster
    * admits its min-doc_id representative — the batch d03+d06+p01
    * convention, deterministic and parallel, rather than the
    * order-dependent greedy of a sequential scan.
    *
    * Scale shape: the increment sketches once (8 B/doc); the index probe
    * is a (band, bucket) equi-join of DISTINCT sketch rows on BOTH sides
    * — the index stores distinct `(band, bucket, sim)` by construction
    * ([[bandRows]]) and the increment probes its distinct sketches, so
    * the join output is (distinct increment sketches per bucket) ×
    * (distinct history sketches per bucket): clone-heavy corpora (the
    * common web-scale shape) collapse BEFORE the join, and every
    * exchange carries (band, bucket, sim) rows — text never leaves its
    * scan. Bucket-space verdict for the 10¹¹-DISTINCT-sketch tail: 4
    * bands over 2¹⁶ buckets still average |distinct|/65k history
    * sketches per bucket, so a corpus whose DISTINCT sketch count
    * reaches 10¹¹ wants a 128-bit SimHash with 4×32-bit bands (same
    * Hamming ≤ 3 pigeonhole, 2³² buckets → ~23 sketches/bucket). That
    * variant needs only a wider sketch kernel (two longs) and this same
    * probe; it is NOT wired here because the 64-bit sketch's distinct
    * count saturates far below 10¹¹ on natural text (empirically ~5%
    * distinct at 30× — SCALE_NOTES.md — and 2⁶⁴ sketch space bounds it),
    * making the distinct-probe fix the binding constraint at realistic
    * scale. Returns admitted `(doc_id, sim)` — append
    * `bandRows(admitted)` to the index. */
  def incrementalNearAdmit(increment: DataFrame, bandIndex: DataFrame,
      maxHamming: Int = 3): DataFrame = {
    // one signature pass feeds the probe, the survivor set, and the
    // in-increment clustering
    val sk = simSketch(increment).localCheckpoint()
    // rejection is a property of the SKETCH, not the doc: probe distinct
    // increment sketches against the distinct index, then anti-join docs
    // by sketch — increment clones never reach the probe join
    val rejectedSims = bandSims(sk.select(col("sim")).distinct())
      .join(bandIndex.select(col("band"), col("bucket"), col("sim").as("hsim")),
        Seq("band", "bucket"))
      .filter(expr(s"bit_count(sim ^ hsim) <= $maxHamming"))
      .select(col("sim")).distinct()
    val surv = sk.join(rejectedSims, Seq("sim"), "left_anti")
    // in-increment clustering over DISTINCT sketches; identical-sketch
    // docs share a group without ever generating a pair
    val ds = surv.select(col("sim")).distinct()
    val db = bandSims(ds)
    val simPairs = db.as("a")
      .join(db.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.sim") < col("b.sim"))
      .filter(expr(firstMatchBand("sim", 4, 16)))
      .filter(expr(s"bit_count(a.sim ^ b.sim) <= $maxHamming"))
      .select(col("a.sim").as("id_a"), col("b.sim").as("id_b"))
    val comps = connectedComponents(simPairs)
      .select(col("doc_id").as("sim"), col("cluster_rep").as("grp"))
    val lab = surv.join(comps, Seq("sim"), "left")
      .select(col("doc_id"), col("sim"), coalesce(col("grp"), col("sim")).as("grp"))
    lab.groupBy(col("grp"))
      .agg(min(struct(col("doc_id"), col("sim"))).as("m"))
      .select(col("m.doc_id").as("doc_id"), col("m.sim").as("sim"))
  }

  /** Index after an increment: admitted digests are distinct within the
    * increment AND absent from the index (the anti-join), so the append
    * needs no re-distinct over the enormous historical index. */
  def updatedIndex(index: DataFrame, admitted: DataFrame): DataFrame =
    index.select(col("digest")).unionByName(admitted.select(col("digest")))

  /** SQL predicate keeping a banded self-join row only in the LOWEST
    * agreeing band of a long-typed signature split into `numBands` chunks
    * of `widthBits`: qualifying pairs become unique by construction, so
    * no distinct() pair shuffle is needed. Unrolled to plain bitwise ops
    * on `a.<sigCol>`/`b.<sigCol>` — a higher-order filter/array_min
    * lambda here is interpreted, not codegen'd, and benches 4x slower. */
  private def firstMatchBand(sigCol: String, numBands: Int, widthBits: Int): String = {
    val mask = (1L << widthBits) - 1
    (0 until numBands).map { k =>
      val earlierDiffer = (0 until k).map(j =>
        s"(shiftright(a.$sigCol, ${j * widthBits}) & $mask) != " +
          s"(shiftright(b.$sigCol, ${j * widthBits}) & $mask)")
      (s"a.band = $k" +: earlierDiffer).mkString("(", " AND ", ")")
    }.mkString(" OR ")
  }

  /** MinHash-LSH candidate pairs with estimated Jaccard ≥ threshold
    * (k=64 signature, 16 bands × 4 rows).
    *
    * Banding runs over the DISTINCT signatures (see [[simhashPairs]] for
    * the measured rationale): clone groups collapse to one signature row
    * each, so hot LSH buckets stay quadratic only in distinct members;
    * doc pairs are reconstituted afterwards by joins linear in the
    * output. Same-signature doc pairs are est_jaccard 1.0 by definition
    * (64/64 agreeing minhashes) and come from a grouped self-join. */
  def minhashPairs(corpus: DataFrame, threshold: Double,
      distinctRatio: Option[Double] = None): DataFrame = {
    // localCheckpoint (not persist): materializes the signatures once for
    // the distinct + both expansion sides AND lets the ContextCleaner
    // reclaim the blocks when the plan is no longer referenced —
    // persist() would pin them for the session lifetime
    val d = shingled(corpus)
      .withColumn("sig", expr("minhash_sig(shingles, 64)"))
      .select(col("doc_id"), col("sig"))
      .localCheckpoint()
    // ADAPTIVE banding level (see CorpusStats): on a clone-heavy corpus,
    // band the DISTINCT signatures — clone groups collapse to one banding
    // row, hot LSH buckets stay quadratic only in distinct members, and
    // doc pairs are reconstituted by expansion joins linear in the
    // output. On a mostly-unique corpus, band the docs directly — the
    // distinct pass and the intra-group machinery would collapse nothing
    // and cost two extra exchanges.
    //
    // Both modes run the SAME downstream plan over (dk: doc_id → sid,
    // grouped: sid → banding value, group size): per-doc mode keys rows
    // by doc_id with cnt=1 (the intra self-join below gates to empty);
    // sketch mode keys by the signature's 64-bit xxhash (`sid`) so the
    // pair distinct, both expansion joins, and the intra gate shuffle
    // 8-byte keys, never the 512-byte signature array. A sid collision
    // would merge two distinct signature groups (p ≈ n²/2⁶⁵ over DISTINCT
    // signatures — negligible); exact dedup (d01) stays on sha2-256.
    //
    // The intra (same-signature) pairs come from a self-join gated by the
    // multi-doc sid list: empty on a unique corpus, and it STREAMS a
    // viral clone group where a collect_list(ids) variant would
    // concentrate the whole id list in one row.
    val cloneHeavy =
      distinctRatio.getOrElse(CorpusStats.headDistinctRatio(corpus)) <
        CorpusStats.cloneHeavyBelow
    val (dk, grouped) =
      if (cloneHeavy)
        // the distinct-signature relation is SMALL by construction here
        // (shrunk by the clone factor) and has five consumers below
        // (bands a/b, both sig fetches, the multi filter) — checkpoint it
        // once instead of re-aggregating the signatures per consumer
        (d.select(col("doc_id"), xxhash64(col("sig")).as("sid")),
          d.groupBy(xxhash64(col("sig")).as("sid"))
            .agg(first(col("sig")).as("sig"), count(lit(1)).as("cnt"))
            .localCheckpoint())
      else
        (d.select(col("doc_id"), col("doc_id").as("sid")),
          d.select(col("doc_id").as("sid"), col("sig"), lit(1L).as("cnt")))
    // bands carry ONLY (sid, band, bh) — 24 bytes/row — through the
    // explode and self-join; the 512-byte signature arrays join back
    // AFTER the pair distinct, against the (far smaller) candidate set.
    // Carrying sig through the band join shuffles ~20x the bytes and
    // measured ~+40% on the whole operator in per-doc mode.
    val bands = grouped.select(
      col("sid"),
      posexplode(sliceXxBandsCol(col("sig"), 16, 4))
        .as(Seq("band", "bh")))
    // the candidate set is small, so a plain distinct() on the (sid, sid)
    // pair key is cheaper than carrying lowest-band comparisons through
    // the join filter
    val sigPairs = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.sid") < col("b.sid"))
      .select(col("a.sid").as("sid_a"), col("b.sid").as("sid_b"))
      .distinct()
      .join(grouped.select(col("sid").as("sid_a"), col("sig").as("sig_a")), "sid_a")
      .join(grouped.select(col("sid").as("sid_b"), col("sig").as("sig_b")), "sid_b")
      .select(col("sid_a"), col("sid_b"),
        stableRound(
          B.column(graft.functions.AgreeCount(
            B.expression(col("sig_a")), B.expression(col("sig_b"))))
            .cast("double") / 64.0, 4).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
    val cross = sigPairs
      .join(dk.select(col("doc_id").as("da"), col("sid").as("sid_a")), "sid_a")
      .join(dk.select(col("doc_id").as("db"), col("sid").as("sid_b")), "sid_b")
      .select(least(col("da"), col("db")).as("id_a"),
        greatest(col("da"), col("db")).as("id_b"), col("est_jaccard"))
    val dm = dk.join(grouped.filter(col("cnt") > 1).select(col("sid")), Seq("sid"), "left_semi")
    val intra = dm.as("x")
      .join(dm.as("y"), col("x.sid") === col("y.sid") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        lit(1.0).as("est_jaccard"))
    cross.unionAll(intra)
  }

  /** SimHash near-dup pairs within `maxHamming` of the 64-bit sketch;
    * 4 bands of 16 bits guarantee a shared band key for Hamming ≤ 3
    * (pigeonhole).
    *
    * Banding level is ADAPTIVE (see [[minhashPairs]] / CorpusStats): on a
    * duplicate-heavy corpus every clone group shares one sketch, so
    * doc-level banding explodes hot buckets quadratically in the clone
    * factor (measured 3.2e8 candidate pairs for 1.5e5 docs / 4964
    * sketches at the 30x scale point) while sketch-level banding is
    * quadratic only in DISTINCT bucket members (~3.6e5 candidates on the
    * same data); qualifying sketch pairs expand back to doc pairs through
    * joins linear in the OUTPUT, and Hamming-0 doc pairs come from a
    * gated same-sketch self-join. On a mostly-unique corpus doc-level
    * banding skips the collapse machinery. The sketch IS the 8-byte key,
    * so no hashing is needed in sketch mode. */
  def simhashPairs(corpus: DataFrame, maxHamming: Int = 3,
      distinctRatio: Option[Double] = None): DataFrame = {
    val d = shingled(corpus)
      .withColumn("sim", expr("simhash64(toks)"))
      .select(col("doc_id"), col("sim"))
      .localCheckpoint() // one signature pass feeds sims + both expansion sides
    val cloneHeavy =
      distinctRatio.getOrElse(CorpusStats.headDistinctRatio(corpus)) <
        CorpusStats.cloneHeavyBelow
    val (dk, grouped) =
      if (cloneHeavy)
        (d.select(col("doc_id"), col("sim").as("sid")),
          d.groupBy(col("sim")).agg(count(lit(1)).as("cnt"))
            .select(col("sim").as("sid"), col("sim"), col("cnt")))
      else
        (d.select(col("doc_id"), col("doc_id").as("sid")),
          d.select(col("doc_id").as("sid"), col("sim"), lit(1L).as("cnt")))
    val bands = grouped.select(
      col("sid"), col("sim"),
      posexplode(bandBitsCol(col("sim"), 4, 16))
        .as(Seq("band", "bucket")))
    val simPairs = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.sid") < col("b.sid"))
      .filter(expr(firstMatchBand("sim", 4, 16)))
      .select(col("a.sid").as("sid_a"), col("b.sid").as("sid_b"),
        expr("bit_count(a.sim ^ b.sim)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
    val cross = simPairs
      .join(dk.select(col("doc_id").as("da"), col("sid").as("sid_a")), "sid_a")
      .join(dk.select(col("doc_id").as("db"), col("sid").as("sid_b")), "sid_b")
      .select(least(col("da"), col("db")).as("id_a"),
        greatest(col("da"), col("db")).as("id_b"), col("hamming"))
    val dm = dk.join(grouped.filter(col("cnt") > 1).select(col("sid")), Seq("sid"), "left_semi")
    val intra = dm.as("x")
      .join(dm.as("y"), col("x.sid") === col("y.sid") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        lit(0).cast("int").as("hamming"))
    cross.unionAll(intra)
  }

  /** [[firstMatchBand]] for the 128-bit [hi, lo] sketch: bands 0–1 are
    * lo's 32-bit halves, bands 2–3 hi's. */
  private def firstMatchBand128(numBands: Int): String = {
    def slice(side: String, k: Int): String = {
      val w = if (k < 2) "lo" else "hi"
      s"(shiftright($side.$w, ${(k % 2) * 32}) & 4294967295)"
    }
    (0 until numBands).map { k =>
      val earlierDiffer = (0 until k).map(j => s"${slice("a", j)} != ${slice("b", j)}")
      (s"a.band = $k" +: earlierDiffer).mkString("(", " AND ", ")")
    }.mkString(" OR ")
  }

  /** WIDE-SKETCH SimHash near-dup pairs: [[simhashPairs]] on the 128-bit
    * `simhash128` [hi, lo] sketch with 4 BANDS OF 32 BITS — the same
    * Hamming ≤ 3 pigeonhole (3 differing bits can touch at most 3 of the
    * 4 bands, so one band key always matches exactly) over a 2³² bucket
    * space instead of 2¹⁶. This is the scale path the 64-bit banding's
    * own analysis calls for past ~10¹¹ distinct sketches: with 16-bit
    * bands every bucket holds ≥ n/65536 sketches and band joins go
    * quadratic in that load; 32-bit buckets push the same crossover out
    * by a factor of 65536.
    *
    * Same adaptive sketch-level banding as the 64-bit operator: on
    * clone-heavy corpora banding runs over DISTINCT (hi, lo) sketches
    * (the two longs ARE the group key — no lossy re-hash that could
    * merge distinct sketches), doc pairs reconstitute through joins
    * linear in the output, and same-sketch doc pairs come from a gated
    * self-join at Hamming 0. */
  def simhashPairs128(corpus: DataFrame, maxHamming: Int = 3,
      distinctRatio: Option[Double] = None): DataFrame = {
    val d = shingled(corpus)
      .withColumn("s2", expr("simhash128(toks)"))
      .select(col("doc_id"), col("s2").getItem(0).as("hi"), col("s2").getItem(1).as("lo"))
      .localCheckpoint() // one sketch pass feeds bands + both expansion sides
    val cloneHeavy =
      distinctRatio.getOrElse(CorpusStats.headDistinctRatio(corpus)) <
        CorpusStats.cloneHeavyBelow
    val (dk, grouped) =
      if (cloneHeavy)
        (d.select(col("doc_id"), col("hi").as("k1"), col("lo").as("k2")),
          d.groupBy(col("hi"), col("lo")).agg(count(lit(1)).as("cnt"))
            .select(col("hi").as("k1"), col("lo").as("k2"), col("hi"), col("lo"), col("cnt")))
      else
        (d.select(col("doc_id"), col("doc_id").as("k1"), lit(0L).as("k2")),
          d.select(col("doc_id").as("k1"), lit(0L).as("k2"), col("hi"), col("lo"),
            lit(1L).as("cnt")))
    val bands = grouped.select(
      col("k1"), col("k2"), col("hi"), col("lo"),
      posexplode(expr(
        "array(lo & 4294967295, shiftright(lo, 32) & 4294967295, " +
          "hi & 4294967295, shiftright(hi, 32) & 4294967295)"))
        .as(Seq("band", "bucket")))
    val simPairs = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          (col("a.k1") < col("b.k1") ||
            (col("a.k1") === col("b.k1") && col("a.k2") < col("b.k2"))))
      .filter(expr(firstMatchBand128(4)))
      .select(col("a.k1").as("a1"), col("a.k2").as("a2"),
        col("b.k1").as("b1"), col("b.k2").as("b2"),
        (expr("bit_count(a.hi ^ b.hi)") + expr("bit_count(a.lo ^ b.lo)")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
    val cross = simPairs
      .join(dk.select(col("doc_id").as("da"), col("k1").as("a1"), col("k2").as("a2")),
        Seq("a1", "a2"))
      .join(dk.select(col("doc_id").as("db"), col("k1").as("b1"), col("k2").as("b2")),
        Seq("b1", "b2"))
      .select(least(col("da"), col("db")).as("id_a"),
        greatest(col("da"), col("db")).as("id_b"), col("hamming").cast("int").as("hamming"))
    val dm = dk.join(grouped.filter(col("cnt") > 1).select(col("k1"), col("k2")),
      Seq("k1", "k2"), "left_semi")
    val intra = dm.as("x")
      .join(dm.as("y"),
        col("x.k1") === col("y.k1") && col("x.k2") === col("y.k2") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        lit(0).cast("int").as("hamming"))
    cross.unionAll(intra)
  }

  /** The discriminative-shingle POSTING INDEX: one row per shingle with
    * df ≤ dfCap, holding its (≤ dfCap) doc ids. Threshold-independent, so
    * it's the reusable artifact every n-gram operator shares. Shingles
    * above the df cap (the skew guard: at 100 TB one ubiquitous shingle
    * is a quadratic bucket) are removed by anti-joining the tiny
    * hot-shingle list, which broadcasts by construction. Postings are
    * (8B, 8B) rows; both the df pass and the anti-join read the same
    * materialization. */
  def postingIndex(corpus: DataFrame, dfCap: Int = 50): DataFrame = {
    val sh = shingled(corpus).select(col("doc_id"), explode(col("shingles")).as("shingle"))
      .localCheckpoint()
    val hot = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .filter(col("df") > dfCap).select(col("shingle"))
    sh.join(broadcast(hot), Seq("shingle"), "left_anti")
      .groupBy(col("shingle"))
      .agg(collect_list(col("doc_id")).as("ids"))
      .localCheckpoint()
  }

  /** Threshold-INDEPENDENT exact-Jaccard pair graph from a posting index:
    * emit all C(df, 2) pairs per shingle group map-side, count
    * co-occurrences, join back per-doc set sizes. Compared to the classic
    * posting-list self-join this removes one full shuffle of the postings
    * AND the join's C(df, 2)-row shuffle — pairs are generated after the
    * exchange. Nothing here depends on a similarity threshold, so this is
    * the reusable artifact: operators at different thresholds filter one
    * materialization instead of re-running the quadratic stage. */
  /** Full COVERAGE graph off the posting index: per co-occurring pair
    * the shared-shingle count, both doc sizes, symmetric jaccard, AND
    * asymmetric containment `co / min(sz)` — the measure that catches a
    * quote/excerpt living inside a larger doc (jaccard dilutes it by the
    * big doc's size; containment stays ≈1). One computation feeds both
    * finals, so the session-cached artifact serves every pair consumer. */
  def coverageGraph(index: DataFrame): DataFrame = {
    val sizes = index.select(explode(col("ids")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    // ordered pairs per group via two Generate nodes + a filter — pure
    // whole-stage codegen; the nested-lambda alternative
    // (transform(sequence)+slice) is ~6x slower per row
    val co = index.filter(size(col("ids")) >= 2)
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("co"))
    co.join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard",
        stableRound(col("co").cast("double") / (col("sz_a") + col("sz_b") - col("co")), 4))
      .withColumn("containment",
        stableRound(col("co").cast("double") / least(col("sz_a"), col("sz_b")), 4))
      .select(col("id_a"), col("id_b"), col("co"), col("sz_a"), col("sz_b"),
        col("jaccard"), col("containment"))
  }

  def jaccardPairGraph(index: DataFrame): DataFrame =
    coverageGraph(index).select(col("id_a"), col("id_b"), col("jaccard"))

  /** CONTAINMENT pairs at `floor`: see [[coverageGraph]] — returns
    * (id_a, id_b, containment, jaccard) where containment ≥ floor. */
  def containmentPairs(index: DataFrame, floor: Double): DataFrame =
    coverageGraph(index)
      .filter(col("containment") >= floor)
      .select(col("id_a"), col("id_b"), col("containment"), col("jaccard"))

  /** EXACT n-gram Jaccard pairs ≥ threshold (a filter over
    * [[jaccardPairGraph]]). */
  def exactJaccardPairs(index: DataFrame, threshold: Double): DataFrame =
    jaccardPairGraph(index).filter(col("jaccard") >= threshold)

  /** Embedding near-dup over `(vec_id, embedding)`: hyperplane LSH
    * banding (60 bits, 5 bands × 12); candidates travel as id pairs only
    * — vectors are joined back AFTER dedup, and exact cosine runs on the
    * small candidate set. Returns the topN most-similar candidate pairs.
    *
    * Banding level is ADAPTIVE (see [[simhashPairs]]): on a clone-heavy
    * corpus it runs over the DISTINCT 60-bit signatures — identical
    * vectors and positively-scaled near-clones share a signature, so
    * clone groups collapse to one banding row and hot buckets stay
    * quadratic only in distinct members, with vec pairs reconstituted by
    * joins linear in the candidate count; on a mostly-unique corpus it
    * bands the vectors directly. Exact cosine runs per vec pair in both
    * modes (vectors within a signature group need NOT be identical, so
    * cosine is never computed at group level). */
  def embeddingPairs(vectors: DataFrame, topN: Int = 20,
      distinctRatio: Option[Double] = None): DataFrame = {
    GraftFunctions.register(vectors.sparkSession)
    VectorFunctions.register(vectors.sparkSession)
    // checkpoint SIGNATURES only (16 bytes/row): one hyperplane pass
    // feeds the distinct + both expansion sides, while the exact-cosine
    // lookups below re-scan the (columnar, pruned) vector source instead
    // of pinning a copy of the embedding column
    val sigs = vectors
      .select(col("vec_id"), expr("hyperplane_sig(embedding, 60)").as("sig"))
      .localCheckpoint()
    // adaptive banding level (see minhashPairs): grouped = one row per
    // banding unit (distinct signature, or vector), dk = vec_id → unit.
    // The auto-estimate samples the SIGNATURE ratio off the checkpoint
    // (free — no recompute): the signature is the collapse key, so this
    // also catches positively-scaled clones whose embedding BYTES differ
    // but whose sign-of-projection bits are identical. An explicit
    // distinctRatio measured on embedding bytes is a conservative stand-in
    // (byte-distinct ≥ sig-distinct, erring toward the always-correct
    // per-vector shape).
    val cloneHeavy =
      distinctRatio.getOrElse(CorpusStats.headDistinctRatio(sigs, "sig")) <
        CorpusStats.cloneHeavyBelow
    val (dk, grouped) =
      if (cloneHeavy)
        (sigs.select(col("vec_id"), col("sig").as("sid")),
          sigs.groupBy(col("sig")).agg(count(lit(1)).as("cnt"))
            .select(col("sig").as("sid"), col("sig"), col("cnt")))
      else
        (sigs.select(col("vec_id"), col("vec_id").as("sid")),
          sigs.select(col("vec_id").as("sid"), col("sig"), lit(1L).as("cnt")))
    val bands = grouped.select(
      col("sid"), col("sig"),
      posexplode(bandBitsCol(col("sig"), 5, 12))
        .as(Seq("band", "bucket")))
    val sigPairs = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.sid") < col("b.sid"))
      .filter(expr(firstMatchBand("sig", 5, 12)))
      .select(col("a.sid").as("sid_a"), col("b.sid").as("sid_b"))
    val cross = sigPairs
      .join(dk.select(col("vec_id").as("va"), col("sid").as("sid_a")), "sid_a")
      .join(dk.select(col("vec_id").as("vb"), col("sid").as("sid_b")), "sid_b")
      .select(least(col("va"), col("vb")).as("id_a"),
        greatest(col("va"), col("vb")).as("id_b"))
    val sm = dk.join(grouped.filter(col("cnt") > 1).select(col("sid")), Seq("sid"), "left_semi")
    val intra = sm.as("x")
      .join(sm.as("y"), col("x.sid") === col("y.sid") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"))
    val cand = cross.unionAll(intra)
    val ea = vectors.select(col("vec_id").as("id_a"), col("embedding").as("a_emb"))
    val eb = vectors.select(col("vec_id").as("id_b"), col("embedding").as("b_emb"))
    cand.join(ea, "id_a").join(eb, "id_b")
      .withColumn("cos_sim", stableRound(expr("cosine_sim(a_emb, b_emb)"), 4))
      .select(col("id_a"), col("id_b"), col("cos_sim"))
      .orderBy(col("cos_sim").desc, col("id_a"), col("id_b"))
      .limit(topN)
  }

  /** SemDeDup — SEMANTIC dedup over `(vec_id, embedding, cell)` rows
    * (published method: cluster-then-prune; SemDeDup, arXiv:2303.09540):
    * a coarse k-means quantizer partitions the corpus into cells
    * ([[Similarity.assignCells]]); within each cell, every vector whose
    * exact cosine to a LOWER-id cell-mate exceeds `tau` is pruned.
    * Complements [[embeddingPairs]]: LSH banding finds near-IDENTICAL
    * vectors (collision needs agreeing sign bits), while cluster-scoped
    * pruning removes the merely semantically redundant at a much lower
    * tau — without ever going all-pairs, because candidates are scoped to
    * a cell.
    *
    * Scale shape: the pairwise stage is a self-join ON THE CELL KEY, so
    * each vector crosses the wire once per join side — never once per
    * candidate pair (the generate-id-pairs-then-fetch-vectors spelling
    * re-ships one embedding PER PAIR through the fetch join, quadratically
    * more bytes for the all-pairs-in-cell access pattern; contrast
    * [[embeddingPairs]], where candidates are few and the fetch join
    * wins). Cell population is bounded by the quantizer's k, which scales
    * with the corpus (SemDeDup's published runs keep cells ~1e4 rows at
    * billions of docs); stored cell-partitioned (plans.IvfCellLayout) the
    * join co-locates and the exchange disappears. The drop list is ids
    * only, and the final anti-join carries 8-byte keys. */
  def semDedup(assigned: DataFrame, tau: Double): DataFrame = {
    // EXPLICIT exemption from the "shuffles never carry vectors" rule: the
    // within-cell pairwise stage must co-locate embeddings somewhere, and
    // hashing both sides by cell ONCE (2× embedding volume) strictly beats
    // the id-pair alternative (shuffle pairs, then fetch-join BOTH
    // endpoints' vectors back — ≥2× volume again, plus two more joins).
    // On a stored corpus the exchange disappears entirely when the base is
    // partitioned by cell on disk (plans.IvfCellLayout) — that layout, not
    // this operator, is the 100 TB deployment shape.
    //
    // The pair stage runs over DISTINCT embeddings (the d09/s09
    // discipline): "keep ⟺ no smaller-id doc in the cell above τ" is a
    // property of the VECTOR — a doc that is not its identical-group's
    // min id is dominated by that min (cosine 1.0), and a group min is
    // dominated iff some similar group has a smaller min (any smaller
    // member of a similar group implies that group's min is smaller). So
    // exact-duplicate groups collapse to one row carrying min(vec_id)
    // BEFORE the all-pairs join, and a clone-heavy corpus pays for its
    // distinct vectors, not its rows (measured: the 10× clone scaler's
    // 3.3–3.5× slope drops to ~linear).
    VectorFunctions.register(assigned.sparkSession)
    val grp = assigned.groupBy(col("cell"), col("embedding"))
      .agg(min(col("vec_id")).as("gid"))
    val a = grp.select(col("cell"), col("gid").as("id_a"), col("embedding").as("a_emb"))
    val b = grp.select(col("cell"), col("gid").as("id_b"), col("embedding").as("b_emb"))
    val dropG = a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b") && expr("cosine_sim(a_emb, b_emb)") > tau)
      .select(col("id_b").as("gid")).distinct()
    val keptIds = grp.select(col("gid")).join(dropG, Seq("gid"), "left_anti")
      .select(col("gid").as("vec_id"))
    assigned.join(keptIds, Seq("vec_id"), "left_semi")
  }

  /** PASSAGE-level duplication stats — sub-document dedup (the "repeated
    * boilerplate paragraph" case document-level dedup cannot see): each
    * doc splits into consecutive non-overlapping `width`-token passages;
    * a passage is REPEATED when its content occurs in ≥2 distinct docs.
    * Returns per doc (n_chunks, n_repeated), the signal a curation pass
    * thresholds on (drop or trim docs that are mostly shared passages).
    *
    * Scale shape: passages leave the scan as 64-bit xxhash64 values (one
    * codegen'd projection — passage STRINGS never materialize off-core),
    * so the df-count shuffle and the shared-semi-join both carry 8-byte
    * keys; per-doc counts re-aggregate by doc_id. Collision bound: a
    * false "repeated" needs two distinct passages on one 64-bit value —
    * p ≈ n²/2⁶⁵ corpus-wide, the family-wide convention (see
    * [[minhashPairs]]); exact content dedup stays on sha2-256 (d01). */
  def passageStats(corpus: DataFrame, width: Int = 8): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    // one-pass codegen'd kernel (ChunkHashes): the built-in spelling
    // (transform(sequence)+slice+concat_ws+hash) re-inlines the tokenizer
    // per element after project collapse and evaluates interpreted —
    // measured 5x the whole-operator wall clock
    val ch = corpus
      .withColumn("chunks", expr(s"chunk_hashes(split(lower(text), '\\\\s+'), $width)"))
      .select(col("doc_id"), size(col("chunks")).cast("bigint").as("n_chunks"), col("chunks"))
    val occ = ch.select(col("doc_id"), explode(col("chunks")).as("ph"))
    // "≥2 distinct docs" ⇔ min(doc_id) ≠ max(doc_id): one plain two-phase
    // hash aggregate instead of the distinct-aggregate's extra
    // (ph, doc_id) keyed exchange
    val shared = occ.groupBy(col("ph"))
      .agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .select(col("ph"))
    val rep = occ.join(shared, Seq("ph"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_repeated"))
    ch.select(col("doc_id"), col("n_chunks"))
      .join(rep, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"),
        coalesce(col("n_repeated"), lit(0L)).as("n_repeated"))
  }

  /** CROSS-document duplicated-SPAN fraction — the overlapping (stride-1)
    * sibling of [[passageStats]] and the distributed stand-in for
    * suffix-array exact-substring dedup (Lee et al. 2021, "Deduplicating
    * Training Data Makes Language Models Better"): a token POSITION is
    * duplicated when its `width`-token window occurs in ≥2 distinct docs,
    * and the per-doc duplicated fraction is the signal a curation pass
    * thresholds on (`keep` ⇔ fraction < `tau`). Non-overlapping chunks
    * (d07) miss SHIFTED copies — one inserted token de-aligns every chunk
    * boundary downstream; stride-1 windows are shift-proof, at w× the
    * hash volume.
    *
    * Scale shape: windows leave the scan as 64-bit hashes from one
    * codegen'd kernel (span STRINGS never materialize off-core); the
    * shared test is min(doc)≠max(doc) per hash — a plain two-phase
    * aggregate, no distinct-aggregate exchange — and the per-doc recount
    * is a semi-join of 8-byte keys. The exchange carries ~16 B per token
    * position (≈2× the text bytes): the stated price of position-exact
    * coverage — [[passageStats]] at stride w is the w×-cheaper screen,
    * this is the precision pass a pipeline runs after it. `keep`
    * thresholds the RAW integer-ratio double (identical in both engines),
    * never the rounded display value. */
  def spanStats(corpus: DataFrame, width: Int = 8, tau: Double = 0.3): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val sp = corpus
      .withColumn("spans", expr(s"span_hashes(split(lower(text), '\\\\s+'), $width)"))
      .select(col("doc_id"), size(col("spans")).cast("bigint").as("n_spans"), col("spans"))
    val occ = sp.select(col("doc_id"), explode(col("spans")).as("sh"))
    val shared = occ.groupBy(col("sh"))
      .agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .select(col("sh"))
    val rep = occ.join(shared, Seq("sh"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup"))
    val frac = when(col("n_spans") > 0,
      col("n_dup").cast("double") / col("n_spans")).otherwise(lit(0.0))
    sp.select(col("doc_id"), col("n_spans"))
      .join(rep, Seq("doc_id"), "left")
      .withColumn("n_dup", coalesce(col("n_dup"), lit(0L)))
      .select(col("doc_id"), col("n_spans"), col("n_dup"),
        stableRound(frac, 4).as("dup_frac"),
        (!(frac >= tau)).cast("int").as("keep"))
  }

  /** Corpus passage-SCRUB — the C4-style dedup TRANSFORM the detection
    * stats (d07/d12) feed: every occurrence of a globally duplicated
    * `width`-token passage is REMOVED except the corpus-order first
    * (min (doc_id, idx)), and each doc's text is rebuilt from its
    * surviving tokens (the tail past the last full window always
    * survives — it was never a chunk). This is the operator whose OUTPUT
    * ships: cleaned text plus (n_chunks, n_removed) provenance, vs the
    * flag/stat outputs of [[passageStats]]/[[spanStats]].
    *
    * Scale shape: the decision pipeline never touches text — occurrences
    * leave the scan as 8-byte `chunk_hashes` keys, first-occurrence is
    * one struct-min aggregate, and hashes occurring once (the vast
    * majority of a real corpus) are pruned from the removal join by the
    * `cnt > 1` filter, so the removal side carries only duplicated
    * occurrences. The rebuild joins per-doc removal-index ARRAYS (ints)
    * back to the corpus on doc_id: under the managed PK-clustered layout
    * that join co-locates with zero text exchange, and in the general
    * case text crosses the wire exactly once — it IS the output. The
    * rebuild itself is one codegen'd `drop_chunks` kernel, not an
    * interpreted lambda over the token array. Chunk identity is the
    * 64-bit window hash (collision bound n²/2⁶⁵, the family convention —
    * see [[passageStats]]); the DuckDB oracle replays passages as
    * strings, so a hash match also certifies zero collisions. */
  def passageScrub(corpus: DataFrame, width: Int = 8): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val ch = corpus
      .withColumn("toks", split(lower(col("text")), "\\s+"))
      .withColumn("chunks", expr(s"chunk_hashes(toks, $width)"))
    val occ = ch.select(col("doc_id"), posexplode(col("chunks")).as(Seq("idx", "ph")))
    // first occurrence per duplicated hash; singletons (cnt = 1) never
    // re-enter the join
    val firsts = occ.groupBy(col("ph"))
      .agg(min(struct(col("doc_id"), col("idx"))).as("f"), count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
      .select(col("ph"), col("f"))
    val removed = occ.join(firsts, Seq("ph"))
      .filter(col("doc_id") =!= col("f.doc_id") || col("idx") =!= col("f.idx"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("idx"))).as("rm"))
    ch.join(removed, Seq("doc_id"), "left")
      .withColumn("rm", coalesce(col("rm"), expr("CAST(array() AS ARRAY<INT>)")))
      .select(col("doc_id"),
        size(col("chunks")).cast("bigint").as("n_chunks"),
        size(col("rm")).cast("bigint").as("n_removed"),
        expr(s"drop_chunks(toks, rm, $width)").as("text_clean"))
  }

  /** Connected components over an undirected `(id_a, id_b)` pair graph,
    * iterated UNTIL CONVERGENCE (no label changed) with a hard round
    * bound — a fixed round count is silently wrong for any component
    * whose label chains outlive it. Returns non-representative members as
    * (doc_id, cluster_rep).
    *
    * Each round is min-label propagation PLUS pointer jumping (every
    * node also adopts its label's label — the path-halving step of the
    * published CC-on-MapReduce constructions): reachable-label distance
    * roughly doubles per round, so a diameter-D chain converges in
    * O(log D) rounds instead of the O(D) of plain propagation — a
    * 1000-node path converges in ~10 rounds where propagation alone
    * would exhaust maxRounds and silently return partial clusters. */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 50): DataFrame =
    ccWithRounds(pairs, maxRounds)._1

  /** [[connectedComponents]] plus the number of rounds it took — the
    * convergence-rate contract is spec-locked on a planted path graph. */
  private[operators] def ccWithRounds(pairs: DataFrame, maxRounds: Int): (DataFrame, Int) = {
    // materialize once and truncate lineage per round: iterative plans
    // otherwise recompute every prior round per iteration
    // LAZY checkpoints (localCheckpoint(false)) throughout the loop:
    // lineage still truncates, but materialization defers into the next
    // action — the first labelSum materializes edges AND the init labels
    // in ONE scheduled job, and each round's sum materializes that
    // round's relation, halving the loop's job count (the BPE-trainer
    // discipline; job-scheduling latency dominated the bounded admission
    // flows, measured on s21/e06)
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint(false)
    // initialization fuses round 1: edges carry both directions, so
    // min(src, min(dst)) per node is one aggregation — no join needed
    var labels = edges.groupBy(col("src").as("id"))
      .agg(least(col("src"), min(col("dst"))).as("label"))
      .localCheckpoint(false)
    // labels only ever decrease, so sum(label) is a strict monovariant:
    // unchanged sum ⇔ no label changed ⇔ fixpoint of BOTH steps. One
    // 1-row aggregate per round instead of a change-detection join;
    // decimal(38,0) sum is immune to long overflow at any node count.
    // empty graph ⇒ sum is NULL ⇒ ZERO: the loop then converges on its
    // first pass instead of NPE-ing (an empty pair graph is a legitimate
    // input — e.g. an increment with no in-batch near-dups)
    def labelSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
    // the INIT aggregate also carries the node count (same 1-row job):
    // an EMPTY pair graph — the common admission case, an increment
    // with no in-batch near-dups — converges here in ZERO rounds
    // instead of paying one full propagate round to observe 0 == 0
    val init = labels
      .agg(sum(col("label").cast("decimal(38,0)")), count(lit(1))).head()
    var prevSum = Option(init.getDecimal(0)).getOrElse(java.math.BigDecimal.ZERO)
    var converged = init.getLong(1) == 0L
    var round = 0
    while (!converged && round < maxRounds) {
      // 1) propagate: each node offers its label to its neighbors.
      // Materialize BEFORE the jump — the jump is a self-join on this
      // relation, and an unmaterialized self-join computes the propagate
      // join twice (measured 4× on the sf0.1 curation graph).
      val msgs = edges.join(labels, edges("dst") === labels("id"))
        .select(edges("src").as("id"), col("label"))
      val prop = labels.unionByName(msgs)
        .groupBy(col("id")).agg(min(col("label")).as("label"))
        .localCheckpoint(false)
      val s = labelSum(prop)
      if (s.compareTo(prevSum) == 0) {
        // fixpoint reached by propagation alone — the common case for
        // near-dup graphs (clique-ish components, diameter 1–2): skip the
        // jump, whose only job is halving LONG chains
        converged = true
        labels = prop
      } else {
        // 2) pointer-jump: adopt label(label(id)) — label values are node
        // ids of the same component, so the lookup side is `prop` keyed
        // by id; one row per node on both sides, no row growth. Both join
        // sides read the checkpoint — no recompute.
        val jump = prop.select(col("id").as("lid"), col("label").as("llabel"))
        val next = prop.join(jump, col("label") === col("lid"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("llabel"), col("label"))).as("label"))
          .localCheckpoint(false)
        prevSum = labelSum(next)
        labels = next
      }
      round += 1
    }
    (labels
      .select(col("id").as("doc_id"), col("label").as("cluster_rep"))
      .filter(col("doc_id") =!= col("cluster_rep")), round)
  }

  /** Per-source near-duplication DIAGNOSTICS: for every source, the doc
    * count, how many docs participate in at least one near-dup pair, and
    * the duplicated fraction — the report a curation pipeline prints
    * before choosing per-source dedup budgets. Inputs: `(doc_id, source)`
    * and a pair graph `(id_a, id_b)` (any of the finders above).
    *
    * Scale shape: the pair graph is the shared cached artifact; the
    * dup-membership set is 8-byte ids, the join back to sources is one
    * hash join keyed on doc_id, and everything downstream is a
    * per-source aggregate — no exchange ever carries text. */
  def dupReport(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val dup = pairs.select(col("id_a").as("doc_id"))
      .unionByName(pairs.select(col("id_b").as("doc_id"))).distinct()
      .withColumn("is_dup", lit(1L))
    docs.select(col("doc_id"), col("source"))
      .join(dup, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("is_dup"), lit(0L))).as("n_dup"))
      .withColumn("dup_pct",
        stableRound(col("n_dup").cast("double") / col("n_docs"), 4))
  }

  /** Cross-source near-dup OVERLAP matrix: for every unordered source
    * pair, the number of near-dup pairs straddling them and their mean
    * similarity — the "which sources copy each other" leakage report
    * that drives source-level mixing and decontamination decisions.
    *
    * Scale shape: pairs from the cached artifact; two hash joins fan the
    * tiny `(doc_id, source)` projection onto id pairs; the output is one
    * row per source pair — exchanges carry ids, labels, and one double. */
  def crossSourceOverlap(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val src = docs.select(col("doc_id"), col("source"))
    pairs
      .join(src.select(col("doc_id").as("id_a"), col("source").as("src_a")), "id_a")
      .join(src.select(col("doc_id").as("id_b"), col("source").as("src_b")), "id_b")
      .filter(col("src_a") =!= col("src_b"))
      .select(least(col("src_a"), col("src_b")).as("source_a"),
        greatest(col("src_a"), col("src_b")).as("source_b"), col("jaccard"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_pairs"),
        stableRound(avg(col("jaccard")), 4).as("avg_jaccard"))
  }

  /** Bounded-EDIT-DISTANCE near-dup (the code-dedup rule: keep pairs with
    * edit similarity `1 - lev/max(len)` ≥ `simFloor`): candidates come
    * from the shared n-gram pair graph at a LOW Jaccard floor (character
    * edits that keep similarity ≥ 0.8 leave most word 3-grams intact, so
    * the shingle filter is high-recall for them), then each candidate is
    * verified with a threshold-bounded Levenshtein.
    *
    * Scale shape: candidates are id pairs off the cached artifact; the
    * two text join-backs are linear in the CANDIDATE count — the only
    * place text rides an exchange, bounded by candidates, never the
    * corpus; the verify is per-row codegen with `maxLev` early exit
    * (size `maxLev` ≥ (1-simFloor)·max text length or long-text pairs
    * are cut by the bound before the similarity test). */
  def editNearDupPairs(docs: DataFrame, candidates: DataFrame,
      simFloor: Double = 0.8, maxLev: Int = 128): DataFrame = {
    val t = docs.select(col("doc_id"), col("text"))
    candidates.select(col("id_a"), col("id_b"))
      .join(t.select(col("doc_id").as("id_a"), col("text").as("text_a")), "id_a")
      .join(t.select(col("doc_id").as("id_b"), col("text").as("text_b")), "id_b")
      .withColumn("lev", levenshtein(col("text_a"), col("text_b"), maxLev).cast("bigint"))
      .withColumn("max_len",
        greatest(length(col("text_a")), length(col("text_b"))).cast("double"))
      // max_len > 0 is explicit: Spark orders NaN ABOVE every double, so
      // without it a pair of identical empty texts (lev 0, max_len 0 →
      // 1.0 - 0/0 = NaN) would slip PAST the simFloor test and emit a
      // NaN edit_sim — and DuckDB versions disagree on 0/0 (NULL vs
      // NaN), so the oracle carries the same predicate by construction
      .filter(col("max_len") > 0 && col("lev") >= 0 &&
        lit(1.0) - col("lev") / col("max_len") >= lit(simFloor))
      .select(col("id_a"), col("id_b"), col("lev"),
        stableRound(lit(1.0) - col("lev") / col("max_len"), 4).as("edit_sim"))
  }

  /** Reps (min-id per distinct text) that own at least one LIVE (non-hot,
    * doc-level df ≤ `dfCap`) shingle — exactly the reps that appear in
    * the doc-level posting index at all. The gate for intra-clone-group
    * pair emission in [[editNearDupFromContent]]: a clone family whose
    * every shingle is hot never enters the doc-level pair graph, so its
    * member pairs must not be fanned out either. */
  def liveContentReps(groups: DataFrame, dfCap: Int = 50): DataFrame = {
    val sx = shingled(groups.select(col("rep").as("doc_id"), col("text"), col("csize")))
      .select(col("doc_id"), col("csize"), explode(col("shingles")).as("shingle"))
    val hot = sx.groupBy(col("shingle")).agg(sum(col("csize")).as("df"))
      .filter(col("df") > dfCap).select(col("shingle"))
    sx.join(broadcast(hot), Seq("shingle"), "left_anti")
      .select(col("doc_id").as("rep")).distinct()
  }

  /** CONTENT-COLLAPSED edit near-dup — identical output to
    * [[editNearDupPairs]] over the doc-level pair graph, but Levenshtein
    * runs ONCE PER DISTINCT-TEXT PAIR (edit distance is a property of the
    * text, so clone members inherit their rep's verdict), and clone-clone
    * pairs inside one group are emitted directly (identical texts: lev 0,
    * similarity exactly 1 — gated on the group owning a live shingle and
    * a non-empty text, mirroring the doc-level graph's membership rule
    * and [[editNearDupPairs]]' explicit `max_len > 0` predicate).
    *
    * Equivalence: hotness is decided by doc-level df (the rep graph
    * counts `csize` per shingle), and both the candidate floor and the
    * verify consume only (text_a, text_b, global df) — all constant
    * across a clone group — so fan-out over members reproduces the
    * doc-level pipeline row-for-row.
    *
    * Scale shape: the expensive stages (shingle index, candidate join,
    * bounded Levenshtein) all run over DISTINCT texts — the clone-heavy
    * 10× scaler had made the doc-level verify 156× (quadratic pair count
    * × per-pair edit distance); here the fan-back joins carry
    * `(id, lev, edit_sim)` only and cost O(1) per OUTPUT row, which is
    * the deliverable's own size (every clone pair IS a near-dup pair —
    * the d06/p01 adjudication). */
  def editNearDupFromContent(docs: DataFrame, groups: DataFrame,
      repCandidates: DataFrame, liveReps: DataFrame,
      simFloor: Double = 0.8, maxLev: Int = 128): DataFrame = {
    val members = docs.select(col("doc_id"), sha2(col("text"), 256).as("dg"))
      .join(groups.select(col("dg"), col("rep")), "dg")
      .select(col("doc_id"), col("rep"))
    val repVerified = editNearDupPairs(
      groups.select(col("rep").as("doc_id"), col("text")),
      repCandidates, simFloor, maxLev)
    val cross = repVerified
      .join(members.select(col("rep").as("id_a"), col("doc_id").as("da")), "id_a")
      .join(members.select(col("rep").as("id_b"), col("doc_id").as("db")), "id_b")
      .select(least(col("da"), col("db")).as("id_a"),
        greatest(col("da"), col("db")).as("id_b"), col("lev"), col("edit_sim"))
    val intraMembers = groups
      .filter(col("csize") >= 2 && length(col("text")) > 0)
      .join(liveReps, Seq("rep"), "left_semi")
      .select(col("rep")).join(members, Seq("rep"))
    val intra = intraMembers.select(col("rep"), col("doc_id").as("id_a"))
      .join(intraMembers.select(col("rep"), col("doc_id").as("id_b")), "rep")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), lit(0L).as("lev"), lit(1.0).as("edit_sim"))
    cross.unionByName(intra)
  }

  // ---------- testdata bindings (the driver contract) ----------

  private def corpus(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents").select(col("doc_id"), col("text"))

  /** Posting index session-memoized per corpus dir — an index in the
    * reference's sense: built once, reused by d04/d06/p01. */
  private[operators] def cachedIndex(s: SparkSession, dir: String): DataFrame =
    graft.SessionCache.getOrBuild(s, ("shingle-index", dir))(postingIndex(corpus(s, dir)))

  /** Session-cached distinct-text ratio of the dir's documents table —
    * one head-sample estimate shared by every adaptive operator binding. */
  private[operators] def docRatio(s: SparkSession, dir: String): Double =
    CorpusStats.cachedHeadDistinctRatio(s, dir, "documents", "text")

  private[operators] def minhashPairs(s: SparkSession, dir: String, threshold: Double): DataFrame =
    minhashPairs(corpus(s, dir), threshold, Some(docRatio(s, dir)))

  /** Band index (d09's history side), memoized + materialized exactly as
    * [[cachedDigestIndex]]: the persisted-artifact stand-in — probes read
    * it, they never re-sketch history. */
  private[operators] def cachedBandIndex(s: SparkSession, dir: String): DataFrame =
    graft.SessionCache.getOrBuild(s, ("band-index", dir))(
      bandRows(simSketch(corpus(s, dir).filter(col("doc_id") % 5 =!= 0)))
        .localCheckpoint())

  /** The df-capped winnow fingerprint index over the history slice —
    * session-memoized and materialized once (the cachedBandIndex
    * convention): the deployment artifact [[winnowAdmit]] probes. */
  private[operators] def cachedWinnowIndex(s: SparkSession, dir: String): DataFrame =
    graft.SessionCache.getOrBuild(s, ("winnow-index", dir))(
      winnowedIndex(corpus(s, dir).filter(col("doc_id") % 5 =!= 0), 4, 4, 64)
        .localCheckpoint())

  /** Digest index (d08's history side) session-memoized per corpus dir
    * and MATERIALIZED once (localCheckpoint) — the binding's stand-in for
    * the PERSISTED index a production deployment appends per increment:
    * the admit anti-join reads the artifact, it never recomputes history
    * digests. Without the materialization the optimizer pushes the
    * anti-join below the planted-trap union and clones the whole index
    * subtree (history scan + sha2 + distinct) into every branch. */
  private[operators] def cachedDigestIndex(s: SparkSession, dir: String): DataFrame =
    graft.SessionCache.getOrBuild(s, ("digest-index", dir))(
      digestIndex(corpus(s, dir).filter(col("doc_id") % 5 =!= 0)).localCheckpoint())

  /** Pair graph session-memoized per corpus dir and MATERIALIZED once
    * (localCheckpoint) — d04 (0.4), d06 (0.4), and p01's curation (0.5)
    * all filter this same artifact, so the quadratic pair stage runs once
    * per corpus, not once per threshold. */
  private[operators] def cachedPairGraph(s: SparkSession, dir: String): DataFrame =
    cachedCoverageGraph(s, dir).select(col("id_a"), col("id_b"), col("jaccard"))

  private[operators] def cachedCoverageGraph(s: SparkSession, dir: String): DataFrame =
    graft.SessionCache.getOrBuild(s, ("coverage-graph", dir))(
      coverageGraph(cachedIndex(s, dir)).localCheckpoint())

  private[operators] def exactJaccardPairs(s: SparkSession, dir: String, threshold: Double): DataFrame =
    cachedPairGraph(s, dir).filter(col("jaccard") >= threshold)

  /** DuckDB replica of [[exactJaccardPairs]] as named CTEs ending in
    * `pairs(id_a, id_b, jaccard)` — string 3-grams joined with chr(31)
    * mirror the separator-delimited windows of `shingle_hashes`
    * (HashExpressions.scala), including the distinct-per-doc and
    * whole-list-when-short semantics. */
  /** Quality-aware near-dup RESOLUTION: for every multi-member near-dup
    * cluster, the member to KEEP — the highest-quality one (ties to the
    * smallest doc_id), not the smallest-id one [[connectedComponents]]
    * alone would pick. This is the "keep the best duplicate" step real
    * curation pipelines run between near-dup detection and the final
    * corpus cut. Inputs: the pair graph `(id_a, id_b)` and a
    * `(doc_id, quality)` relation. Returns (cluster, keep_id, quality).
    *
    * Scale shape: components come from the CC loop; the argmax rides ONE
    * aggregation over (cluster, quality, id) scalar rows — max of a
    * (quality, -id) struct is the lexicographic argmax, so there is no
    * per-cluster window or sort, and partial aggregation collapses each
    * partition to one candidate per cluster before the exchange. */
  def bestRepresentatives(pairs: DataFrame, scored: DataFrame): DataFrame = {
    val members = connectedComponents(pairs) // (doc_id, cluster_rep): non-reps
    val all = members.unionByName(
      members.select(col("cluster_rep").as("doc_id"), col("cluster_rep")).distinct())
    all.join(scored.select(col("doc_id"), col("quality")), "doc_id")
      .groupBy(col("cluster_rep").as("cluster"))
      .agg(max(struct(col("quality"), (-col("doc_id")).as("neg_id"))).as("best"))
      .select(col("cluster"), (-col("best.neg_id")).cast("bigint").as("keep_id"),
        col("best.quality").as("quality"))
  }

  /** [[bestRepresentatives]] with CONTENT COLLAPSE on the pair source —
    * the d09/s09/semDedup distinct discipline applied to the
    * exact-Jaccard cluster machinery: exact-duplicate texts collapse to
    * their min-id representative BEFORE the quadratic shingle-pair/CC
    * stages, and only the final quality argmax sees every doc (one
    * linear digest join). Provably the same clusters: jaccard is a
    * property of the TEXT, identical texts always pair at jaccard 1
    * (so clone expansion never changes connectivity), and the cluster
    * label — the component's min doc id — is always a representative's
    * id (each group's rep is its min). Multi-member groups whose rep
    * touches no external pair still cluster (their internal jaccard-1
    * doc pairs exist); singleton groups with no pairs stay out, exactly
    * as in the doc-level graph. The df cap stays DOC-level (a shingle's
    * df counts clones via the group-size weight), so the discriminative
    * shingle set — and every jaccard value — matches the doc-level
    * pipeline bit-for-bit.
    *
    * Input: (doc_id, text, quality). Output: (cluster, keep_id,
    * quality) — identical to [[bestRepresentatives]] over the doc-level
    * pair graph, measured 4.2× → ~linear on the 10× clone scaler. */
  def bestRepresentativesByContent(docs: DataFrame, threshold: Double,
      dfCap: Int = 50): DataFrame = {
    val grp = contentGroups(docs).localCheckpoint()
    bestRepsFromContent(docs, grp,
      contentRepPairGraph(grp, dfCap).filter(col("jaccard") >= threshold),
      liveContentReps(grp, dfCap))
  }

  /** Exact-duplicate text groups: one row per distinct text, carrying
    * the min-id representative and the clone multiplicity. The
    * threshold-independent first stage of the content-collapsed cluster
    * machinery (cache/checkpoint at the call site — the p01/d11 bindings
    * share one build per corpus). */
  def contentGroups(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"), sha2(col("text"), 256).as("dg"))
      .groupBy(col("dg"))
      .agg(min(struct(col("doc_id"), col("text"))).as("m"), count(lit(1)).as("csize"))
      .select(col("dg"), col("m.doc_id").as("rep"), col("m.text").as("text"), col("csize"))

  /** Threshold-independent exact-Jaccard pair graph over GROUP
    * REPRESENTATIVES, with the df cap still counted at DOC level (group
    * size = clone multiplicity) so jaccard values match the doc-level
    * pipeline bit-for-bit. */
  def contentRepPairGraph(groups: DataFrame, dfCap: Int = 50): DataFrame = {
    val sx = shingled(groups.select(col("rep").as("doc_id"), col("text"), col("csize")))
      .select(col("doc_id"), col("csize"), explode(col("shingles")).as("shingle"))
      .localCheckpoint()
    val hot = sx.groupBy(col("shingle")).agg(sum(col("csize")).as("df"))
      .filter(col("df") > dfCap).select(col("shingle"))
    val index = sx.join(broadcast(hot), Seq("shingle"), "left_anti")
      .groupBy(col("shingle")).agg(collect_list(col("doc_id")).as("ids"))
    jaccardPairGraph(index)
  }

  /** Final stage of [[bestRepresentativesByContent]]: cluster the rep
    * pair graph, fan membership back out through the digest (no text on
    * the wire), argmax quality per cluster. `liveReps` gates the
    * intra-group (csize ≥ 2) clause exactly as in
    * [[editNearDupFromContent]]: a clone family whose EVERY shingle is
    * hot (doc-level df > dfCap) never enters the doc-level posting
    * index, pairs with nothing — not even its own clones — and so must
    * not surface as a cluster here either. */
  def bestRepsFromContent(docs: DataFrame, groups: DataFrame,
      repPairs0: DataFrame, liveReps: DataFrame): DataFrame = {
    val repPairs = repPairs0.select(col("id_a"), col("id_b"))
    val nonReps = connectedComponents(repPairs)
      .select(col("doc_id").as("rep"), col("cluster_rep"))
    val paired = repPairs.select(col("id_a").as("rep"))
      .unionByName(repPairs.select(col("id_b").as("rep"))).distinct()
      .withColumn("inp", lit(1))
    val live = liveReps.select(col("rep")).distinct().withColumn("lv", lit(1))
    val repCluster = groups
      .join(nonReps, Seq("rep"), "left")
      .join(paired, Seq("rep"), "left")
      .join(live, Seq("rep"), "left")
      .filter(col("cluster_rep").isNotNull || col("inp").isNotNull ||
        (col("csize") >= 2 && col("lv").isNotNull))
      .select(col("dg"), coalesce(col("cluster_rep"), col("rep")).as("cluster"))
    docs.select(col("doc_id"), col("quality"), sha2(col("text"), 256).as("dg"))
      .join(repCluster, Seq("dg"))
      .groupBy(col("cluster"))
      .agg(max(struct(col("quality"), (-col("doc_id")).as("neg_id"))).as("best"))
      .select(col("cluster"), (-col("best.neg_id")).cast("bigint").as("keep_id"),
        col("best.quality").as("quality"))
  }

  /** Session-cached content artifacts for the testdata bindings — the
    * cachedPairGraph convention at rep level: groups and the rep pair
    * graph build once per corpus and every threshold filters them. */
  private[operators] def cachedContentGroups(s: SparkSession, dir: String): DataFrame =
    graft.SessionCache.getOrBuild(s, ("content-groups", dir))(
      contentGroups(Tables.load(s, dir, "documents").select(col("doc_id"), col("text")))
        .localCheckpoint())

  private[operators] def cachedRepPairGraph(s: SparkSession, dir: String): DataFrame =
    graft.SessionCache.getOrBuild(s, ("rep-pair-graph", dir))(
      contentRepPairGraph(cachedContentGroups(s, dir)).localCheckpoint())

  private[operators] def cachedLiveReps(s: SparkSession, dir: String): DataFrame =
    graft.SessionCache.getOrBuild(s, ("live-reps", dir))(
      liveContentReps(cachedContentGroups(s, dir)).localCheckpoint())

  /** Shared CTE body through the co-occurrence (`cp`) and per-doc size
    * (`sz`) relations — the ground both the jaccard and the containment
    * finals stand on. */
  private val ngramGraphBodySql: String =
    "toks AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS tk FROM documents), " +
      "sh AS (SELECT doc_id, unnest(CASE WHEN len(tk) < 3 THEN [array_to_string(tk, chr(31))] " +
      "ELSE list_distinct(list_transform(range(1, len(tk)-1), " +
      "i -> tk[i] || chr(31) || tk[i+1] || chr(31) || tk[i+2])) END) AS shingle FROM toks), " +
      "dfreq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle), " +
      "filt AS (SELECT doc_id, s.shingle FROM sh s JOIN dfreq d ON s.shingle = d.shingle WHERE d.df <= 50), " +
      "cp AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS cnt FROM filt a " +
      "JOIN filt b ON a.shingle = b.shingle AND a.doc_id < b.doc_id GROUP BY 1, 2), " +
      "sz AS (SELECT doc_id, count(*) AS sz FROM filt GROUP BY doc_id)"

  private[operators] def ngramPairsSql(threshold: Double): String =
    ngramGraphBodySql + ", " +
      "pairs AS (SELECT id_a, id_b, jaccard FROM (SELECT id_a, id_b, " +
      stableRoundSql("cnt / (sa.sz + sb.sz - cnt)", 4) + " AS jaccard " +
      "FROM cp JOIN sz sa ON cp.id_a = sa.doc_id JOIN sz sb ON cp.id_b = sb.doc_id) " +
      s"WHERE jaccard >= $threshold)"

  private[operators] def containmentPairsSql(floor: Double): String =
    ngramGraphBodySql + ", " +
      "cpairs AS (SELECT id_a, id_b, containment, jaccard FROM (SELECT id_a, id_b, " +
      stableRoundSql("cnt / least(sa.sz, sb.sz)", 4) + " AS containment, " +
      stableRoundSql("cnt / (sa.sz + sb.sz - cnt)", 4) + " AS jaccard " +
      "FROM cp JOIN sz sa ON cp.id_a = sa.doc_id JOIN sz sb ON cp.id_b = sb.doc_id) " +
      s"WHERE containment >= $floor)"

  /** WINNOWED FINGERPRINTS (Schleimer/Wilkerson/Aiken, "Winnowing:
    * Local Algorithms for Document Fingerprinting", SIGMOD 2003 — the
    * MOSS scheme): hash every k-token gram, slide a w-hash window, keep
    * each window's MINIMUM. Guarantee: any shared token run of length
    * ≥ w + k − 1 shares at least one selected fingerprint, at expected
    * density 2/(w+1) — the POSITION-ROBUST local fingerprinting that
    * fixed-grid spans (d12) lack: an insertion upstream shifts every
    * grid chunk but leaves local window minima intact.
    *
    * `hash` selects the gram hash: "sha2" (32-bit sha-256 prefixes, the
    * s08 convention) lets the DuckDB oracle replay VALUES, not just
    * shapes, and gates d19; "xxhash64" is the 100 TB DEFAULT for
    * deployment — same selection logic, ~2x cheaper kernel (no hex
    * round-trip, one codegen'd hash), benched as d20. A 0x1F byte in
    * text normalizes to a space before splitting (the BPE-census rule:
    * the join byte must never occur inside a token). Returns DISTINCT
    * (doc_id, fp). */
  def winnowedFingerprints(corpus: DataFrame, k: Int = 4, w: Int = 4,
      hash: String = "sha2"): DataFrame = {
    require(k > 0 && w > 0, "need k > 0 and w > 0")
    require(hash == "sha2" || hash == "xxhash64", s"unknown fingerprint hash: $hash")
    // gram_hashes + window_mins KERNELS, not the CASE/transform SQL
    // spelling: higher-order functions are CodegenFallback, which kept
    // this Generate stage out of whole-stage codegen — the interpreted
    // per-gram eval path measured 3-20x slower on the r17 board (guide
    // §4; OPTIMIZATION_r17.md "t20 stall"). Values are bit-identical
    // (HashOps.sha32/xx64 replay the sha2-hex-prefix / xxhash64 chains;
    // the d19-d22 oracles gate that end-to-end).
    import org.apache.spark.sql.{GraftColumnBridge => B}
    corpus
      .select(col("doc_id"),
        split(translate(lower(col("text")), "\u001f", " "), "\\s+").as("tk"))
      .withColumn("fp", explode(B.column(graft.functions.WindowMins(
        graft.functions.GramHashes(B.expression(col("tk")), k, hash == "sha2"), w))))
      .select(col("doc_id"), col("fp")).distinct()
  }

  /** Near-dup pairs over shared winnowed fingerprints: docs sharing
    * ≥ `minShared` selected fingerprints, with the shared count.
    * Fingerprints seen in more than `dfCap` docs are dropped first —
    * boilerplate minima carry no discriminative signal and their
    * posting lists are the quadratic hot spot (the postingIndex df-cap
    * discipline). Shuffles carry (doc_id, 8-byte fp) scalars; pair
    * volume is quadratic only in true near-dup cliques — the d04
    * adjudication. */
  def winnowedPairs(corpus: DataFrame, k: Int = 4, w: Int = 4,
      minShared: Int = 2, dfCap: Int = 64, hash: String = "sha2"): DataFrame =
    winnowedPairsFrom(winnowedIndex(corpus, k, w, dfCap, hash), minShared)

  /** The df-capped winnowed fingerprint INDEX (doc_id, fp) — materialized
    * once (the postingIndex discipline): the df-cap aggregate and both
    * pair-join sides read it; without the checkpoint each consumer
    * re-runs the per-gram hash chain. */
  def winnowedIndex(corpus: DataFrame, k: Int = 4, w: Int = 4,
      dfCap: Int = 64, hash: String = "sha2"): DataFrame = {
    val fps = winnowedFingerprints(corpus, k, w, hash).localCheckpoint()
    val keep = fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap).select(col("fp"))
    fps.join(keep, Seq("fp"), "left_semi")
  }

  /** Incremental ADMISSION against a PERSISTED winnow index — the d09
    * discipline at fingerprint level: an incoming doc is REJECTED when
    * it shares ≥ `minShared` selected fingerprints with ANY single
    * indexed document (the winnowedPairs evidence rule), admitted
    * otherwise. The probe joins the incoming side's fingerprints to the
    * df-capped index on the 8-byte fp key — shuffles carry (fp, ids)
    * scalars, work is linear in posting-list matches, and the corpus
    * behind the index is never rescanned. */
  def winnowAdmit(incoming: DataFrame, index: DataFrame, k: Int = 4, w: Int = 4,
      minShared: Int = 2, hash: String = "sha2"): DataFrame = {
    val fps = winnowedFingerprints(incoming, k, w, hash)
    val rejected = fps
      .join(index.select(col("fp"), col("doc_id").as("idx_id")), Seq("fp"))
      .groupBy(col("doc_id"), col("idx_id"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .select(col("doc_id")).distinct()
    incoming.select(col("doc_id")).join(rejected, Seq("doc_id"), "left_anti")
  }

  /** Pairs over a prebuilt [[winnowedIndex]] — exposed so a caller that
    * also needs the index (e.g. to compute expected-pair floors) shares
    * ONE fingerprint pass with the pair join. */
  def winnowedPairsFrom(fk: DataFrame, minShared: Int = 2): DataFrame =
    fk.as("a").join(fk.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)

  val queries: Seq[NamedQuery] = Seq(

    NamedQuery(
      "d01_dedup_exact",
      Some("SELECT min(doc_id) AS doc_id FROM documents GROUP BY text ORDER BY doc_id"),
      (s, dir) => exactDedup(corpus(s, dir)).orderBy(col("doc_id"))),

    // MinHash (k=64) + LSH banding: candidate pairs share a band;
    // signature agreement estimates Jaccard. The oracle is the EXACT ≥0.4
    // Jaccard pair set — a real recall+precision gate: the hash match
    // proves the LSH finder surfaces exactly the true near-dup pairs on
    // this corpus (verified to hold at sf0.001/0.01/0.1). The estimate
    // itself is covered by OperatorsSpec.
    NamedQuery(
      "d02_dedup_minhash",
      Some(
        s"WITH ${ngramPairsSql(0.4)} " +
          "SELECT id_a, id_b FROM pairs ORDER BY id_a, id_b"),
      (s, dir) =>
        minhashPairs(s, dir, 0.35)
          .select(col("id_a"), col("id_b"))
          .orderBy(col("id_a"), col("id_b"))),

    // near-dup CLUSTERS: connected components over the exact-Jaccard pair
    // graph — at 100 TB the standard Pregel-style pattern, with no
    // driver-side graph state. Output: member → cluster representative
    // (= smallest doc_id in the component). The DuckDB oracle recomputes
    // the components with a recursive CTE (transitive closure, min
    // reachable id).
    NamedQuery(
      "d06_dedup_clusters",
      Some(
        s"WITH RECURSIVE ${ngramPairsSql(0.4)}, " +
          "edges AS (SELECT id_a AS src, id_b AS dst FROM pairs " +
          "UNION ALL SELECT id_b, id_a FROM pairs), " +
          "reach(id, lab) AS (SELECT DISTINCT src, src FROM edges " +
          "UNION SELECT e.src, r.lab FROM edges e JOIN reach r ON r.id = e.dst) " +
          "SELECT id AS doc_id, min(lab) AS cluster_rep FROM reach GROUP BY id " +
          "HAVING min(lab) <> id ORDER BY cluster_rep, doc_id"),
      (s, dir) =>
        connectedComponents(exactJaccardPairs(s, dir, 0.4).select(col("id_a"), col("id_b")))
          .orderBy(col("cluster_rep"), col("doc_id"))),

    // quality-aware resolution over the same clusters: the kept member is
    // the argmax of a deliberately tie-heavy quality proxy (13 distinct
    // values), so the (quality DESC, doc_id) tie order is exercised. The
    // oracle replays components via the recursive CTE and the argmax via
    // a per-cluster window.
    NamedQuery(
      "d11_best_rep",
      Some(
        s"WITH RECURSIVE ${ngramPairsSql(0.4)}, " +
          "edges AS (SELECT id_a AS src, id_b AS dst FROM pairs " +
          "UNION ALL SELECT id_b, id_a FROM pairs), " +
          "reach(id, lab) AS (SELECT DISTINCT src, src FROM edges " +
          "UNION SELECT e.src, r.lab FROM edges e JOIN reach r ON r.id = e.dst), " +
          "comp AS (SELECT id, min(lab) AS cluster FROM reach GROUP BY id), " +
          "q AS (SELECT doc_id, CAST(n_chars % 13 AS DOUBLE)/13 AS quality FROM documents), " +
          "r AS (SELECT cluster, id, quality, row_number() OVER " +
          "(PARTITION BY cluster ORDER BY quality DESC, id) AS rk " +
          "FROM comp JOIN q ON q.doc_id = comp.id) " +
          "SELECT cluster, id AS keep_id, " + OracleRound.stableRoundSql("quality", 4) +
          " AS quality FROM r WHERE rk = 1 ORDER BY cluster"),
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents").select(col("doc_id"), col("text"),
          ((col("n_chars") % 13).cast("double") / lit(13.0)).as("quality"))
        bestRepsFromContent(docs, cachedContentGroups(s, dir),
          cachedRepPairGraph(s, dir).filter(col("jaccard") >= 0.4),
          cachedLiveReps(s, dir))
          .select(col("cluster"), col("keep_id"),
            OracleRound.stableRound(col("quality"), 4).as("quality"))
          .orderBy(col("cluster"))
      }),

    // SimHash gate (driver-visible): for every EXACT ≥0.4-Jaccard pair
    // (the oracle-computable truth set), assert two properties as INT
    // verdicts a constant DuckDB oracle hash-checks:
    //   sketch_near_ok  — the 64-bit sketches are within Hamming 16
    //     (measured max over true pairs: 8/6/11 at sf0.001/0.01/0.1; a
    //     RANDOM pair lands at Hamming ≤16 with p≈3e-5, so the margin is
    //     wide on both sides);
    //   band_complete_ok — banded-finder membership ⟺ Hamming ≤ 3: the
    //     4×16-bit pigeonhole banding is COMPLETE for its contract (any
    //     pair within Hamming 3 shares an exact band key), so the
    //     equivalence is deterministic, not statistical.
    NamedQuery(
      "d03_dedup_simhash",
      Some(
        s"WITH ${ngramPairsSql(0.4)} " +
          "SELECT id_a, id_b, CAST(1 AS INT) AS sketch_near_ok, " +
          "CAST(1 AS INT) AS band_complete_ok FROM pairs ORDER BY id_a, id_b"),
      (s, dir) => {
        GraftFunctions.register(s)
        val docs = corpus(s, dir)
        val sketches = docs
          .withColumn("toks", split(lower(col("text")), "\\s+"))
          .withColumn("sim", expr("simhash64(toks)"))
          .select(col("doc_id"), col("sim"))
        val found = simhashPairs(docs, 3, Some(docRatio(s, dir)))
          .select(col("id_a"), col("id_b"), lit(1).as("f"))
        exactJaccardPairs(s, dir, 0.4).select(col("id_a"), col("id_b"))
          .join(sketches.select(col("doc_id").as("id_a"), col("sim").as("sim_a")), "id_a")
          .join(sketches.select(col("doc_id").as("id_b"), col("sim").as("sim_b")), "id_b")
          .withColumn("ham", expr("bit_count(sim_a ^ sim_b)"))
          .join(found, Seq("id_a", "id_b"), "left")
          .select(
            col("id_a"), col("id_b"),
            (col("ham") <= 16).cast("int").as("sketch_near_ok"),
            (col("f").isNotNull === (col("ham") <= 3)).cast("int").as("band_complete_ok"))
          .orderBy(col("id_a"), col("id_b"))
      }),

    // exact n-gram Jaccard over discriminative shingles (df ≤ 50 on BOTH
    // sides of the ratio, so the measure stays consistent); the DuckDB
    // oracle rebuilds the same shingle sets from 3-gram strings and
    // hash-checks the pair list.
    NamedQuery(
      "d04_dedup_ngram",
      Some(
        s"WITH ${ngramPairsSql(0.4)} " +
          "SELECT id_a, id_b, jaccard FROM pairs ORDER BY id_a, id_b"),
      (s, dir) =>
        exactJaccardPairs(s, dir, 0.4)
          .orderBy(col("id_a"), col("id_b"))),

    // passage-level (sub-document) dedup stats: consecutive 8-token
    // windows, repeated ⟺ shared by ≥2 distinct docs. The DuckDB oracle
    // rebuilds the passages as strings and replays the distinct-doc rule
    // — a hash match proves the 64-bit passage keys collide nowhere on
    // this corpus AND the whole count pipeline agrees.
    NamedQuery(
      "d07_passage_dedup",
      Some(
        "WITH tk AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS tk FROM documents), " +
          "ch AS (SELECT doc_id, len(tk) // 8 AS n_chunks, " +
          "list_transform(range(0, len(tk) // 8), " +
          "i -> array_to_string(tk[i*8+1 : i*8+8], ' ')) AS chunks FROM tk), " +
          "e AS (SELECT doc_id, unnest(chunks) AS chunk FROM ch), " +
          "sh AS (SELECT chunk FROM e GROUP BY chunk HAVING count(DISTINCT doc_id) >= 2), " +
          "rep AS (SELECT doc_id, count(*) AS n_repeated FROM e JOIN sh USING (chunk) GROUP BY doc_id) " +
          "SELECT ch.doc_id, CAST(ch.n_chunks AS BIGINT) AS n_chunks, " +
          "CAST(coalesce(rep.n_repeated, 0) AS BIGINT) AS n_repeated " +
          "FROM ch LEFT JOIN rep USING (doc_id) ORDER BY doc_id"),
      (s, dir) => passageStats(corpus(s, dir)).orderBy(col("doc_id"))),

    // duplicated-span fraction: OVERLAPPING 8-token windows, a position is
    // duplicated ⟺ its window text occurs in ≥2 distinct docs. The DuckDB
    // oracle rebuilds every window as a string and replays the rule — a
    // hash match proves the 64-bit span keys collide nowhere on this
    // corpus and the whole count/fraction/threshold pipeline agrees.
    // keep thresholds the raw integer-ratio double (bit-identical in both
    // engines), not the rounded display fraction.
    NamedQuery(
      "d12_span_dedup",
      Some(
        "WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS tk FROM documents), " +
          "sp AS (SELECT doc_id, len(tk) AS n, list_transform(range(0, len(tk) - 7), " +
          "i -> array_to_string(tk[i+1 : i+8], ' ')) AS spans FROM t), " +
          "e AS (SELECT doc_id, unnest(spans) AS span FROM sp), " +
          "sh AS (SELECT span FROM e GROUP BY span HAVING min(doc_id) <> max(doc_id)), " +
          "rep AS (SELECT doc_id, count(*) AS n_dup FROM e JOIN sh USING (span) GROUP BY doc_id) " +
          "SELECT sp.doc_id, CAST(greatest(n - 7, 0) AS BIGINT) AS n_spans, " +
          "CAST(coalesce(n_dup, 0) AS BIGINT) AS n_dup, " +
          stableRoundSql(
            "CASE WHEN n >= 8 THEN CAST(coalesce(n_dup, 0) AS DOUBLE) / (n - 7) ELSE 0.0 END", 4) +
          " AS dup_frac, " +
          "CAST(CASE WHEN (CASE WHEN n >= 8 THEN CAST(coalesce(n_dup, 0) AS DOUBLE) / (n - 7) " +
          "ELSE 0.0 END) >= 0.3 THEN 0 ELSE 1 END AS INT) AS keep " +
          "FROM sp LEFT JOIN rep USING (doc_id) ORDER BY sp.doc_id"),
      (s, dir) => spanStats(corpus(s, dir)).orderBy(col("doc_id"))),

    // C4-style passage-scrub TRANSFORM: remove all-but-first occurrences
    // of every globally duplicated 8-token passage and rebuild each doc's
    // text. The DuckDB oracle replays keep-first over passage STRINGS and
    // rebuilds the text with list comprehensions — a hash match proves
    // the decision pipeline, the 64-bit passage keys (no collisions on
    // this corpus), and the codegen'd rebuild all agree byte-for-byte.
    NamedQuery(
      "d13_passage_scrub",
      Some(
        "WITH tk AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS tk FROM documents), " +
          "ch AS (SELECT doc_id, tk, len(tk) // 8 AS n_chunks, " +
          "list_transform(range(0, len(tk) // 8), " +
          "i -> array_to_string(tk[i*8+1 : i*8+8], ' ')) AS chunks FROM tk), " +
          "e AS (SELECT doc_id, unnest(chunks) AS chunk, " +
          "unnest(range(0, len(chunks))) AS idx FROM ch), " +
          "r AS (SELECT doc_id, idx, " +
          "row_number() OVER (PARTITION BY chunk ORDER BY doc_id, idx) AS rn FROM e), " +
          "rmv AS (SELECT doc_id, list_sort(list(idx)) AS rm_idx FROM r WHERE rn > 1 GROUP BY doc_id) " +
          "SELECT ch.doc_id, CAST(n_chunks AS BIGINT) AS n_chunks, " +
          "CAST(coalesce(len(rm_idx), 0) AS BIGINT) AS n_removed, " +
          // array_to_string([]) is NULL in DuckDB; an all-removed doc must
          // come back as '' to match the codegen'd rebuild
          "coalesce(array_to_string(flatten(list_transform(" +
          "[i for i in range(0, n_chunks) if NOT list_contains(coalesce(rm_idx, []), i)], " +
          "i -> tk[i*8+1 : i*8+8])) || tk[n_chunks*8+1 :], ' '), '') AS text_clean " +
          "FROM ch LEFT JOIN rmv USING (doc_id) ORDER BY doc_id"),
      (s, dir) => passageScrub(corpus(s, dir)).orderBy(col("doc_id"))),

    // Incremental admission against the persisted digest index. The
    // corpus splits 80/20 into history and increment by doc_id, and the
    // increment is salted with planted traps on top of the new docs:
    // exact clones of history texts under fresh ids (+1e6 — the index
    // must reject them) and in-increment clones of new docs (+2e6 — the
    // first-occurrence rule must keep only the original id). The DuckDB
    // oracle replays both rules over the raw texts, so a hash match
    // proves the digest grouping, the min-id rule, and the index
    // anti-join all fire.
    NamedQuery(
      "d08_incremental_dedup",
      Some(
        "WITH hist AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0), " +
          "base AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0), " +
          "inc AS (SELECT doc_id, text FROM base " +
          "UNION ALL SELECT doc_id + 1000000, text FROM hist WHERE doc_id % 7 = 1 " +
          "UNION ALL SELECT doc_id + 2000000, text FROM base WHERE doc_id % 10 = 0), " +
          "firsts AS (SELECT min(doc_id) AS doc_id, text FROM inc GROUP BY text) " +
          "SELECT f.doc_id FROM firsts f " +
          "WHERE NOT EXISTS (SELECT 1 FROM hist h WHERE h.text = f.text) " +
          "ORDER BY f.doc_id"),
      (s, dir) => {
        val docs = corpus(s, dir)
        val hist = docs.filter(col("doc_id") % 5 =!= 0)
        val base = docs.filter(col("doc_id") % 5 === 0)
        val inc = base
          .unionByName(hist.filter(col("doc_id") % 7 === 1)
            .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
          .unionByName(base.filter(col("doc_id") % 10 === 0)
            .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
        incrementalAdmit(inc, cachedDigestIndex(s, dir))
          .select(col("doc_id")).orderBy(col("doc_id"))
      }),

    // Incremental NEAR-dup admission against the persisted band index —
    // the same 80/20 split and planted traps as d08 (history clones
    // under +1e6 ids, in-increment clones under +2e6), judged by
    // INVARIANTS that are deterministic by construction (the s02/s03
    // verdict pattern — SimHash values are engine-specific, so the
    // oracle can't replay them, but these booleans can't flip while the
    // operator is correct): a history clone shares its source's sketch
    // bit-for-bit, so its band-0 bucket probe hits at Hamming 0 →
    // rejected; an in-increment clone pair shares a sketch → one group →
    // ≤1 admitted; survivors' texts are provably absent from history
    // (identical text ⇒ identical sketch ⇒ rejected), so admissions are
    // bounded by the fresh-text count and must cover most of it (0.7
    // floor absorbs natural near-dups straddling the split).
    NamedQuery(
      "d09_incremental_neardup",
      Some(
        "SELECT CAST(1 AS INT) AS hist_clones_rejected_ok, " +
          "CAST(1 AS INT) AS clone_groups_single_ok, " +
          "CAST(1 AS INT) AS fresh_admit_ok, " +
          "CAST(1 AS INT) AS admitted_some"),
      (s, dir) => {
        val docs = corpus(s, dir)
        val hist = docs.filter(col("doc_id") % 5 =!= 0)
        val base = docs.filter(col("doc_id") % 5 === 0)
        val inc = base
          .unionByName(hist.filter(col("doc_id") % 7 === 1)
            .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
          .unionByName(base.filter(col("doc_id") % 10 === 0)
            .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
        val admitted = incrementalNearAdmit(inc, cachedBandIndex(s, dir))
          .localCheckpoint() // pins one admission decision for the 4 verdict consumers
        val histClonesAdmitted = admitted
          .filter(col("doc_id") >= 1000000L && col("doc_id") < 2000000L)
          .agg(count(lit(1)).as("n_hist_adm"))
        val bothOfPair = admitted.as("x")
          .join(admitted.as("y"), col("x.doc_id") + 2000000L === col("y.doc_id"))
          .agg(count(lit(1)).as("n_both"))
        val admBase = admitted.filter(col("doc_id") < 1000000L)
          .agg(count(lit(1)).as("adm_base"))
        val nFresh = base.join(hist, base("text") === hist("text"), "left_anti")
          .select(base("text")).distinct().agg(count(lit(1)).as("n_fresh"))
        histClonesAdmitted.crossJoin(bothOfPair).crossJoin(admBase).crossJoin(nFresh)
          .select(
            (col("n_hist_adm") === 0).cast("int").as("hist_clones_rejected_ok"),
            (col("n_both") === 0).cast("int").as("clone_groups_single_ok"),
            (col("adm_base") >= col("n_fresh") * 0.7 &&
              col("adm_base") <= col("n_fresh")).cast("int").as("fresh_admit_ok"),
            (col("adm_base") > 0).cast("int").as("admitted_some"))
      }),

    // Embedding near-dup gate (driver-visible): plant 8 scaled clones
    // (vec_id+1e6, embedding × 2) into the corpus and require the LSH
    // finder's top-8 to be EXACTLY the planted pairs at cosine 1.0000.
    // Deterministic end-to-end: positive scaling preserves every
    // sign-of-projection bit (the 60-bit signature is IDENTICAL, so the
    // banded candidate join cannot miss), and cosine(v, 2v) is 1.0 to 4dp
    // in both engines, while the best RANDOM pair in the corpus sits at
    // ~0.51 — the top-8 hash-matches the constant oracle only if banding,
    // candidate generation, exact re-rank, and ranking all work.
    NamedQuery(
      "d05_dedup_embedding",
      Some(
        "SELECT vec_id AS id_a, CAST(vec_id + 1000000 AS BIGINT) AS id_b, " +
          "CAST(1.0 AS DOUBLE) AS cos_sim FROM embeddings WHERE vec_id < 8 ORDER BY id_a"),
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
        val clones = emb.filter(col("vec_id") < 8)
          .select((col("vec_id") + 1000000L).as("vec_id"),
            B.column(graft.functions.VecScale(B.expression(col("embedding")), 2.0f))
              .as("embedding"))
        embeddingPairs(emb.unionByName(clones), 8,
          Some(CorpusStats.cachedHeadDistinctRatio(s, dir, "embeddings", "embedding")))
          .orderBy(col("id_a"))
      }),

    // SemDeDup gate (driver-visible): plant an IDENTICAL clone
    // (vec_id+1e6) of EVERY base vector and require the cluster-scoped
    // prune to remove exactly the clones. Deterministic end-to-end: an
    // identical vector maps to the identical nearest centroid (same
    // distances, same argmin), its in-cell cosine to the original is 1.0
    // > tau, and its id is the pair's larger — so it prunes; the best
    // RANDOM pair sits at ~0.51 < 0.8, so no original ever pairs above
    // tau. Kept set == the original ids, which IS the DuckDB oracle —
    // quantizer assignment, cell-scoped candidate generation, exact
    // cosine, and the keep-lowest-id rule are all on the verified path.
    NamedQuery(
      "d10_semdedup",
      Some("SELECT vec_id FROM embeddings ORDER BY vec_id"),
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
        val clones = emb.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
        semDedup(
          Similarity.assignCells(emb.unionByName(clones), Similarity.cachedModel(s, dir)),
          0.8)
          .select(col("vec_id")).orderBy(col("vec_id"))
      }),

    // per-source duplication diagnostics over the shared ≥0.4 pair graph;
    // the oracle replays the pair CTE and the left-join membership count.
    NamedQuery(
      "d14_dup_report",
      Some(
        s"WITH ${ngramPairsSql(0.4)}, " +
          "dup AS (SELECT DISTINCT id FROM " +
          "(SELECT id_a AS id FROM pairs UNION ALL SELECT id_b FROM pairs)) " +
          "SELECT source, count(*) AS n_docs, " +
          "CAST(count(dup.id) AS BIGINT) AS n_dup, " +
          stableRoundSql("count(dup.id) / count(*)", 4) + " AS dup_pct " +
          "FROM documents LEFT JOIN dup ON documents.doc_id = dup.id " +
          "GROUP BY source ORDER BY source"),
      (s, dir) =>
        dupReport(
          Tables.load(s, dir, "documents").select(col("doc_id"), col("source")),
          exactJaccardPairs(s, dir, 0.4).select(col("id_a"), col("id_b")))
          .orderBy(col("source"))),

    // cross-source overlap matrix over the same pair graph; avg jaccard
    // aggregates the 4dp-rounded pair values identically on both sides.
    NamedQuery(
      "d15_cross_source",
      Some(
        s"WITH ${ngramPairsSql(0.4)}, " +
          "sp AS (SELECT least(da.source, db.source) AS source_a, " +
          "greatest(da.source, db.source) AS source_b, jaccard " +
          "FROM pairs JOIN documents da ON pairs.id_a = da.doc_id " +
          "JOIN documents db ON pairs.id_b = db.doc_id " +
          "WHERE da.source <> db.source) " +
          "SELECT source_a, source_b, count(*) AS n_pairs, " +
          stableRoundSql("avg(jaccard)", 4) + " AS avg_jaccard " +
          "FROM sp GROUP BY source_a, source_b ORDER BY source_a, source_b"),
      (s, dir) =>
        crossSourceOverlap(
          Tables.load(s, dir, "documents").select(col("doc_id"), col("source")),
          exactJaccardPairs(s, dir, 0.4))
          .orderBy(col("source_a"), col("source_b"))),

    // edit-distance near-dup: ≥0.2-Jaccard candidates verified with exact
    // Levenshtein at edit similarity ≥ 0.8. The oracle recomputes the
    // candidates AND the unbounded levenshtein in DuckDB, so a hash match
    // proves the threshold-bounded Spark verify agrees distance-for-
    // distance (maxLev=128 > 0.2·max text length on this corpus, so the
    // bound never cuts a true positive — see scaladoc sizing rule).
    NamedQuery(
      "d16_edit_neardup",
      Some(
        s"WITH ${ngramPairsSql(0.2)}, " +
          "v AS (SELECT id_a, id_b, levenshtein(da.text, db.text) AS lev, " +
          "greatest(length(da.text), length(db.text)) AS max_len " +
          "FROM pairs JOIN documents da ON pairs.id_a = da.doc_id " +
          "JOIN documents db ON pairs.id_b = db.doc_id) " +
          "SELECT id_a, id_b, CAST(lev AS BIGINT) AS lev, " +
          stableRoundSql("1.0 - lev / max_len", 4) + " AS edit_sim " +
          "FROM v WHERE max_len > 0 AND lev <= 128 AND 1.0 - lev / max_len >= 0.8 " +
          "ORDER BY id_a, id_b"),
      (s, dir) =>
        editNearDupFromContent(corpus(s, dir), cachedContentGroups(s, dir),
          cachedRepPairGraph(s, dir).filter(col("jaccard") >= 0.2),
          cachedLiveReps(s, dir))
          .orderBy(col("id_a"), col("id_b"))),

    // containment ≥ 0.8: excerpt/quote detection — the asymmetric
    // coverage jaccard dilutes. Same cached coverage artifact as every
    // pair consumer; the oracle replays both measures off the shared CTE
    // body.
    NamedQuery(
      "d17_containment",
      Some(
        s"WITH ${containmentPairsSql(0.8)} " +
          "SELECT id_a, id_b, containment, jaccard FROM cpairs " +
          "ORDER BY id_a, id_b"),
      (s, dir) =>
        cachedCoverageGraph(s, dir)
          .filter(col("containment") >= 0.8)
          .select(col("id_a"), col("id_b"), col("containment"), col("jaccard"))
          .orderBy(col("id_a"), col("id_b"))),

    // WIDE-sketch SimHash gate — the d03 invariant pair re-run on the
    // 128-bit [hi, lo] sketch with 4×32-bit bands (the bucket-space
    // scale path for the 10¹¹-distinct-sketch tail):
    //   sketch_near_ok  — true ≥0.4-Jaccard pairs sit within Hamming 32
    //     of 128 (measured max 17/11/20 at sf0.001/0.01/0.1; a random
    //     pair centers at 64 ± 5.7, so P(≤32) ≈ 8e-9 — wide margins both
    //     sides);
    //   band_complete_ok — banded-finder membership ⟺ Hamming ≤ 3: 3
    //     differing bits touch at most 3 of the 4 bands, so one 32-bit
    //     band key always matches exactly (deterministic pigeonhole).
    NamedQuery(
      "d18_dedup_simhash128",
      Some(
        s"WITH ${ngramPairsSql(0.4)} " +
          "SELECT id_a, id_b, CAST(1 AS INT) AS sketch_near_ok, " +
          "CAST(1 AS INT) AS band_complete_ok FROM pairs ORDER BY id_a, id_b"),
      (s, dir) => {
        GraftFunctions.register(s)
        val docs = corpus(s, dir)
        val sketches = docs
          .withColumn("toks", split(lower(col("text")), "\\s+"))
          .withColumn("s2", expr("simhash128(toks)"))
          .select(col("doc_id"), col("s2").getItem(0).as("hi"), col("s2").getItem(1).as("lo"))
        val found = simhashPairs128(docs, 3, Some(docRatio(s, dir)))
          .select(col("id_a"), col("id_b"), lit(1).as("f"))
        exactJaccardPairs(s, dir, 0.4).select(col("id_a"), col("id_b"))
          .join(sketches.select(col("doc_id").as("id_a"),
            col("hi").as("ha"), col("lo").as("la")), "id_a")
          .join(sketches.select(col("doc_id").as("id_b"),
            col("hi").as("hb"), col("lo").as("lb")), "id_b")
          .withColumn("ham", expr("bit_count(ha ^ hb) + bit_count(la ^ lb)"))
          .join(found, Seq("id_a", "id_b"), "left")
          .select(
            col("id_a"), col("id_b"),
            (col("ham") <= 32).cast("int").as("sketch_near_ok"),
            (col("f").isNotNull === (col("ham") <= 3)).cast("int").as("band_complete_ok"))
          .orderBy(col("id_a"), col("id_b"))
      }),

    // winnowed-fingerprint near-dup pairs (k=4 grams, w=4 windows,
    // ≥2 shared, df ≤ 64). FULL value oracle: DuckDB rebuilds the
    // 32-bit sha-prefix k-gram hashes (the s08 chain), replays the
    // sliding-window minima, the df cap, and the shared counts.
    NamedQuery(
      "d19_winnow_pairs",
      Some(
        "WITH tk AS (SELECT doc_id, string_split_regex(replace(lower(text), chr(31), ' '), '\\s+') AS tk FROM documents), " +
          "g AS (SELECT doc_id, CASE WHEN len(tk) < 4 THEN [array_to_string(tk, chr(31))] " +
          "ELSE list_transform(range(1, len(tk) - 2), i -> array_to_string(tk[i:i+3], chr(31))) END AS gs FROM tk), " +
          "h AS (SELECT doc_id, list_transform(gs, g2 -> list_reduce(list_transform(range(1, 9), " +
          "c -> strpos('0123456789abcdef', sha256(g2)[c]) - 1), (a, c) -> a * 16 + c)) AS hs FROM g), " +
          "sel AS (SELECT doc_id, unnest(CASE WHEN len(hs) <= 4 THEN [list_min(hs)] " +
          "ELSE list_transform(range(1, len(hs) - 2), j -> list_min(hs[j:j+3])) END) AS fp FROM h), " +
          "fps AS (SELECT DISTINCT doc_id, fp FROM sel), " +
          "keep AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 64), " +
          "fk AS (SELECT doc_id, fp FROM fps JOIN keep USING (fp)) " +
          "SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS shared " +
          "FROM fk a JOIN fk b ON a.fp = b.fp AND a.doc_id < b.doc_id " +
          "GROUP BY 1, 2 HAVING count(*) >= 2 ORDER BY id_a, id_b"),
      (s, dir) =>
        winnowedPairs(corpus(s, dir), 4, 4, 2, 64)
          .orderBy(col("id_a"), col("id_b"))),

    // the xxhash64 DEPLOYMENT variant of d19 — DuckDB cannot replay
    // xxhash64 values, so the gate is a planted-clone verdict board
    // (constant oracle): 25 exact clones must pair through the xxhash64
    // fingerprint index (winnowing selects minima positionally, so an
    // identical doc selects an identical fp set under ANY hash), pairs
    // stay canonical, and the minShared floor holds. Benching this row
    // against d19 measures the kernel swap (no hex round-trip) alone.
    NamedQuery(
      "d20_winnow_xxhash",
      Some(
        "SELECT CAST(1 AS INT) AS clone_pairs_ok, CAST(1 AS INT) AS pairs_canonical, " +
          "CAST(1 AS INT) AS shared_floor_ok"),
      (s, dir) => {
        val d = corpus(s, dir)
        val planted = d.filter(col("doc_id") < 25)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        // ONE fingerprint pass feeds both the pair join and the
        // expected-pair floor (winnowedIndex checkpoints internally)
        val fk = winnowedIndex(d.unionByName(planted), 4, 4, 64, "xxhash64")
        val pairs = winnowedPairsFrom(fk, 2).localCheckpoint() // 3 verdicts read it
        val expected = fk.filter(col("doc_id") < 25)
          .groupBy(col("doc_id")).agg(count(lit(1)).as("nk"))
          .filter(col("nk") >= 2)
          .select(col("doc_id").as("id_a"), (col("doc_id") + 1000000L).as("id_b"))
        val v1 = expected.join(pairs, Seq("id_a", "id_b"), "left_anti")
          .agg((count(lit(1)) === 0).cast("int").as("clone_pairs_ok"))
        val v2 = pairs.agg(
          (coalesce(sum(when(col("id_a") < col("id_b"), 0).otherwise(1)), lit(0L)) === 0)
            .cast("int").as("pairs_canonical"))
        val v3 = pairs.agg(
          (coalesce(min(col("shared")), lit(2L)) >= 2).cast("int").as("shared_floor_ok"))
        v1.crossJoin(v2).crossJoin(v3)
      }),

    // incremental winnow ADMISSION vs the persisted index — FULL value
    // oracle: DuckDB rebuilds both fingerprint chains (history with the
    // df cap, incoming without), replays the >= 2-shared-with-one-doc
    // rejection rule, and hash-compares the admitted id set. Incoming =
    // the held-out doc_id % 5 == 0 slice plus planted clones of indexed
    // docs (which must ALL be rejected — winnowing shares every
    // fingerprint on identical text).
    NamedQuery(
      "d21_winnow_admit",
      Some(winnowAdmitOracleSql),
      (s, dir) => {
        val docs = corpus(s, dir)
        val inc = docs.filter(col("doc_id") % 5 === 0)
          .unionByName(docs.filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 7 === 1)
            .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        winnowAdmit(inc, cachedWinnowIndex(s, dir), 4, 4, 2)
          .orderBy(col("doc_id"))
      }),

    // the SAME admission semantics as d21, driven end-to-end through the
    // ENGINE's persisted-artifact SQL flow: the fingerprint index is
    // materialized ONCE into a managed table (INSERT .. SELECT, with
    // composite-PK unique enforcement on the way in) and the probe
    // statement passes that table to graft_winnow_admit, whose shape
    // dispatch (a (doc_id, fp) relation) probes it directly — the probe
    // plan fingerprints only the increment; the history corpus is never
    // rescanned (plan-locked in PlanQualitySpec). The oracle is d21's
    // verbatim: the artifact round-trip must be value-invisible.
    NamedQuery(
      "d22_winnow_index_sql",
      Some(winnowAdmitOracleSql),
      (s, dir) => {
        graft.Tables.registerAll(s, dir)
        // the index VALUES come from the session-cached artifact (the
        // same winnowedIndex relation d21 probes — r13 VERDICT task #5:
        // recomputing the fingerprint chain inside the timed row was
        // test construction, not deployment; the TVF→INSERT build
        // statement itself is spec-gated in SqlEngineSpec)
        cachedWinnowIndex(s, dir).select(col("doc_id"), col("fp"))
          .createOrReplaceTempView("graft_d22_widx_src")
        val wh = java.nio.file.Files.createTempDirectory("graft-d22-wh-").toString
        try {
          val e = new graft.engine.SqlEngine(s, new graft.engine.Catalog(wh),
            graft.engine.SqlContext("d22db", "user1"))
          e.execute("CREATE DATABASE d22db")
          e.execute("CREATE TABLE inc (doc_id bigint PRIMARY KEY, text text)")
          e.execute("INSERT INTO inc SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0 " +
            "UNION ALL SELECT doc_id + 1000000, text FROM documents " +
            "WHERE doc_id % 5 <> 0 AND doc_id % 7 = 1")
          // winnowedIndex emits DISTINCT (doc_id, fp), so the composite PK's
          // unique enforcement passes — and locks the artifact's key shape
          e.execute("CREATE TABLE widx (doc_id bigint, fp bigint, PRIMARY KEY (doc_id, fp))")
          e.execute("INSERT INTO widx SELECT doc_id, fp FROM graft_d22_widx_src")
          e.execute("SELECT doc_id FROM graft_winnow_admit(inc, widx, 4, 4, 2) ORDER BY doc_id")
            .localCheckpoint()
        } finally {
          import scala.jdk.CollectionConverters._
          val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(wh))
          val all = try walk.iterator().asScala.toSeq.reverse finally walk.close()
          all.foreach(java.nio.file.Files.deleteIfExists(_))
        }
      })
  )

  /** d21/d22's shared DuckDB oracle: replay both fingerprint chains
    * (history with the df cap, incoming without) and the ≥2-shared-with-
    * one-doc rejection rule over the %5 held-out split plus planted
    * clones of indexed docs. */
  private lazy val winnowAdmitOracleSql: String = {
    def chain(src: String, p: String): String =
      s"${p}tk AS (SELECT doc_id, string_split_regex(replace(lower(text), chr(31), ' '), '\\s+') AS tk FROM $src), " +
        s"${p}g AS (SELECT doc_id, CASE WHEN len(tk) < 4 THEN [array_to_string(tk, chr(31))] " +
        s"ELSE list_transform(range(1, len(tk) - 2), i -> array_to_string(tk[i:i+3], chr(31))) END AS gs FROM ${p}tk), " +
        s"${p}h AS (SELECT doc_id, list_transform(gs, g2 -> list_reduce(list_transform(range(1, 9), " +
        s"c -> strpos('0123456789abcdef', sha256(g2)[c]) - 1), (a, c) -> a * 16 + c)) AS hs FROM ${p}g), " +
        s"${p}sel AS (SELECT doc_id, unnest(CASE WHEN len(hs) <= 4 THEN [list_min(hs)] " +
        s"ELSE list_transform(range(1, len(hs) - 2), j -> list_min(hs[j:j+3])) END) AS fp FROM ${p}h), " +
        s"${p}fps AS (SELECT DISTINCT doc_id, fp FROM ${p}sel)"
    "WITH idx_src AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0), " +
      "inc_src AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0 " +
      "UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM documents " +
      "WHERE doc_id % 5 <> 0 AND doc_id % 7 = 1), " +
      chain("idx_src", "ix") + ", " +
      "ixkeep AS (SELECT fp FROM ixfps GROUP BY fp HAVING count(*) <= 64), " +
      "ixfk AS (SELECT doc_id, fp FROM ixfps JOIN ixkeep USING (fp)), " +
      chain("inc_src", "in") + ", " +
      "shared AS (SELECT i.doc_id AS inc_id, x.doc_id AS idx_id, count(*) AS c " +
      "FROM infps i JOIN ixfk x ON i.fp = x.fp GROUP BY 1, 2), " +
      "rej AS (SELECT DISTINCT inc_id FROM shared WHERE c >= 2) " +
      "SELECT doc_id FROM inc_src WHERE doc_id NOT IN (SELECT inc_id FROM rej) " +
      "ORDER BY doc_id"
  }
}
