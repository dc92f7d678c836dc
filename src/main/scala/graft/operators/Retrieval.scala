package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Sparse lexical retrieval (BM25, Robertson & Zaragoza's Okapi
  * formulation) — the inverted-index counterpart of the dense ANN stack
  * in [[Similarity]]. A training-data pipeline uses it two ways: ad-hoc
  * scoring of a huge corpus against a SMALL query set (benchmark
  * decontamination sweeps, RAG retrieval evals), and building the
  * posting-list index a serving tier reads.
  *
  * Scale design, stated per surface:
  *  - [[bm25TopK]] / [[bm25TopKChunks]] (small known query): ONE corpus
  *    scan; the per-term document frequencies, corpus size, and average
  *    length all collapse into a single map-side-combinable global
  *    aggregation (one tiny stats row — no groupBy shuffle), scoring is
  *    then pure per-row map work against that broadcast row, and the
  *    top-k is a TakeOrderedAndProject (per-partition heads, never a
  *    global sort). Zero full-width shuffles end to end.
  *  - [[bm25Index]] (full index build): the classic explode → (term,
  *    doc) aggregation. This IS a corpus-grain shuffle and exists for
  *    the persist-once path — at 100 TB the postings/df/doclen tables
  *    are written out bucketed by term ([[bm25IndexWrite]]) and every
  *    later query prunes to its terms' buckets
  *    ([[bm25TopKFromIndex]]).
  *
  * CACHING CONTRACT (applies to [[bm25TopK]], [[bm25TopKChunks]] and
  * [[bm25Index]]): these persist a fixed-width intermediate (the unit
  * projection / tokenized base) and return LAZY results that read it —
  * unpersisting before the caller's action would undo the single-scan
  * plan, so the CALLER owns release: run the action, then
  * `spark.catalog.clearCache()` (what the Verify/Bench harnesses do per
  * gate/rep). Repeated calls without clearing accumulate one cached
  * relation per call. Same contract as the other persisting operators
  * (Dedup.materializeOnce, the bigram LM).
  */
object Retrieval {

  /** idf with the +1 floor (Lucene's variant): ln(1 + (N - df + .5)/(df + .5)),
    * never negative even for terms in most documents. */
  private def idf(n: Column, df: Column): Column =
    log(lit(1.0) + (n - df + 0.5) / (df + 0.5))

  /** One BM25 term contribution: idf × tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)). */
  private def weight(tf: Column, dl: Column, n: Column, df: Column,
      avgdl: Column, k1: Double, b: Double): Column =
    idf(n, df) * (tf * (k1 + 1.0)) /
      (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / avgdl))

  /** Score (id, toks) units against `queryTerms` map-side and return the
    * top `k` as (id cols..., score). Units with no query term are not
    * retrieved (their score is 0 by definition).
    */
  private def topKOverUnits(units: DataFrame, idCols: Seq[String],
      queryTerms: Seq[String], k1: Double, b: Double, k: Int,
      termWeights: Option[Seq[Double]] = None): DataFrame =
    topKOverUnitsTracked(units, idCols, queryTerms, k1, b, k, termWeights)._1

  /** [[topKOverUnits]] plus a handle on the frame it persisted, for
    * INTERNAL callers that run their own action and can therefore
    * release exactly what this call cached (the operator-owned-release
    * discipline of IterativeLoop) instead of the session-wide
    * `clearCache` the public caller-owns-release contract falls back
    * to. */
  private def topKOverUnitsTracked(units: DataFrame, idCols: Seq[String],
      queryTerms: Seq[String], k1: Double, b: Double, k: Int,
      termWeights: Option[Seq[Double]] = None): (DataFrame, DataFrame) = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(queryTerms.distinct.size == queryTerms.size,
      s"duplicate query terms would double-count: $queryTerms")
    require(termWeights.forall(_.size == queryTerms.size),
      "termWeights must align with queryTerms")
    // per-unit tf of each query term, computed from the token array
    // in place — Q is small, so Q array passes beat a (unit, term)
    // shuffle by the width of the corpus
    val tfCols = queryTerms.zipWithIndex.map { case (t, i) =>
      size(filter(col("toks"), x => x === lit(t))).cast("double").as(s"tf_$i")
    }
    // the plan reads the unit stream twice (stats build + scoring probe);
    // persisting the fixed-width (ids, dl, tf_i) projection — never the
    // token arrays — keeps it ONE corpus scan, and the cached rows are
    // Q+2 doubles per unit (same cache contract as the other persisting
    // operators: the gate/bench harness clears per query)
    val scored0 = units.select(
      idCols.map(col) ++ Seq(size(col("toks")).cast("double").as("dl")) ++ tfCols: _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // df per query term + N + avgdl in ONE global aggregation: every
    // partial is a fixed-width row, so this is count-class cost and the
    // result is a single broadcastable stats row
    val statsAggs =
      Seq(count(lit(1)).cast("double").as("n"), avg(col("dl")).as("avgdl")) ++
        queryTerms.indices.map(i =>
          sum((col(s"tf_$i") > 0).cast("double")).as(s"df_$i"))
    val stats = scored0.agg(statsAggs.head, statsAggs.tail: _*)
    val score = queryTerms.indices.map { i =>
      val w = termWeights.map(ws => lit(ws(i))).getOrElse(lit(1.0))
      when(col(s"tf_$i") > 0,
        w * weight(col(s"tf_$i"), col("dl"), col("n"), col(s"df_$i"),
          col("avgdl"), k1, b))
        .otherwise(lit(0.0))
    }.reduce(_ + _)
    val result = scored0.crossJoin(broadcast(stats))
      .select(idCols.map(col) :+ round(score, 4).as("score"): _*)
      .filter(col("score") > 0.0)
      .orderBy(col("score").desc +: idCols.map(col): _*)
      .limit(k)
    (result, scored0)
  }

  /** Top-k documents for one query — (doc_id, score), score rounded to 4
    * decimals, ties broken by doc_id. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      k: Int = 10): DataFrame = {
    val units = docs.select(col(idCol).as("doc_id"),
      TextOps.tokens(col(textCol)).as("toks"))
    topKOverUnits(units, Seq("doc_id"), queryTerms, k1, b, k)
  }

  /** RM3 pseudo-relevance feedback (Lavrenko & Croft's relevance model,
    * the Anserini/Indri default expansion): retrieve `fbDocs` docs with
    * plain BM25, build a feedback term distribution from them —
    * `P(w|R) ∝ Σ_d P(w|d)·P(Q|d)` with `P(w|d) = tf/|d|` and `P(Q|d)`
    * the normalized initial score — take the top `fbTerms` expansion
    * terms, interpolate with the original query
    * (`α·P_orig + (1−α)·P_rm`), and rescore the corpus under the
    * weighted query. Recall goes up (vocabulary-mismatch docs sharing
    * only expansion terms now retrieve); α keeps drift bounded.
    *
    * DETERMINISM (the t32/s10 discipline): the two float-derived
    * intermediates that RANK things are quantized to integers before
    * any ordering — per-doc feedback weights `round(score/total·1e6)`
    * and per-(term,doc) contributions `round(tf/dl·wq·1000)`, whose
    * cross-doc SUM is then an integer aggregate (order-independent), so
    * expansion-term selection is an exact integer sort in any engine.
    * Final scores are the usual round-4 doubles.
    *
    * Scale shape: initial retrieval is [[bm25TopK]] (one scan, zero
    * full-width shuffles); the feedback model touches ONLY the
    * `fbDocs` retrieved documents (pushed-down id filter, term-grain
    * aggregate over ~fbDocs·doclen rows) and is consumed in ONE job —
    * top-`fbTerms` rank, the original terms' full-model weights, and
    * the grand total all ride one collect via global windows over the
    * (tiny, fbDocs-bounded) term model; the rescore is a second
    * [[bm25TopK]]-shaped scan with the expanded term set. Driver state
    * is bounded: fbDocs scores + (fbTerms + |Q|) weights (the
    * BPE-argmax contract). The operator releases exactly the frame the
    * initial retrieval persisted (never a session-wide cache clear),
    * and reads doc ids generically, so any id type works.
    *
    * @return top-k (doc_id, score) under the expanded weighted query.
    */
  def rm3TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], fbDocs: Int = 10, fbTerms: Int = 8,
      alpha: Double = 0.5, k1: Double = 1.2, b: Double = 0.75,
      k: Int = 10): DataFrame = {
    require(fbDocs >= 1 && fbTerms >= 1 && alpha >= 0.0 && alpha <= 1.0)
    val spark = docs.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    // 1. initial retrieval; fbDocs (id, round-4 score) rows to driver.
    //    Ids are read untyped (string/int/long corpora all work); the
    //    tracked persist handle is released here — this operator owns
    //    that cache, the session's other cached relations are not ours
    //    to drop.
    val units0 = docs.select(col(idCol).as("doc_id"),
      TextOps.tokens(col(textCol)).as("toks"))
    val (initDf, initCache) =
      topKOverUnitsTracked(units0, Seq("doc_id"), queryTerms, k1, b, fbDocs)
    val initial = initDf.collect().map(r => (r.get(0), r.getDouble(1))).toSeq
    initCache.unpersist(false)
    if (initial.isEmpty) return bm25TopK(docs, idCol, textCol, queryTerms, k1, b, k)
    // 2. quantized doc weights, summed in the FIXED retrieval order
    val total = initial.foldLeft(0.0)(_ + _._2)
    val docW = initial.map { case (id, sc) =>
      (id, math.round(sc / total * 1000000.0)) }
    // 3. feedback term model over ONLY the fb docs: integer contribution
    //    sum — ranking-safe in any partition order
    val dwDf = spark.createDataFrame(
      java.util.Arrays.asList(docW.map { case (id, wq) => Row(id, wq) }: _*),
      StructType(Seq(StructField("doc_id", initDf.schema.head.dataType),
        StructField("wq", LongType, nullable = false))))
    val fb = docs
      .filter(col(idCol).isin(docW.map(_._1): _*)) // pushed-down id filter
      .select(col(idCol).as("doc_id"), TextOps.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("double").as("dl"),
        explode(col("toks")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"), first(col("dl")).as("dl"))
      .join(broadcast(dwDf), "doc_id")
      .select(col("term"),
        round(col("tf") / col("dl") * col("wq") * 1000.0).cast("long").as("c"))
      .groupBy(col("term")).agg(sum(col("c")).as("w"))
    // ONE action over the feedback model: the deterministic (w desc,
    // term) rank, the grand total (unbounded frame on the same window —
    // one sort, one Window node pair), and the FULL-model weight of
    // every kept term. Keeping original query terms through the filter
    // (not just the top-fbTerms) matches the relational interpolation
    // (LEFT JOIN against the full model): a query term ranked below the
    // top-fbTerms still carries its true feedback weight. The window is
    // single-partition by construction — the model is term-grain over
    // fbDocs documents, driver-bounded by the same argument that lets
    // step 4 collect it.
    val win = Window.orderBy(col("w").desc, col("term"))
    val kept = fb.select(col("term"), col("w"),
        row_number().over(win).as("rk"),
        sum(col("w")).over(win.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)).as("wt"))
      .filter(col("rk") <= fbTerms ||
        col("term").isInCollection(queryTerms))
      .collect()
    val rmTotal = kept.headOption.map(_.getLong(3)).getOrElse(0L)
    if (rmTotal == 0L) // degenerate feedback (all contributions rounded away)
      return bm25TopK(docs, idCol, textCol, queryTerms, k1, b, k)
    // 4. interpolate: α on the original terms, (1−α) on the feedback
    //    distribution; quantize BEFORE the deterministic (weight desc,
    //    term) ordering of the final weighted query
    val origSet = queryTerms.toSet
    val rm = kept.filter(_.getInt(2) <= fbTerms)
      .map(r => (r.getString(0), r.getLong(1)))
    val allTerms = (queryTerms ++ rm.map(_._1)).distinct
    val rmW = kept.map(r => r.getString(0) -> r.getLong(1)).toMap
    val weighted = allTerms.map { t =>
      val orig = if (origSet(t)) alpha * 1000000.0 / queryTerms.size else 0.0
      val exp = (1.0 - alpha) * 1000000.0 *
        rmW.getOrElse(t, 0L).toDouble / rmTotal
      (t, math.round(orig + exp))
    }.sortBy { case (t, w) => (-w, t) }
    // 5. rescore the corpus under the expanded weighted query
    val units = docs.select(col(idCol).as("doc_id"),
      TextOps.tokens(col(textCol)).as("toks"))
    topKOverUnits(units, Seq("doc_id"), weighted.map(_._1), k1, b, k,
      Some(weighted.map(_._2.toDouble / 1000000.0)))
  }

  /** RAG-style retrieval: sliding-window chunks (same layout contract as
    * [[TextOps.chunk]] — chunk i covers tokens [i·stride+1, i·stride+chunkSize])
    * scored as the retrieval units. Chunking is a map-side explode, so
    * the whole pipeline keeps the one-scan / no-shuffle shape of
    * [[bm25TopK]]; returns (doc_id, chunk_id, tok_start, score).
    */
  def bm25TopKChunks(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], chunkSize: Int = 64, stride: Int = 48,
      k1: Double = 1.2, b: Double = 0.75, k: Int = 10): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      "need 0 < stride <= chunkSize")
    val units = docs
      .select(col(idCol).as("doc_id"), TextOps.tokens(col(textCol)).as("dtoks"))
      .withColumn("n_tok", size(col("dtoks")).cast("long"))
      .filter(col("n_tok") > 0)
      .withColumn("n_chunks",
        when(col("n_tok") <= chunkSize, lit(1L))
          .otherwise(lit(1L) +
            ceil((col("n_tok") - chunkSize) / lit(stride.toDouble)).cast("long")))
      .select(col("doc_id"), col("dtoks"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        (col("chunk_id") * stride + 1).as("tok_start"),
        slice(col("dtoks"), (col("chunk_id") * stride + 1).cast("int"),
          lit(chunkSize)).as("toks"))
    topKOverUnits(units, Seq("doc_id", "chunk_id", "tok_start"),
      queryTerms, k1, b, k)
  }

  /** Field-weighted BM25F (Zaragoza, Craswell, Taylor, Saria &
    * Robertson, TREC-13 2004 — the multi-field ranking the plain BM25
    * cannot express without breaking term saturation): per field f,
    * tf normalizes by that field's own length
    * (`tf̃_f = tf_f / (1 + b_f·(dl_f/avgdl_f − 1))`), the weighted
    * pseudo-frequency `tfp = Σ_f w_f·tf̃_f` then saturates ONCE
    * (`idf · tfp/(k1 + tfp)`) — weighting fields before saturation is
    * the whole point (a title hit must not saturate separately from
    * body hits). df counts documents matching in ANY field.
    *
    * Scale shape — the [[bm25TopK]] contract: ONE corpus scan into a
    * fixed-width (id, dl_f…, tf_{f,t}…) projection (token-array
    * filters in place, no (doc, term) shuffle), one map-side-combined
    * global stats row (n, per-field avgdl, per-term df), map-only
    * scoring against the broadcast row, TakeOrderedAndProject top-k.
    * Caller owns cache release (file contract).
    *
    * @param fields one entry per field: (token-array column, weight
    *               w_f, length-norm b_f). Empty fields are safe
    *               (zero tf contributes zero, never NaN).
    * @return top-k (doc_id, score), round-4, ties by doc_id.
    */
  def bm25fTopK(docs: DataFrame, idCol: String,
      fields: Seq[(Column, Double, Double)], queryTerms: Seq[String],
      k1: Double = 1.2, k: Int = 10): DataFrame = {
    require(fields.nonEmpty, "need at least one field")
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(queryTerms.distinct.size == queryTerms.size,
      s"duplicate query terms would double-count: $queryTerms")
    val nf = fields.size
    val base = docs.select(col(idCol).as("doc_id") +:
      fields.zipWithIndex.map { case ((c, _, _), f) => c.as(s"f_$f") }: _*)
    val proj = base.select(
      Seq(col("doc_id")) ++
        (0 until nf).map(f =>
          size(col(s"f_$f")).cast("double").as(s"dl_$f")) ++
        (for { f <- 0 until nf; i <- queryTerms.indices } yield
          size(filter(col(s"f_$f"), x => x === lit(queryTerms(i))))
            .cast("double").as(s"tf_${f}_$i")): _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val statsAggs =
      Seq(count(lit(1)).cast("double").as("n")) ++
        (0 until nf).map(f => avg(col(s"dl_$f")).as(s"avgdl_$f")) ++
        queryTerms.indices.map(i =>
          sum(((0 until nf).map(f => col(s"tf_${f}_$i")).reduce(_ + _) > 0)
            .cast("double")).as(s"df_$i"))
    val stats = proj.agg(statsAggs.head, statsAggs.tail: _*)
    val score = queryTerms.indices.map { i =>
      val tfp = fields.zipWithIndex.map { case ((_, w, bf), f) =>
        // tf > 0 implies dl > 0 and avgdl > 0; the guard keeps an
        // all-empty field at exactly 0 instead of 0/NaN
        when(col(s"tf_${f}_$i") > 0,
          lit(w) * col(s"tf_${f}_$i") /
            (lit(1.0) + lit(bf) * (col(s"dl_$f") / col(s"avgdl_$f") - 1.0)))
          .otherwise(lit(0.0))
      }.reduce(_ + _)
      when(tfp > 0, idf(col("n"), col(s"df_$i")) * tfp / (lit(k1) + tfp))
        .otherwise(lit(0.0))
    }.reduce(_ + _)
    proj.crossJoin(broadcast(stats))
      .select(col("doc_id"), round(score, 4).as("score"))
      .filter(col("score") > 0.0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    * Lafferty 2001) — the language-modeling scorer next to BM25, the
    * other canonical lexical ranking (Indri/Anserini's `-qld`):
    * `score(Q,d) = Σ_{t∈Q} ln( (tf(t,d) + μ·cf(t)/|C|) / (|d| + μ) )`
    * over documents matching ≥ 1 query term; terms the doc lacks still
    * contribute their (negative) smoothed background mass, which is
    * what separates QL from BM25's matched-terms-only sum.
    *
    * DETERMINISM (the t32/s10 discipline): every ln operand is built
    * from exact integer columns cast to double in a fixed order
    * (`(tf + (cf·μ)/|C|) / (dl + μ)` with cf·μ an exact long product),
    * each term's ln quantizes to `round(·, 6)` micro-nats BEFORE the
    * per-doc sum, so the sum is exact integer arithmetic and the final
    * ranking an integer sort in any engine. Ties break by doc id.
    *
    * Scale shape — identical to [[bm25TopK]]'s: ONE corpus scan into a
    * fixed-width (id, dl, tf_i) projection (tf via in-place array
    * filters, no (doc, term) shuffle); collection stats (cf per term +
    * total length |C|) collapse into a single map-side-combinable
    * global aggregate (one broadcastable row); scoring is pure map work
    * against that row; top-k is a TakeOrderedAndProject. Zero
    * full-width shuffles. Caller owns cache release (file contract).
    *
    * @return top-k (doc_id, score_micro): the QL log-probability in
    *         integer micro-nats (more negative = worse fit).
    */
  def qlDirichletTopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], mu: Long = 2000L, k: Int = 10): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(queryTerms.distinct.size == queryTerms.size,
      s"duplicate query terms would double-count: $queryTerms")
    require(mu > 0, s"mu must be positive: $mu")
    val units = docs.select(col(idCol).as("doc_id"),
      TextOps.tokens(col(textCol)).as("toks"))
    val tfCols = queryTerms.zipWithIndex.map { case (t, i) =>
      size(filter(col("toks"), x => x === lit(t))).cast("long").as(s"tf_$i")
    }
    val proj = units.select(
      Seq(col("doc_id"), size(col("toks")).cast("long").as("dl")) ++ tfCols: _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val statsAggs = Seq(sum(col("dl")).as("clen")) ++
      queryTerms.indices.map(i => sum(col(s"tf_$i")).as(s"cf_$i"))
    val stats = proj.agg(statsAggs.head, statsAggs.tail: _*)
    // a query term absent from the WHOLE collection has cf = 0 and the
    // smoothed numerator can hit ln(0) for docs lacking it — drop such
    // terms from the sum (their P is undefined under pure Dirichlet;
    // Anserini does the same by never scoring unseen terms)
    val termMicro = queryTerms.indices.map { i =>
      when(col(s"cf_$i") > 0,
        round(log(
          (col(s"tf_$i").cast("double") +
            (col(s"cf_$i") * lit(mu)).cast("double") / col("clen").cast("double")) /
            (col("dl") + lit(mu)).cast("double")) * 1e6).cast("long"))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    val matched = queryTerms.indices.map(i => col(s"tf_$i")).reduce(_ + _) > 0
    proj.crossJoin(broadcast(stats))
      .filter(matched && col("dl") > 0)
      .select(col("doc_id"), termMicro.as("score_micro"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(k)
  }

  /** Full inverted-index build: (postings, doclens, termdf, one-row
    * stats). The persist-once surface — postings are (term, doc_id, tf),
    * built with the canonical explode → aggregate shuffle; df rolls up
    * from the postings (no second corpus pass). Write postings and df
    * bucketed by term so query-time access prunes to the query's terms.
    */
  def bm25Index(docs: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val base = docs.select(col(idCol).as("doc_id"),
      TextOps.tokens(col(textCol)).as("toks"))
      .persist(StorageLevel.MEMORY_AND_DISK) // one corpus scan, two readers
    val postings = base
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    val doclens = base.select(col("doc_id"), size(col("toks")).as("dl"))
    val termdf = postings.groupBy(col("term"))
      .agg(count(lit(1)).as("df")) // postings are (term, doc) grain
    val stats = doclens.agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl"))
    (postings, doclens, termdf, stats)
  }

  /** PERSIST the inverted index as a term-bucketed layout (the same
    * layout contract the IVF stack set with s04): postings and per-term
    * df written `partitionBy(bucket)` where
    * `bucket = pmod(xxhash64(term), nBuckets)`, so a query's serving
    * scan ([[bm25TopKFromIndex]]) prunes to its terms' bucket
    * directories — at 100 TB that is the difference between reading a
    * few posting buckets and re-scanning the corpus per query batch.
    *
    * Layout shape under `layoutDir`:
    *  - `postings/` — (term, doc_id, tf, dl), bucket-partitioned. The
    *    document length is DENORMALIZED into the posting row (the
    *    classic impact-index trick): scoring then needs NO join against
    *    a corpus-wide doclen table — the one corpus-grain shuffle this
    *    build pays buys join-free serving forever.
    *  - `termdf/` — (term, df), bucket-partitioned (rolled up from the
    *    postings, no second corpus pass).
    *  - `stats/` — one row (n, avgdl).
    *  - `_graft_ident` — written LAST: pins corpus plan + nBuckets, so a
    *    crashed build is never served and a different corpus/bucketing
    *    rebuilds instead of silently reusing stale postings (same ident
    *    discipline as `Similarity.ivfBuildLayout`).
    *
    * tf/dl/df/n are stored as integer-valued DOUBLES: every partial sum
    * over them is exact in any order, which is what lets
    * [[bm25TopKFromIndex]] reproduce [[bm25TopK]]'s scores bit-for-bit.
    * Build is skipped when a completed layout with a matching ident
    * exists — the persist-once path.
    */
  def bm25IndexWrite(
      docs: DataFrame, idCol: String, textCol: String, layoutDir: String,
      nBuckets: Int = 64): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val spark = docs.sparkSession
    val path = new org.apache.hadoop.fs.Path(layoutDir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val ident = s"graft-bm25-v2 nBuckets=$nBuckets " +
      s"cols=$idCol/$textCol " + // code-affecting, invisible to the plan hash
      s"corpus=${docs.queryExecution.analyzed.semanticHash()}"
    val identPath = new org.apache.hadoop.fs.Path(path, "_graft_ident")
    def identMatches: Boolean =
      fs.exists(identPath) && {
        val in = fs.open(identPath)
        try new String(in.readAllBytes(), "UTF-8") == ident
        finally in.close()
      }
    if (!identMatches) {
      if (fs.exists(path)) fs.delete(path, true)
      val base = docs.select(col(idCol).as("doc_id"),
        TextOps.tokens(col(textCol)).as("toks"))
        .persist(StorageLevel.MEMORY_AND_DISK) // one corpus scan, two readers
      try {
        val postings = base
          .select(col("doc_id"), size(col("toks")).cast("double").as("dl"),
            explode(col("toks")).as("term"))
          .groupBy(col("term"), col("doc_id"))
          .agg(count(lit(1)).cast("double").as("tf"), first(col("dl")).as("dl"))
          .withColumn("bucket", pmod(xxhash64(col("term")), lit(nBuckets.toLong)))
        Layout.clusterForWrite(postings, "bucket")
          .write.mode("overwrite").partitionBy("bucket")
          .parquet(s"$layoutDir/postings")
        // df rolls up from the WRITTEN postings — no second corpus pass,
        // and the read-back guarantees df counts exactly what serving
        // will scan
        Layout.clusterForWrite(
            spark.read.parquet(s"$layoutDir/postings")
              .groupBy(col("bucket"), col("term"))
              .agg(count(lit(1)).cast("double").as("df")),
            "bucket")
          .write.mode("overwrite").partitionBy("bucket")
          .parquet(s"$layoutDir/termdf")
        // sumdl rides along (integer-valued double, exact in any sum
        // order) so an APPEND can recompute avgdl without the lossy
        // n*avgdl round-trip: (sumdl+sumdl_batch)/(n+n_batch) is the
        // bit-identical double a full-corpus avg would produce
        base.agg(count(lit(1)).cast("double").as("n"),
            avg(size(col("toks")).cast("double")).as("avgdl"),
            sum(size(col("toks")).cast("double")).as("sumdl"))
          .coalesce(1).write.mode("overwrite").parquet(s"$layoutDir/stats")
      } finally base.unpersist()
      val out = fs.create(identPath, true)
      try out.write(ident.getBytes("UTF-8")) finally out.close()
    }
  }

  /** Hybrid retrieval via reciprocal-rank fusion (Cormack, Clarke &
    * Buettcher 2009): fuse the BM25 sparse ranking with the dense cosine
    * ranking by `sum(1 / (rrfK + rank))` — the modern RAG default, which
    * needs no score normalization across the two signal families because
    * only RANKS enter the fusion.
    *
    * Scale shape: both input rankings are already top-`kEach` bounded
    * (BM25's TakeOrderedAndProject; the ANN bounded heap), so the fusion
    * join runs over two ≤kEach-row lists — list-grain, never corpus
    * grain. Swap the dense input for `Similarity.ivfTopKServing` probes
    * when the corpus outgrows one brute-force scan per query.
    *
    * Determinism: ranks are integer `row_number`s under a total order
    * (score desc, id), and `1.0 / (rrfK + rank)` is the same IEEE
    * division on both engines, so the fused score is exactly
    * reproducible — the p03 oracle replays it bit-for-bit.
    */
  def hybridTopKRrf(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], emb: DataFrame, queryVec: DataFrame,
      k: Int = 10, kEach: Int = 20, rrfK: Int = 60,
      embIdCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sparse = bm25TopK(docs, idCol, textCol, queryTerms, k = kEach)
      .select(col("doc_id"), row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))).as("r_s"))
    val dense = graft.operators.Similarity
      .bruteForceTopK(emb, queryVec, kEach, embIdCol, embCol)
      .select(col("n_id").as("doc_id"), col("rn").as("r_d"))
    sparse.join(dense, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), round(
        coalesce(lit(1.0) / (lit(rrfK) + col("r_s")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("r_d")), lit(0.0)), 6).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id")).limit(k)
  }

  private val BmAppendingSentinel = "graft-bm25-appending! "

  /** Incrementally APPEND a new document batch to a persisted BM25 index
    * layout — the sparse-retrieval sibling of
    * `Similarity.ivfAppendToLayout` (daily-ingest index maintenance
    * without rebuilding over the existing corpus):
    *  - the batch's postings (term, doc_id, tf, dl) append as new files
    *    into their term-bucket partitions (existing posting files are
    *    never read or rewritten);
    *  - per-term df is recomputed for the TOUCHED buckets only, from the
    *    just-appended postings, and dynamically overwritten — untouched
    *    termdf buckets keep their files;
    *  - stats update incrementally: n and sumdl are exact integer-valued
    *    double sums, so `(sumdl + sumdl_batch) / (n + n_batch)` is the
    *    bit-identical avgdl a full rebuild would compute — serving after
    *    an append scores exactly like [[bm25TopK]] over the union corpus.
    *
    * Cost: one pass over the BATCH plus a df roll-up over the touched
    * buckets' postings; the existing corpus is never scanned. Contract:
    * batch doc ids are disjoint from the indexed corpus (a re-delivered
    * doc would double-count — run d10-style incremental dedup upstream).
    * Crash safety mirrors the IVF append: `_graft_ident` is overwritten
    * with an `appending!` sentinel first and rewritten EXTENDED
    * (`+append=<batch plan hash>`) only after every write lands, so a
    * crashed append can never serve ([[bm25TopKFromIndex]] rejects the
    * sentinel) and a base-corpus `bm25IndexWrite` call on an appended
    * layout rebuilds instead of silently reusing it. CHAINED appends are
    * the normal ingest cadence — an already-extended ident accepts the
    * next batch; only a sentinel or pre-v2 layout refuses.
    */
  def bm25IndexAppend(
      newDocs: DataFrame, idCol: String, textCol: String, layoutDir: String,
      nBuckets: Int = 64): Unit = {
    val spark = newDocs.sparkSession
    val path = new org.apache.hadoop.fs.Path(layoutDir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val identPath = new org.apache.hadoop.fs.Path(path, "_graft_ident")
    require(fs.exists(identPath),
      s"no BM25 layout at $layoutDir (build before appending)")
    val prevIdent = {
      val in = fs.open(identPath)
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    require(prevIdent.startsWith("graft-bm25-v2"),
      s"cannot append to layout at $layoutDir: '$prevIdent' — " +
        "rebuild it (bm25IndexWrite) before appending again")
    def writeIdent(s: String): Unit = {
      val out = fs.create(identPath, true)
      try out.write(s.getBytes("UTF-8")) finally out.close()
    }
    writeIdent(BmAppendingSentinel + prevIdent)
    val base = newDocs.select(col(idCol).as("doc_id"),
      TextOps.tokens(col(textCol)).as("toks"))
      .persist(StorageLevel.MEMORY_AND_DISK) // one batch scan, three readers
    try {
      val newPost = base
        .select(col("doc_id"), size(col("toks")).cast("double").as("dl"),
          explode(col("toks")).as("term"))
        .groupBy(col("term"), col("doc_id"))
        .agg(count(lit(1)).cast("double").as("tf"), first(col("dl")).as("dl"))
        .withColumn("bucket", pmod(xxhash64(col("term")), lit(nBuckets.toLong)))
      Layout.clusterForWrite(newPost, "bucket")
        .write.mode("append").partitionBy("bucket")
        .parquet(s"$layoutDir/postings")
      // touched buckets: batch-term-grain, bounded by nBuckets
      val touched = newPost.select(col("bucket")).distinct()
        .collect().map(_.getLong(0)).toSeq
      Layout.clusterForWrite(
          spark.read.parquet(s"$layoutDir/postings")
            .filter(col("bucket").isin(touched: _*))
            .groupBy(col("bucket"), col("term"))
            .agg(count(lit(1)).cast("double").as("df")),
          "bucket")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket").parquet(s"$layoutDir/termdf")
      // old stats collected BEFORE the overwrite touches the directory
      val old = spark.read.parquet(s"$layoutDir/stats").collect()(0)
      val (n0, sumdl0) =
        (old.getAs[Double]("n"), old.getAs[Double]("sumdl"))
      val b = base.agg(count(lit(1)).cast("double").as("nb"),
        sum(size(col("toks")).cast("double")).as("sumdlb")).collect()(0)
      val n2 = n0 + b.getAs[Double]("nb")
      val sumdl2 = sumdl0 + Option(b.getAs[Double]("sumdlb")).getOrElse(0.0)
      import spark.implicits._
      Seq((n2, sumdl2 / n2, sumdl2)).toDF("n", "avgdl", "sumdl")
        .coalesce(1).write.mode("overwrite").parquet(s"$layoutDir/stats")
    } finally base.unpersist()
    writeIdent(prevIdent +
      s" +append=${newDocs.queryExecution.analyzed.semanticHash()}")
  }

  /** Serve a query from the PERSISTED index: reads the query terms'
    * bucket partitions of postings/termdf plus the one-row stats table —
    * the corpus is never touched (ScaleSpec pins both the pruning and
    * the absence of a documents scan). Scoring mirrors [[bm25TopK]]'s
    * arithmetic exactly: the same weight expression per (doc, term)
    * posting row, per-term partial sums (exact — one posting per doc per
    * term, zeros elsewhere), added in fixed term order. The only shuffle
    * is the candidate-grain groupBy(doc_id) — docs containing a query
    * term, never corpus width.
    */
  def bm25TopKFromIndex(
      spark: org.apache.spark.sql.SparkSession, layoutDir: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      k: Int = 10, nBuckets: Int = 64): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(queryTerms.distinct.size == queryTerms.size,
      s"duplicate query terms would double-count: $queryTerms")
    val fs = new org.apache.hadoop.fs.Path(layoutDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val identPath = new org.apache.hadoop.fs.Path(layoutDir, "_graft_ident")
    require(fs.exists(identPath),
      s"no valid BM25 index layout at $layoutDir (crashed or missing build)")
    // a mid-append sentinel must not serve: postings may be half-appended
    val identNow = {
      val in = fs.open(identPath)
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    require(identNow.startsWith("graft-bm25-v"),
      s"BM25 layout at $layoutDir is mid-maintenance or corrupt: '$identNow' — " +
        "rebuild it (bm25IndexWrite) before serving")
    // bucket ids of the query terms, via the SAME hash expression the
    // build used — a LocalTableScan over Q rows, no files touched; the
    // literal IN-list is what lets the planner prune partitions
    import spark.implicits._
    val buckets = queryTerms.toDF("term")
      .select(pmod(xxhash64(col("term")), lit(nBuckets.toLong)).as("bucket"))
      .distinct().as[Long].collect().toSeq
    val postings = spark.read.parquet(s"$layoutDir/postings")
      .filter(col("bucket").isin(buckets: _*) &&
        col("term").isin(queryTerms: _*))
    val termdf = spark.read.parquet(s"$layoutDir/termdf")
      .filter(col("bucket").isin(buckets: _*) &&
        col("term").isin(queryTerms: _*))
      .select(col("term"), col("df"))
    val stats = spark.read.parquet(s"$layoutDir/stats")
    val scored = postings
      .join(broadcast(termdf), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("w", weight(col("tf"), col("dl"), col("n"), col("df"),
        col("avgdl"), k1, b))
    // per-term partial sums + fixed-order add: each sum sees exactly one
    // posting row (rest are zeros), so partial-agg order cannot perturb
    // the double — the final score associates left-to-right exactly like
    // bm25TopK's reduce(_ + _)
    val aggs = queryTerms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, col("w"))).as(s"w_$i")
    }
    val score = queryTerms.indices
      .map(i => coalesce(col(s"w_$i"), lit(0.0))).reduce(_ + _)
    scored.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"), round(score, 4).as("score"))
      .filter(col("score") > 0.0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** PERSIST a positional inverted index — the phrase-query sibling of
    * [[bm25IndexWrite]]'s layout contract. Postings are
    * `(term, doc_id, pos)` with `pos` the SORTED array of 0-based token
    * positions of `term` in the doc, bucket-partitioned by
    * `pmod(xxhash64(term), nBuckets)` so a phrase query's serving scan
    * ([[phraseMatchesFromIndex]]) prunes to its terms' buckets. One
    * corpus scan; the (term, doc)-grain groupBy is the build's only
    * corpus shuffle. Ident discipline matches bm25IndexWrite: written
    * LAST, so a crashed build never serves, and a different corpus or
    * bucketing rebuilds instead of silently reusing stale postings.
    */
  def positionalIndexWrite(
      docs: DataFrame, idCol: String, textCol: String, layoutDir: String,
      nBuckets: Int = 64): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val spark = docs.sparkSession
    val path = new org.apache.hadoop.fs.Path(layoutDir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val ident = s"graft-pos-v1 nBuckets=$nBuckets " +
      s"cols=$idCol/$textCol " + // code-affecting, invisible to the plan hash
      s"corpus=${docs.queryExecution.analyzed.semanticHash()}"
    val identPath = new org.apache.hadoop.fs.Path(path, "_graft_ident")
    def identMatches: Boolean =
      fs.exists(identPath) && {
        val in = fs.open(identPath)
        try new String(in.readAllBytes(), "UTF-8") == ident
        finally in.close()
      }
    if (!identMatches) {
      if (fs.exists(path)) fs.delete(path, true)
      Layout.clusterForWrite(docs
          .select(col(idCol).as("doc_id"),
            posexplode(TextOps.tokens(col(textCol))).as(Seq("pos", "term")))
          .groupBy(col("term"), col("doc_id"))
          .agg(sort_array(collect_list(col("pos").cast("long"))).as("pos"))
          .withColumn("bucket",
            pmod(xxhash64(col("term")), lit(nBuckets.toLong))),
          "bucket")
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(s"$layoutDir/postings")
      val out = fs.create(identPath, true)
      try out.write(ident.getBytes("UTF-8")) finally out.close()
    }
  }

  /** Exact phrase matching served from [[positionalIndexWrite]]'s
    * layout: read ONLY the phrase terms' posting buckets, join the
    * per-(term, doc) position arrays on doc_id, then chain shifted
    * `array_intersect`s — surviving positions p are those where slot i's
    * term sits at p+i for EVERY phrase slot (the classic positional-
    * postings phrase walk, array-encoded so it stays codegen'd). Returns
    * `(doc_id, n_occ)` for docs containing the phrase at least once.
    *
    * Scale shape: serving cost is bucket-grain (a few pruned posting
    * directories), the joins are (term, doc)-grain — corpus text is
    * never touched. A repeated term in the phrase reuses the same
    * posting rows with a different shift, so "the the" counts doubled
    * positions correctly.
    */
  def phraseMatchesFromIndex(
      spark: org.apache.spark.sql.SparkSession, layoutDir: String,
      phrase: Seq[String], nBuckets: Int = 64): DataFrame = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    val fs = new org.apache.hadoop.fs.Path(layoutDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val identPath = new org.apache.hadoop.fs.Path(layoutDir, "_graft_ident")
    require(fs.exists(identPath),
      s"no valid positional index layout at $layoutDir (crashed or missing build)")
    val identNow = {
      val in = fs.open(identPath)
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    require(identNow.startsWith("graft-pos-v"),
      s"positional layout at $layoutDir is corrupt: '$identNow' — " +
        "rebuild it (positionalIndexWrite) before serving")
    import spark.implicits._
    val terms = phrase.distinct
    val buckets = terms.toDF("term")
      .select(pmod(xxhash64(col("term")), lit(nBuckets.toLong)).as("bucket"))
      .distinct().as[Long].collect().toSeq
    val postings = spark.read.parquet(s"$layoutDir/postings")
      .filter(col("bucket").isin(buckets: _*) && col("term").isin(terms: _*))
    val joined = phrase.zipWithIndex.map { case (t, i) =>
        postings.filter(col("term") === t)
          .select(col("doc_id"), col("pos").as(s"p_$i"))
      }
      .reduce((a, b) => a.join(b, "doc_id"))
    val matched = phrase.indices.tail.foldLeft(col("p_0")) { (acc, i) =>
      array_intersect(acc, transform(col(s"p_$i"), p => p - i))
    }
    joined.select(col("doc_id"), size(matched).cast("long").as("n_occ"))
      .filter(col("n_occ") > 0)
  }

  /** Offline IR evaluation of a run file against relevance judgments —
    * the TREC-standard triple (MRR, Recall@k, nDCG@k; Järvelin &
    * Kekäläinen TOIS 2002 for nDCG, binary gains) every retrieval
    * change ships with. One row per judged query; queries with no
    * relevant document retrieved score 0 (the trec_eval convention),
    * and queries present only in the judgments still appear.
    *
    * DETERMINISM: ranks are integers, so `rr_micro = round(1e6 /
    * first_rel_rank)` and each DCG gain `round(1e6 / log2(rank + 1))`
    * quantize to micro-units BEFORE their integer sums (the t43
    * micro-nat discipline — the lone libm log's ulp drift is ~1e-10 of
    * the quantum); recall and ndcg are then single divisions of exact
    * longs, round-6.
    *
    * Scale shape: runs are (queries × depth) and judgments (queries ×
    * judged docs) — both orders of magnitude below corpus grain; one
    * equi-join on (query, doc) + one query-grain aggregate each side.
    * The corpus itself is never touched — evaluation consumes the run
    * file, not the index.
    *
    * @param runs  retrieved lists: (query, doc, rank) with rank 1-based
    *              within each query.
    * @param qrels binary judgments: (query, doc) rows = relevant pairs.
    * @return per query: (query, n_rel, first_rel_rank, rr_micro,
    *         hits_at_k, recall_at_k, dcg_micro, idcg_micro, ndcg).
    */
  def irMetrics(runs: DataFrame, qidCol: String, docCol: String,
      rankCol: String, qrels: DataFrame, relQidCol: String,
      relDocCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val r = runs.select(col(qidCol).as("query"), col(docCol).as("doc"),
      col(rankCol).cast("long").as("rank"))
    val j = qrels.select(col(relQidCol).as("query"), col(relDocCol).as("doc"))
      .distinct()
    val perQ = j.groupBy(col("query")).agg(count(lit(1)).as("n_rel"))
    val gain = round(lit(1e6) / (log(col("rank") + 1.0) / log(lit(2.0))), 0)
      .cast("long")
    val hits = r.join(j, Seq("query", "doc"), "left_semi")
      .groupBy(col("query"))
      .agg(min(col("rank")).as("first_rel_rank"),
        sum(when(col("rank") <= k, 1L).otherwise(0L)).as("hits_at_k"),
        sum(when(col("rank") <= k, gain).otherwise(lit(0L))).as("dcg_micro"))
    // ideal DCG: the same gains over ranks 1..min(n_rel, k) — a pure
    // expression of n_rel, no second pass over anything
    val idcg = aggregate(
      transform(sequence(lit(1L), least(col("n_rel"), lit(k.toLong))),
        rk => round(lit(1e6) / (log(rk + 1.0) / log(lit(2.0))), 0)
          .cast("long")),
      lit(0L), (acc, v) => acc + v)
    perQ.join(hits, Seq("query"), "left")
      .select(col("query"), col("n_rel"), col("first_rel_rank"),
        coalesce(round(lit(1e6) / col("first_rel_rank"), 0).cast("long"),
          lit(0L)).as("rr_micro"),
        coalesce(col("hits_at_k"), lit(0L)).as("hits_at_k"),
        round(coalesce(col("hits_at_k"), lit(0L)).cast("double") /
          col("n_rel").cast("double"), 6).as("recall_at_k"),
        coalesce(col("dcg_micro"), lit(0L)).as("dcg_micro"),
        idcg.as("idcg_micro"),
        round(coalesce(col("dcg_micro"), lit(0L)).cast("double") /
          idcg.cast("double"), 6).as("ndcg"))
  }
}
