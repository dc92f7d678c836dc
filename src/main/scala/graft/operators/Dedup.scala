package graft.operators

import graft.functions.HashExprs
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, designed around
  * Spark's shuffle model:
  *
  *  - exact dedup: one hash-groupBy (single shuffle on the fingerprint);
  *  - MinHash+LSH near-dedup: per-row signatures via a custom Catalyst
  *    expression (single JVM loop/row — the Column-DSL HOF formulation was
  *    the benchmark hotspot), one shuffle keyed by (band, bucket) that
  *    both applies the skew cap and expands in-bucket candidate pairs
  *    map-side, then exact-Jaccard verification with the (tiny) candidate
  *    set broadcast — the classic shingle→minhash→band→bucket pipeline
  *    with no O(n²) cross join and no windowed re-shuffle, so it scales
  *    to 100 TB: O(n·k) map work + one bucket shuffle + one pair shuffle;
  *  - SimHash near-dedup: 64-bit signature, banded by 16-bit chunks
  *    (pigeonhole: hamming ≤ 3 ⇒ at least one of 4 chunks equal).
  *
  * Skew note (100 TB): boilerplate/empty documents produce identical
  * signatures and mega-buckets; `maxBucket` drops those buckets (their
  * members are exact-dup-like and belong to the exact-dedup pass).
  */
object Dedup {

  /** Exact duplicate marking: rows flagged canonical iff they carry the
    * lowest id for their normalized-text fingerprint. One shuffle. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(col("fp"))
    docs.withColumn("fp", TextOps.fingerprint(col(textCol)))
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("is_canonical", col(idCol) === min(col(idCol)).over(w))
  }

  /** MinHash signature of `k` hashes over distinct shingles — custom
    * Catalyst expression, one pass per row. */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    HashExprs.minhash_sig(transform(shingleCol, s => xxhash64(s)), k)

  /** LSH band keys: `bands` hashes, each over `rowsPerBand` consecutive
    * signature entries. */
  def bandKeys(sigCol: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      struct(
        lit(b).as("band"),
        xxhash64((0 until rowsPerBand)
          .map(r => element_at(sigCol, b * rowsPerBand + r + 1)): _*).as("bucket"))
    }: _*)

  /** In-bucket candidate pairs: group members per (band,bucket), cap skew,
    * expand ordered pairs from the member list (map-side after the one
    * groupBy shuffle). */
  private def bucketPairs(banded: DataFrame, maxBucket: Int): DataFrame =
    banded.groupBy(col("band"), col("bucket"))
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()

  /** Near-duplicate pairs via MinHash LSH with exact-Jaccard verification.
    *
    * @param threshold  exact shingle-Jaccard cutoff applied to candidates
    * @param maxBucket  skew guard: buckets larger than this are dropped
    * @return (id_a, id_b, jaccard) with id_a < id_b, each pair once
    */
  def minhashLsh(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      k: Int = 128,
      bands: Int = 32,
      threshold: Double = 0.8,
      maxBucket: Int = 1000): DataFrame = {
    // band tuning: r = k/bands rows per band. The default r=4,b=32 misses
    // a true j=0.8 pair with probability (1-0.8^4)^32 ≈ 5e-8 (lower for
    // higher j) — safe at the default threshold. Candidates are verified
    // with exact Jaccard, so extra background collisions cost only
    // verification work; raise `bands`' divisor (fewer, longer bands,
    // e.g. b=16,r=8) only when the threshold is ≥0.9 and verification
    // volume dominates.
    val rowsPerBand = k / bands
    // the whole tokenize→hash→shingle→distinct pipeline is ONE custom
    // expression producing sorted long arrays (the Column-DSL chain built
    // ~300 intermediate strings/arrays per row and was recomputed on every
    // reuse of this subtree); signatures, banding and exact verification
    // all run on the long arrays (hash collisions perturb Jaccard with
    // p≈2^-64)
    val sh = docs
      .select(col(idCol).as("id"),
        HashExprs.shingle_hashes(col(textCol), shingleSize).as("shh"))
      .filter(size(col("shh")) > 0)
    val banded = sh
      .withColumn("sig", HashExprs.minhash_sig(col("shh"), k))
      .select(col("id"), explode(bandKeys(col("sig"), bands, rowsPerBand)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
    val candidates = bucketPairs(banded, maxBucket)
    // candidate pairs are tiny vs the corpus: broadcast them into the
    // first shingle join; the second join shuffles only the slim
    // (id, long-array) projection
    sh.select(col("id").as("id_a"), col("shh").as("sh_a"))
      .join(broadcast(candidates), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("shh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard",
        round(HashExprs.sorted_jaccard(col("sh_a"), col("sh_b")), 3))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 64-bit SimHash over tokens — custom Catalyst expression, one pass.
    * `tokenHash` maps each token to a long; the xxhash64 default is the
    * fast path, [[portableTokenHash63]] the cross-engine-replicable one. */
  def simhash(
      textCol: Column,
      tokenHash: Column => Column = xxhash64(_)): Column =
    HashExprs.simhash64(transform(TextOps.tokens(textCol), tokenHash))

  /** 63-bit token hash built from two md5 halves — bit-for-bit
    * reproducible in any engine with md5 + integer arithmetic (the top
    * bit is masked off so no step overflows a signed 64-bit int). Used
    * when a SimHash result must be verifiable against an external oracle;
    * ~2× the cost of xxhash64. */
  def portableTokenHash63(t: Column): Column =
    shiftleft(
      conv(substring(md5(t), 1, 8), 16, 10).cast("long")
        .bitwiseAND(lit(0x7FFFFFFFL)), 32)
      .bitwiseOR(conv(substring(md5(t), 9, 8), 16, 10).cast("long"))

  /** SimHash near-dup candidates: band the 64-bit signature into four
    * 16-bit chunks (hamming ≤ 3 guarantees a shared chunk — pigeonhole),
    * bucket-join, verify hamming distance. Returns (id_a, id_b, hamming).
    *
    * With `maxHamming <= 3` and no bucket hitting `maxBucket`, the result
    * is EXACTLY the all-pairs hamming filter (what the d03 oracle checks);
    * beyond 3 the banding is a recall/cost trade. Docs with no tokens are
    * excluded — their signature would be a meaningless all-zero value
    * pairing every empty doc with every other (that's exact-dedup's job).
    */
  def simhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      maxBucket: Int = 1000,
      tokenHash: Column => Column = xxhash64(_)): DataFrame = {
    val sigs = docs
      .filter(size(TextOps.tokens(col(textCol))) > 0)
      .select(col(idCol).as("id"), simhash(col(textCol), tokenHash).as("sig"))
    val banded = sigs.select(col("id"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("band"),
          shiftright(col("sig"), c * 16).bitwiseAND(0xFFFFL).as("bucket"))
      }: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
    val candidates = bucketPairs(banded, maxBucket)
    sigs.select(col("id").as("id_a"), col("sig").as("sig_a"))
      .join(broadcast(candidates), Seq("id_a"))
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Connected components over an undirected edge list `(id_a, id_b)`:
    * per round, every node takes the minimum label in its closed
    * neighborhood, then labels are SHORTCUT one hop (`label :=
    * label-of-label`, pointer doubling) — together this converges in
    * O(log diameter) rounds, so `maxIter = 25` handles astronomically
    * long chains, not just the tiny diameters of near-dup clusters.
    * Plain propagation alone would need O(diameter) rounds and silently
    * mislabel any component longer than the iteration cap; if the cap is
    * somehow still hit, this throws rather than returning wrong labels.
    *
    * Each round is two shuffles (neighbor-min groupBy, shortcut join);
    * `localCheckpoint` truncates the growing lineage (an unchecked
    * iterative plan re-executes every prior round at each action and
    * overflows the optimizer at scale). The large-star/small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce")
    * is the same join skeleton applied to a shrinking edge set — the
    * upgrade path if round COST (not count) ever dominates.
    *
    * @return (id, label) — label = min node id reachable; one row per
    *         node that appears in `edges`.
    */
  /** Release the cached blocks behind a superseded `localCheckpoint`.
    * Non-blocking: the blocks are dropped asynchronously while the next
    * round runs. A released checkpoint CANNOT be recomputed (its lineage
    * is truncated), so this is only ever called on frames no later plan
    * depends on. */
  private def releaseCheckpoint(df: DataFrame): Unit =
    org.apache.spark.sql.graftbridge.Bridge.checkpointRdds(df)
      .foreach(_.unpersist(blocking = false))

  def connectedComponents(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    // materialize the edge set once: it is joined every round, and an
    // expensive upstream (e.g. the whole LSH pipeline) must not re-execute
    // per iteration
    val sym = edges
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint()
    try {
      var labels = sym.select(col("src").as("id")).distinct()
        .withColumn("label", col("id"))
        .localCheckpoint()
      var changed = 1L
      var i = 0
      try {
        while (changed > 0 && i < maxIter) {
          val nbrMin = sym
            .join(labels.withColumnRenamed("id", "src"), Seq("src"))
            .groupBy(col("dst").as("id"))
            .agg(min(col("label")).as("nbr_label"))
          // materialize: the shortcut step self-joins this frame — without a
          // checkpoint the neighbor-min aggregation executes twice per round
          val propagated = labels.alias("cur")
            .join(nbrMin.alias("nbr"), Seq("id"), "left_outer")
            .select(col("id"),
              least(col("cur.label"),
                coalesce(col("nbr_label"), col("cur.label"))).as("label"))
            .localCheckpoint()
          // pointer doubling: follow the label one hop (labels form a forest
          // rooted at each component minimum, so label-of-label is monotone
          // non-increasing and halves path lengths every round)
          val next = propagated.alias("a")
            .join(propagated.select(col("id").as("label"), col("label").as("ll"))
              .alias("b"), Seq("label"), "left_outer")
            .select(col("id"),
              least(col("label"), coalesce(col("ll"), col("label"))).as("label"))
            .localCheckpoint()
          changed = next.alias("n")
            .join(labels.alias("o"), Seq("id"))
            .filter(col("n.label") =!= col("o.label"))
            .count()
          // both checkpoints are eager, so everything derived from the
          // superseded round is already materialized — release it now.
          // Leaving this to the ContextCleaner pins O(rounds) block sets
          // per call in a shared session (measured: a 13× slowdown of
          // UNRELATED queries later in the same session).
          releaseCheckpoint(propagated)
          releaseCheckpoint(labels)
          labels = next
          i += 1
        }
        require(changed == 0,
          s"connectedComponents did not converge in $maxIter rounds")
        labels
      } catch {
        case e: Throwable => releaseCheckpoint(labels); throw e
      }
    } finally {
      // the edge set is only read inside the loop; the result plan reads
      // the final labels checkpoint alone. That last (id,label) block set
      // must stay cached for the caller to consume — it is reclaimed by
      // the ContextCleaner once the caller drops the frame.
      releaseCheckpoint(sym)
    }
  }
}
