package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, designed around
  * Spark's shuffle model:
  *
  *  - exact dedup: one hash-groupBy (single shuffle on the fingerprint);
  *  - MinHash+LSH near-dedup: per-row signature computation (codegen'd
  *    higher-order functions, no UDFs), band-bucket shuffle to generate
  *    candidates, then exact Jaccard verification on candidates only —
  *    the classic shingle→minhash→band→bucket-join pipeline that avoids
  *    the all-pairs O(n²) cross join entirely, so it scales to 100 TB:
  *    cost is O(n·k) map-side plus a shuffle keyed by (band, bucket);
  *  - SimHash near-dedup: 64-bit signature, banded by 16-bit chunks
  *    (pigeonhole: hamming distance ≤ 3 ⇒ at least one of 4 chunks equal).
  *
  * Skew note (100 TB): boilerplate/empty documents hash to identical
  * signatures and create mega-buckets; `maxBucket` caps the candidate
  * explosion (pairs within an over-full bucket are dropped and should be
  * handled by the exact-dedup pass that precedes near-dedup).
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

  /** MinHash signature of `k` hashes over distinct shingles. Each hash_j =
    * min over shingles of xxhash64(shingle_hash, j) — per-row, codegen'd,
    * no shuffle. */
  def minhashSignature(shingleCol: Column, k: Int): Column = {
    val hashes = transform(shingleCol, s => xxhash64(s))
    array((0 until k).map { j =>
      array_min(transform(hashes, h => xxhash64(h, lit(j))))
    }: _*)
  }

  /** LSH band keys: `bands` hashes, each over `rowsPerBand` consecutive
    * signature entries. */
  def bandKeys(sigCol: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      struct(
        lit(b).as("band"),
        xxhash64((0 until rowsPerBand)
          .map(r => element_at(sigCol, b * rowsPerBand + r + 1)): _*).as("bucket"))
    }: _*)

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
      k: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.8,
      maxBucket: Int = 1000): DataFrame = {
    val rowsPerBand = k / bands
    val sh = docs
      .select(col(idCol).as("id"), TextOps.shingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
    val banded = sh
      .withColumn("sig", minhashSignature(col("sh"), k))
      .select(col("id"), explode(bandKeys(col("sig"), bands, rowsPerBand)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
    val smallBuckets = banded
      .withColumn("bsize", count(lit(1)).over(Window.partitionBy(col("band"), col("bucket"))))
      .filter(col("bsize") <= maxBucket)
    val a = smallBuckets.select(col("band"), col("bucket"), col("id").as("id_a"))
    val b = smallBuckets.select(col("band"), col("bucket"), col("id").as("id_b"))
    val candidates = a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val withSets = candidates
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
    withSets
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard",
        round(col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")), 3))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 64-bit SimHash over tokens: bit i is set iff the signed sum of token
    * hash bits at position i is positive. Per-row only (explode-free:
    * aggregate over the token array). */
  def simhash(textCol: Column): Column = {
    val hashes = transform(TextOps.tokens(textCol), t => xxhash64(t))
    val bitSums = (0 until 64).map { i =>
      aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(1) === 1, 1L).otherwise(-1L))
    }
    bitSums.zipWithIndex.map { case (s, i) =>
      when(s > 0, shiftleft(lit(1L), i)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
  }

  /** SimHash near-dup candidates: band the 64-bit signature into four
    * 16-bit chunks (hamming ≤ 3 guarantees a shared chunk), bucket-join,
    * verify hamming distance. Returns (id_a, id_b, hamming). */
  def simhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sigs = docs.select(col(idCol).as("id"), simhash(col(textCol)).as("sig"))
    val banded = sigs.select(col("id"), col("sig"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk"),
          shiftright(col("sig"), c * 16).bitwiseAND(0xFFFFL).as("key"))
      }: _*)).as("bk"))
      .select(col("id"), col("sig"), col("bk.chunk").as("chunk"), col("bk.key").as("key"))
    val a = banded.select(col("chunk"), col("key"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("chunk"), col("key"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("chunk", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b")).distinct()
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
