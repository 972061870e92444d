package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Deduplication operators (SURVEY.md §2C; north-star mandate).
  *
  * Three tiers, by cost:
  *   1. exact — hash group-by on content (or `dropDuplicates`);
  *   2. near-dup exact verify — shingle inverted-index self-join +
  *      Jaccard (no cross join: candidates only materialize for pairs
  *      that share ≥1 shingle);
  *   3. near-dup at scale — banded MinHash LSH generating candidates,
  *      then exact Jaccard verify on candidates only. With 128 hashes in
  *      32 bands × 4 rows, P(candidate | J=0.8) ≈ 1 − (1−0.8⁴)³² > 1−6e-8,
  *      so the verified output equals tier 2's at the 0.8 threshold while
  *      the candidate-generation cost is linear in docs instead of
  *      quadratic in shared-shingle pairs — the 100 TB path.
  */
object Dedup {

  /** Distinct 8-char shingles per document. */
  def allShingles(docs: DataFrame, n: Int = 8): DataFrame =
    docs.select(col("doc_id"),
        explode(expr(s"transform(sequence(1, greatest(length(text) - ${n - 1}, 1)), i -> substring(text, i, $n))")).as("ng"))
      .distinct()

  /** Shingles with document frequency ≤ `maxDf` (stop-shingle removal).
    * Without the cap the inverted-index self-join is quadratic in each
    * shingle's df — measured 280M candidate pairs at sf0.1 vs 2M with
    * df≤100 — and ubiquitous shingles carry no near-dup signal anyway.
    * This is THE knob that keeps the join linear-ish at 100 TB.
    */
  def shingles(docs: DataFrame, n: Int = 8, maxDf: Int = 100): DataFrame = {
    val g = allShingles(docs, n)
    val rare = g.groupBy(col("ng")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select(col("ng"))
    g.join(rare, "ng").select(col("doc_id"), col("ng"))
  }

  /** Exact-dup profile per language: row counts vs distinct contents.
    * At scale this is a single hash aggregate; `sha2(text, 256)` would
    * stand in for `text` as the grouping key to bound key width.
    */
  def exactProfile(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           countDistinct(col("text")).as("n_distinct_text"),
           countDistinct(col("source")).as("n_sources"))
      .orderBy(col("lang"))

  /** Exact near-dup pairs: 8-gram Jaccard ≥ 0.8 via inverted-index
    * self-join. Shuffles on `ng` once; pair aggregation shuffles on
    * (d1, d2). No cross join anywhere.
    */
  def ngramJaccardPairs(spark: SparkSession, dir: String): DataFrame = {
    val g = shingles(Tables.documents(spark, dir))
    val n = g.groupBy(col("doc_id")).agg(count(lit(1)).as("n_ng"))
    val shared = g.as("a").join(g.as("b"),
        col("a.ng") === col("b.ng") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(n.select(col("doc_id").as("d1"), col("n_ng").as("n1")), "d1")
      .join(n.select(col("doc_id").as("d2"), col("n_ng").as("n2")), "d2")
      .withColumn("jac", col("shared") / (col("n1") + col("n2") - col("shared")))
      .filter(col("jac") >= 0.8)
      .select(col("d1"), col("d2"), col("jac"))
      .orderBy(col("d1"), col("d2"))
  }

  private val NumHashes = 128
  private val Bands = 32 // 4 rows per band

  /** MinHash signatures: min over shingles of xxhash64(ng, i) for seed
    * index i — a seeded-hash family with no arithmetic (ANSI mode
    * rejects the classic overflow-wrapping multiply-add). Returned as
    * one array<long> per doc.
    */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    val g = shingles(docs)
    // explode a LITERAL index array, then hash with a plain codegen'd
    // xxhash64(ng, i) — a `transform` lambda here would run interpreted
    // per shingle (measured 31.8 s → ~8 s at sf0.1). The partial min
    // aggregate collapses the 128× blowup before any shuffle.
    g.withColumn("i", explode(typedLit((0 until NumHashes).toArray)))
      .select(col("doc_id"), col("i"), xxhash64(col("ng"), col("i")).as("v"))
      .groupBy(col("doc_id"), col("i"))
      .agg(min(col("v")).as("mv"))
      .groupBy(col("doc_id"))
      .agg(expr("transform(array_sort(collect_list(struct(i, mv)), (l, r) -> case when l.i < r.i then -1 when l.i > r.i then 1 else 0 end), s -> s.mv)").as("sig"))
  }

  /** LSH candidate pairs → exact-Jaccard verify ≥ 0.8. Same contract as
    * [[ngramJaccardPairs]], near-linear candidate generation.
    */
  def minhashLshPairs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val sig = minhashSignatures(docs)
    val rowsPerBand = NumHashes / Bands
    val banded = sig.select(col("doc_id"),
        posexplode(expr(s"transform(sequence(0, ${Bands - 1}), b -> hash(slice(sig, b * $rowsPerBand + 1, $rowsPerBand)))")).as(Seq("band", "bsig")))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    // exact verify on candidates only
    val g = shingles(docs)
    val n = g.groupBy(col("doc_id")).agg(count(lit(1)).as("n_ng"))
    val shared = cand
      .join(g.select(col("doc_id").as("d1"), col("ng").as("ng1")), "d1")
      .join(g.select(col("doc_id").as("d2"), col("ng").as("ng2")), "d2")
      .filter(col("ng1") === col("ng2"))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(n.select(col("doc_id").as("d1"), col("n_ng").as("n1")), "d1")
      .join(n.select(col("doc_id").as("d2"), col("n_ng").as("n2")), "d2")
      .withColumn("jac", col("shared") / (col("n1") + col("n2") - col("shared")))
      .filter(col("jac") >= 0.8)
      .select(col("d1"), col("d2"), col("jac"))
      .orderBy(col("d1"), col("d2"))
  }

  /** SimHash (64-bit, xxhash64 token hashes): per-doc fingerprint whose
    * Hamming distance tracks token-multiset similarity. Spark-only
    * (bit-twiddling has no portable DuckDB twin) — rows-only check +
    * ScalaTest. Scale: one narrow explode + two hash aggregates.
    */
  def simhash(docs: DataFrame): DataFrame = {
    val tokens = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .withColumn("h", xxhash64(col("tok")))
    tokens
      // literal-array explode + codegen'd bit test (not an interpreted
      // transform lambda); partial sum folds 64× rows before shuffling
      .withColumn("bit", explode(typedLit((0 until 64).toArray)))
      .select(col("doc_id"), col("bit"),
        when(expr("(h >> bit) % 2 != 0"), lit(1L)).otherwise(lit(-1L)).as("contrib"))
      .groupBy(col("doc_id"), col("bit"))
      .agg(sum(col("contrib")).as("s"))
      .withColumn("bitval", when(col("s") > 0, lit(1L)).otherwise(lit(0L)))
      .groupBy(col("doc_id"))
      // bit_or, not sum: bit 63 is Long.MinValue and ANSI mode would
      // reject the signed-overflow addition
      .agg(expr("bit_or(shiftleft(bitval, bit))").as("simhash"))
      .orderBy(col("doc_id"))
  }

  def simhashQuery(spark: SparkSession, dir: String): DataFrame =
    simhash(Tables.documents(spark, dir))

  /** Content fingerprints (md5 — same hex output in DuckDB, so fully
    * oracle-checkable) with a keep/drop verdict per exact-dup group.
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .withColumn("fp", md5(col("text")))
    val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    d.withColumn("keep", (row_number().over(w) === 1))
      .select(col("doc_id"), col("fp"), col("keep"))
      .orderBy(col("doc_id"))
  }
}
