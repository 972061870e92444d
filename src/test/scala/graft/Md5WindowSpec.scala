package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Value-equality contract of the round-21 compiled md5 window kernels
  * ([[graft.functions.CharWindowMd5Hashes]],
  * [[graft.functions.CharBigramBucketCounts]]) against the SQL
  * explode+substring+md5+conv chains they replaced — the chains ARE
  * what the DuckDB oracle still replays, so these assertions are the
  * oracle-equivalence proof at the kernel boundary. Fixtures cover
  * ASCII, multi-byte UTF-8 (char windows must be code-point windows,
  * not byte windows), and the degenerate lengths each chain's edge
  * arithmetic produces.
  */
class Md5WindowSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "",                                      // empty
    "x",                                     // single char
    "short",                                 // below the kmv width
    "exactly8",                              // == width
    "the quick brown fox jumps over the lazy dog",
    "héllo wörld ünïcode çhars àçcénts",     // 2-byte sequences
    "日本語のテキストですよ、これは窓です",      // 3-byte sequences
    "mixed ascii と日本語 and ünïcode")        // mixed widths

  private def docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    .toDF("doc_id", "text")

  test("char_window_md5 equals the explode+substring+md5+conv chain (kmv shingles)") {
    GraftFunctions.register(spark)
    val sql = docs.filter(length(col("text")) >= 8)
      .select(col("doc_id"),
        explode(expr("sequence(1, length(text) - 7)")).as("i"), col("text"))
      .select(col("doc_id"), (col("i") - 1).cast("long").as("pos"),
        expr("CAST(conv(substring(md5(substring(text, i, 8)), 1, 8), 16, 10) AS BIGINT)").as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(x => (x._1, x._2))
    val kern = docs
      .select(col("doc_id"),
        posexplode(GraftFunctions.charWindowMd5(col("text"), 8)).as(Seq("pos", "h")))
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2))).sortBy(x => (x._1, x._2))
    assert(sql.nonEmpty, "fixture drift: no window survived the length filter")
    assert(sql.toSeq == kern.toSeq,
      sql.zip(kern).collectFirst { case (a, b) if a != b => s"$a vs $b" }
        .getOrElse(s"row counts ${sql.length} vs ${kern.length}"))
    // the sub-width rows yield an EMPTY array, never a hash
    val short = docs.filter(length(col("text")) < 8)
      .select(size(GraftFunctions.charWindowMd5(col("text"), 8)).as("n"))
      .collect().map(_.getInt(0))
    assert(short.nonEmpty && short.forall(_ == 0))
  }

  test("char_bigram_buckets equals the explode+md5-bucket aggregate chain (lang features)") {
    GraftFunctions.register(spark)
    val b = 4
    val lowered = docs.select(col("doc_id"), lower(col("text")).as("t"))
    val sql = lowered
      .select(col("doc_id"),
        explode(sequence(lit(1), greatest(length(col("t")) - 1, lit(1)))).as("i"), col("t"))
      .select(col("doc_id"),
        expr(s"CAST(conv(substring(md5(substring(t, i, 2)), 1, 4), 16, 10) AS BIGINT) % $b")
          .as("bucket"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bi"),
        (0 until b).map(k => sum(when(col("bucket") === k, 1L).otherwise(0L)).as(s"b$k")): _*)
      .collect()
      .map(r => (r.getLong(0), (0 to b).map(j => r.getLong(1 + j)).toSeq))
      .sortBy(_._1)
    val kern = lowered
      .select(col("doc_id"), GraftFunctions.charBigramBuckets(col("t"), b).as("bc"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1)
    assert(sql.length == texts.length && kern.length == texts.length)
    sql.zip(kern).foreach { case ((id1, s), (id2, k)) =>
      assert(id1 == id2 && s == k, s"doc $id1: sql $s vs kernel $k")
    }
  }
}
