package graft.ext

import java.nio.file.{Files, Paths, StandardCopyOption}

/** The Frames memo's invalidation contract (review r12): fingerprints
  * list only the tables a KEY declares, so an embeddings rewrite must
  * not invalidate document-side frames (or vice versa), and a change
  * to a key's own table must rebuild it.
  */
class FramesSpec extends graft.SparkSpec {

  test("memo invalidation is scoped to the key's declared tables") {
    val tmp = Files.createTempDirectory("graft_frames")
    for (t <- Seq("documents.parquet", "embeddings.parquet"))
      Files.copy(Paths.get(s"/root/testdata/sf0.001/$t"), tmp.resolve(t),
        StandardCopyOption.REPLACE_EXISTING)
    val dir = tmp.toString
    def touch(t: String): Unit = {
      val f = tmp.resolve(t).toFile
      // mtime participates in the fingerprint; jump it far enough that
      // coarse-grained filesystems can't collapse the change
      assert(f.setLastModified(f.lastModified() + 60000))
    }
    var docBuilds = 0
    def docFrame = Dedup.Frames.getOrCompute(spark, s"spec_doc:$dir", dir) {
      docBuilds += 1; spark.range(1).toDF("x")
    }
    var embBuilds = 0
    def embFrame = Dedup.Frames.getOrCompute(spark, s"spec_emb:$dir", dir,
        tables = Seq("embeddings.parquet")) {
      embBuilds += 1; spark.range(1).toDF("x")
    }
    docFrame; docFrame; embFrame; embFrame
    assert(docBuilds == 1 && embBuilds == 1, "second access must hit the memo")

    touch("embeddings.parquet")
    docFrame; embFrame
    assert(docBuilds == 1, "an embeddings rewrite must NOT invalidate a document-scoped frame")
    assert(embBuilds == 2, "an embeddings rewrite MUST invalidate an embeddings-scoped frame")

    touch("documents.parquet")
    docFrame; embFrame
    assert(docBuilds == 2, "a documents rewrite must invalidate the document-scoped frame")
    assert(embBuilds == 2, "a documents rewrite must not touch the embeddings-scoped frame")
  }
}
