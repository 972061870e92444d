package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev tool: run one SparkEntry query and print every stage's wall time,
  * task count, and name — pinpoints where a slow query spends its time.
  * Usage: runMain graft.tools.StageProfile <query> [sfDir]
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Smoke.session("32")
    val stages = mutable.ArrayBuffer.empty[(Int, Long, Int, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val info = sc.stageInfo
        val dur = for {
          s <- info.submissionTime; c <- info.completionTime
        } yield c - s
        stages.synchronized {
          stages += ((info.stageId, dur.getOrElse(-1L), info.numTasks, info.name.take(120)))
        }
      }
    })
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"[stageprofile] $q total: $total%.2f s, ${stages.size} stages")
    stages.sortBy(-_._2).take(25).foreach { case (id, dur, tasks, name) =>
      println(f"[stage] $id%4d ${dur / 1000.0}%8.2f s  $tasks%4d tasks  $name")
    }
    spark.stop()
  }
}
