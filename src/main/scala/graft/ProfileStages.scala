package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev scratch: run named battery queries under the Bench session config and
  * print stage/task counts + summed task CPU, to expose per-task fixed
  * overhead on tiny iterative stages. Usage: ProfileStages q1[,q2,...] [sf]
  */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.shuffle.sort.bypassMergeThreshold", "0")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskCpu = new AtomicLong
    val taskTime = new AtomicLong
    val perStage = sys.env.contains("GRAFT_PER_STAGE")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        if (perStage && e.stageInfo.taskMetrics != null) {
          val m = e.stageInfo.taskMetrics
          if (m.executorCpuTime / 1000000 >= 200)
            println(f"[stage] id=${e.stageInfo.stageId}%4d tasks=${e.stageInfo.numTasks}%4d " +
              f"cpu=${m.executorCpuTime / 1e9}%7.2f s run=${m.executorRunTime / 1e3}%7.2f s " +
              e.stageInfo.name.take(90))
        }
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (e.taskMetrics != null) {
          taskCpu.addAndGet(e.taskMetrics.executorCpuTime / 1000000)
          taskTime.addAndGet(e.taskMetrics.executorRunTime)
        }
      }
    })

    for (q <- names) {
      stages.set(0); tasks.set(0); taskCpu.set(0); taskTime.set(0)
      val t0 = System.nanoTime
      SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime - t0) / 1e9
      println(f"[stg] $q%-18s wall=$wall%7.2f s stages=${stages.get}%4d " +
        f"tasks=${tasks.get}%5d taskCpu=${taskCpu.get / 1000.0}%8.2f s " +
        f"taskTime=${taskTime.get / 1000.0}%8.2f s " +
        f"cpuPerTask=${if (tasks.get == 0) 0 else taskCpu.get / tasks.get}%4d ms")
    }
    spark.stop()
  }
}
