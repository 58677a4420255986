package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables._

/** PLANTED-skew measurement for the salted operators (round-19, VERDICT
  * #6): `q_join_salted` / `q_agg_salted` are row-identical to their plain
  * forms by spec, but their PAYOFF had never been measured against an
  * actually skewed key. This tool plants a 20%-hot-key variant of the
  * join input (one orderkey absorbs 20% of all lineitem rows — rewritten
  * through parquet so scan stats are realistic) and times, at each sf:
  *
  *   - the plain shuffle join (AQE skew-join OFF — the naked skew cost),
  *   - ScaleOps.saltedJoin (8 salts, same conditions),
  *   - the plain join with AQE skew-join ON (Spark's built-in answer),
  *
  * reporting median wall AND max single-task time (the straggler the
  * salting exists to break up). autoBroadcastJoinThreshold is forced to
  * -1 for all three arms: at these sfs the dimension side would
  * broadcast and no skew would ever reach a shuffle — the arm measures
  * the large-large regime the operator is insurance for. The agg twin
  * plants 20% of events onto one event_type and compares the direct
  * groupBy against the two-phase salted form, for BOTH a map-combinable
  * state (sum — expected parity: Spark's partial aggregation already
  * absorbs hot keys) and a high-cardinality state (collect_list length —
  * the case the q_agg_salted scaladoc names). Session confs are
  * snapshot/restored via explicit-only getAll (the round-6 lesson).
  *
  * Usage: sbt "runMain graft.tools.SkewArmBench [sfDir ...]"
  *   (default: /root/repo/.localdata/sf1 and .localdata/sf4)
  */
object SkewArmBench {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/repo/.localdata/sf1", "/root/repo/.localdata/sf4")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val trials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // straggler evidence: max single-task duration across the timed body
    val maxTaskMs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val d = e.taskInfo.duration
        var cur = maxTaskMs.get()
        while (d > cur && !maxTaskMs.compareAndSet(cur, d)) cur = maxTaskMs.get()
      }
    })

    def force(df: DataFrame): Unit =
      df.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())
    def deepClean(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }
    // explicit-only conf snapshot (getOption would pin global defaults)
    def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
      val prev = kvs.map { case (k, _) => k -> spark.conf.getAll.get(k) }
      kvs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body
      finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    // deepClean runs BETWEEN trials, after the nanoTime delta is captured —
    // clearCache + unpersist + System.gc inside the timed region inflated
    // every arm's absolute wall (round-19 ADVICE); the cross-arm direction
    // survived, but the published walls were noisier than the work.
    def time(sf: String, label: String)(body: => Unit): Unit = {
      body // warm
      deepClean()
      val runs = Seq.fill(trials) {
        maxTaskMs.set(0)
        val t0 = System.nanoTime(); body
        val dt = (System.nanoTime() - t0) / 1e9
        val mt = maxTaskMs.get() / 1000.0
        deepClean()
        (dt, mt)
      }
      val wall = runs.map(_._1).sorted.apply(trials / 2)
      val task = runs.map(_._2).sorted.apply(trials / 2)
      println(f"""{"sf":"$sf","arm":"$label","wall_sec":$wall%.3f,"max_task_sec":$task%.3f}""")
    }

    for (d <- dirs) {
      val base = java.nio.file.Files.createTempDirectory("skew_arm").toString
      try {
        // ---- planted 20%-hot-key join input ----
        val hotKey = orders(spark, d).agg(min($"o_orderkey")).head.getLong(0)
        lineitem(spark, d).select($"l_orderkey", $"l_extendedprice")
          .withColumn("l_orderkey",
            when(pmod(xxhash64($"l_orderkey", $"l_extendedprice"), lit(1000)) < 200,
              lit(hotKey)).otherwise($"l_orderkey"))
          .write.mode("overwrite").parquet(s"$base/lineitem_skewed")
        val li = spark.read.parquet(s"$base/lineitem_skewed")
        val nTotal = li.count()
        val nHot = li.filter($"l_orderkey" === hotKey).count()
        println(s"""{"sf":"$d","arm":"plant","rows":$nTotal,"hot_rows":$nHot,"hot_key":$hotKey}""")
        val ord = orders(spark, d)
          .select($"o_orderkey".as("l_orderkey"), $"o_orderpriority")
        def agg(df: DataFrame): Unit =
          force(df.groupBy($"o_orderpriority")
            .agg(count(lit(1)).as("n_items"), sum($"l_extendedprice").as("rev")))
        withConfs(
          "spark.sql.autoBroadcastJoinThreshold" -> "-1",
          "spark.sql.adaptive.skewJoin.enabled" -> "false") {
          time(d, "join_plain_skewed")(agg(li.join(ord, Seq("l_orderkey"))))
          time(d, "join_salted_skewed")(agg(graft.operators.ScaleOps.saltedJoin(
            li, ord, "l_orderkey", saltFactor = 8,
            hotKeyThreshold = 1000L, sampleFraction = 0.02)))
        }
        withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1",
          "spark.sql.adaptive.skewJoin.enabled" -> "true") {
          time(d, "join_plain_aqe_skew")(agg(li.join(ord, Seq("l_orderkey"))))
        }

        // ---- planted 20%-hot-key agg input ----
        events(spark, d).select($"event_id", $"event_type", $"value", $"user_id")
          .withColumn("event_type",
            when(pmod(xxhash64($"event_id"), lit(1000)) < 200, lit("hot_type"))
              .otherwise($"event_type"))
          .write.mode("overwrite").parquet(s"$base/events_skewed")
        val ev = spark.read.parquet(s"$base/events_skewed")
        def directSum(): Unit =
          force(ev.groupBy($"event_type")
            .agg(count(lit(1)).as("n"), sum($"value").as("v")))
        def saltedSum(): Unit =
          force(ev.withColumn("__salt", pmod(hash($"event_id"), lit(16)))
            .groupBy($"event_type", $"__salt")
            .agg(count(lit(1)).as("pc"), sum($"value").as("pv"))
            .groupBy($"event_type")
            .agg(sum($"pc").as("n"), sum($"pv").as("v")))
        // high-cardinality state: the hot group's list lands on one reducer
        def directList(): Unit =
          force(ev.groupBy($"event_type")
            .agg(size(collect_list($"user_id")).as("n_users")))
        def saltedList(): Unit =
          force(ev.withColumn("__salt", pmod(hash($"event_id"), lit(16)))
            .groupBy($"event_type", $"__salt")
            .agg(size(collect_list($"user_id")).as("pn"))
            .groupBy($"event_type")
            .agg(sum($"pn").as("n_users")))
        time(d, "agg_sum_direct")(directSum())
        time(d, "agg_sum_salted")(saltedSum())
        time(d, "agg_list_direct")(directList())
        time(d, "agg_list_salted")(saltedList())
      } finally graft.util.Fs.deleteRecursively(base)
      deepClean()
    }
    spark.stop()
  }
}
