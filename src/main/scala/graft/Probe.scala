package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, TimestampNTZType}
import org.apache.spark.storage.StorageLevel

/** Scratch profiling main for the optimization round — times plan
  * variants of the hot queries through the noop sink so the expensive
  * operator can be attributed (guide §1). Not part of the contract.
  * Usage: runMain graft.Probe <sfDir> <reps> [section ...]
  * Sections: conf mat stream pagerank tfidf substr (default: all)
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val sections = args.drop(2).toSet
    def on(s: String): Boolean = sections.isEmpty || sections.contains(s)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-44s min=${ts.min}%.3f p50=${ts.sorted.apply(ts.size / 2)}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // ---- available streaming/state-store confs (name check) ----
    if (on("conf")) {
      spark.sessionState.conf.getAllDefinedConfs
        .filter(c => c._1.contains("rocksdb") || c._1.contains("noDataMicro")
          || c._1.contains("stateStore") || c._1.contains("maintenance"))
        .foreach { case (k, v, _, _) => println(s"[conf] $k = $v") }
    }

    // ---- Materialize: persist vs localCheckpoint on the six sites ----
    if (on("mat")) {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      noop(li)
      val proj = li.repartition(32).select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") * (lit(1) + col("l_tax")), 4).as("gross"),
        round(abs(col("l_discount") - 0.05), 4).as("disc_dev"),
        round(sqrt(col("l_quantity")), 6).as("qty_sqrt"),
        round(pow(col("l_quantity"), 2), 2).as("qty_sq"),
        round(log(col("l_extendedprice")), 6).as("price_ln"),
        floor(col("l_extendedprice")).as("price_floor"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        (col("l_linenumber") % 3).as("ln_mod3"),
        greatest(col("l_discount"), col("l_tax")).as("max_rate"))
      val sortCols = Seq("l_orderkey", "l_linenumber", "gross", "disc_dev",
        "qty_sqrt", "qty_sq", "price_ln", "price_floor", "price_ceil",
        "ln_mod3", "max_rate")
      time("fnmath ckpt+orderBy") {
        val p = proj.localCheckpoint(true)
        noop(p.orderBy(sortCols.map(col): _*))
        p.queryExecution.analyzed.foreach {
          case lr: org.apache.spark.sql.execution.LogicalRDD =>
            lr.rdd.unpersist(false); ()
          case _ => ()
        }
      }
      time("fnmath persist(lazy)+orderBy") {
        val p = proj.persist(StorageLevel.MEMORY_AND_DISK)
        noop(p.orderBy(sortCols.map(col): _*))
        p.unpersist(false)
      }
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      noop(docs)
      val email = "[a-z0-9._-]+@[a-z0-9.-]+"
      val digits = "[0-9]{6,}"
      val piiProj = docs.select(col("doc_id"),
        expr(s"size(regexp_extract_all(text, '$email', 0))").cast("long").as("n_emails"),
        expr(s"size(regexp_extract_all(regexp_replace(text, '$email', '<EMAIL>'), '$digits', 0))")
          .cast("long").as("n_digit_runs"),
        md5(regexp_replace(regexp_replace(col("text"), email, "<EMAIL>"),
          digits, "<NUM>")).as("scrubbed_md5"))
      time("pii ckpt+orderBy") {
        val p = piiProj.localCheckpoint(true)
        noop(p.orderBy("doc_id"))
        p.queryExecution.analyzed.foreach {
          case lr: org.apache.spark.sql.execution.LogicalRDD =>
            lr.rdd.unpersist(false); ()
          case _ => ()
        }
      }
      time("pii persist(lazy)+orderBy") {
        val p = piiProj.persist(StorageLevel.MEMORY_AND_DISK)
        noop(p.orderBy("doc_id"))
        p.unpersist(false)
      }
      val ev = spark.read.parquet(s"$sfDir/events.parquet")
      noop(ev)
      val mapProj = ev
        .withColumn("m", from_json(col("props"),
          org.apache.spark.sql.types.DataType.fromDDL("map<string,int>")))
        .select(col("event_id"),
          array_join(array_sort(map_keys(col("m"))), ",").as("keys_csv"),
          size(col("m")).cast("long").as("n_keys"),
          element_at(col("m"), "k").as("k_val"))
      time("fn_map ckpt+orderBy") {
        val p = mapProj.localCheckpoint(true)
        noop(p.orderBy("event_id"))
        p.queryExecution.analyzed.foreach {
          case lr: org.apache.spark.sql.execution.LogicalRDD =>
            lr.rdd.unpersist(false); ()
          case _ => ()
        }
      }
      time("fn_map persist(lazy)+orderBy") {
        val p = mapProj.persist(StorageLevel.MEMORY_AND_DISK)
        noop(p.orderBy("event_id"))
        p.unpersist(false)
      }
    }

    // ---- stream machinery attribution ----
    def streamEventsP(): DataFrame = {
      val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
      val raw = spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(sfDir)
      raw.schema("ts").dataType match {
        case LongType => raw.withColumn("ts", expr(Tables.nsToMicrosTs))
        case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
        case _ => raw
      }
    }
    val probeSeq = new java.util.concurrent.atomic.AtomicInteger(0)
    def withConfs(pairs: (String, String)*)(f: => Unit): Unit = {
      val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      try f finally olds.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
    val ROCKS = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    def ckptScope(f: String => Unit): Unit = {
      val base = s"/dev/shm/graft_probe_${ProcessHandle.current().pid()}_${probeSeq.incrementAndGet()}"
      graft.Fs.rmTree(new java.io.File(base))
      try f(base) finally graft.Fs.rmTree(new java.io.File(base))
    }
    def memSink(df: DataFrame, skipNoData: Boolean): Unit = ckptScope { base =>
      withConfs(
        "spark.sql.streaming.checkpointLocation" -> s"$base/ckpt",
        "spark.sql.streaming.noDataMicroBatches.enabled" -> (!skipNoData).toString) {
        val name = "probe_sink_" + probeSeq.incrementAndGet()
        val q = df.writeStream.outputMode("append").format("memory")
          .queryName(name).trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        spark.table(name).write.format("noop").mode("overwrite").save()
        spark.catalog.dropTempView(name)
      }
    }
    def sessionAppendRun(): Unit = ckptScope { base =>
      val q = streamEventsP()
        .withWatermark("ts", "2 hours")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("value_sum"))
        .select(col("user_id"), col("w.start").cast("long").as("session_start"),
          col("n_events"), col("value_sum"))
        .writeStream.outputMode("append").format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      noop(spark.read
        .schema("user_id BIGINT, session_start BIGINT, n_events BIGINT, value_sum DOUBLE")
        .parquet(s"$base/out").orderBy("user_id", "session_start"))
    }
    def joinRun(): Unit = {
      val ev = streamEventsP()
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("user_id"), col("event_type"), col("ts"))
        .withWatermark("ts", "2 hours")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      memSink(clicks.join(purchases,
        col("user_id") === col("p_user") &&
          col("p_ts") >= col("click_ts") &&
          col("p_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
        .select(col("user_id"), col("click_ts").cast("long").as("click_s"),
          col("p_ts").cast("long").as("purchase_s")), skipNoData = true)
    }
    if (on("stream")) {
      graft.Tables.tsCompatConfs(spark)
      // machinery floor: stateless pass-through, no watermark, no state
      Tuning.withShufflePartitions(spark, 2) {
        time("floor passthrough memory skipNoData")(
          memSink(streamEventsP().select("event_id", "user_id"), skipNoData = true))
        time("floor passthrough memory +noData")(
          memSink(streamEventsP().select("event_id", "user_id"), skipNoData = false))
        // heap-provider tumbling (complete-mode twin is close enough via append parquet? use memory+append window agg)
        time("tumbling-ish heap append memory") {
          memSink(streamEventsP()
            .withWatermark("ts", "2 hours")
            .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
            .agg(count(lit(1)).as("n"))
            .select(col("w.start").cast("long").as("b"), col("event_type"), col("n")),
            skipNoData = false)
        }
        time("session_append rocksdb (baseline)") {
          withConfs("spark.sql.streaming.stateStore.providerClass" -> ROCKS)(sessionAppendRun())
        }
        time("session_append rocksdb+changelog") {
          withConfs(
            "spark.sql.streaming.stateStore.providerClass" -> ROCKS,
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true")(
            sessionAppendRun())
        }
        time("session_append rocksdb+noTrackRows") {
          withConfs(
            "spark.sql.streaming.stateStore.providerClass" -> ROCKS,
            "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows" -> "false")(
            sessionAppendRun())
        }
        time("session_append rocksdb+both") {
          withConfs(
            "spark.sql.streaming.stateStore.providerClass" -> ROCKS,
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true",
            "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows" -> "false")(
            sessionAppendRun())
        }
        time("session_append heap (reference only)")(sessionAppendRun())
        time("join rocksdb (baseline)") {
          withConfs("spark.sql.streaming.stateStore.providerClass" -> ROCKS)(joinRun())
        }
        time("join rocksdb+both") {
          withConfs(
            "spark.sql.streaming.stateStore.providerClass" -> ROCKS,
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true",
            "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows" -> "false")(
            joinRun())
        }
        time("join heap (reference only)")(joinRun())
      }
    }

    // ---- pagerank loop attribution ----
    if (on("pagerank")) {
      time("graph_pagerank (as shipped)")(
        noop(SparkEntry.queries("graph_pagerank")(spark, sfDir)))
      time("dedup_minhash_pairs (pair build+sort)")(
        noop(SparkEntry.queries("dedup_minhash_pairs")(spark, sfDir)))
      val vp = SparkEntry.queries("dedup_minhash_pairs")(spark, sfDir)
        .select("doc_a", "doc_b").persist(StorageLevel.MEMORY_AND_DISK)
      vp.count()
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val PR_UNIT = 1000000L
      def freeCkpt(df: DataFrame): Unit =
        df.queryExecution.analyzed.foreach {
          case lr: org.apache.spark.sql.execution.LogicalRDD =>
            lr.rdd.unpersist(false); ()
          case _ => ()
        }
      def loop(ewd0: DataFrame, rounds: Int): DataFrame = {
        var ranks = docs.select(col("doc_id"), lit(PR_UNIT).as("rank"))
          .localCheckpoint(true)
        for (_ <- 1 to rounds) {
          val contrib = ewd0.join(ranks, col("src") === col("doc_id"))
            .select(col("dst"), expr("rank div deg").as("c"))
            .union(ranks.select(col("doc_id").as("dst"), lit(0L).as("c")))
          val next = contrib.groupBy("dst").agg(sum(col("c")).as("inflow"))
            .select(col("dst").as("doc_id"),
              (lit(150000L) + expr("(inflow * 85) div 100")).as("rank"))
            .localCheckpoint(true)
          freeCkpt(ranks)
          ranks = next
        }
        ranks
      }
      val edges = vp.union(vp.select(col("doc_b"), col("doc_a"))).toDF("src", "dst")
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      time("pr loop8 ewd persisted (shipped shape)") {
        val ewd = edges.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
        ewd.count()
        noop(loop(ewd, 8).orderBy("doc_id"))
        ewd.unpersist(false)
      }
      time("pr loop8 ewd repartition(src) persisted") {
        val ewd = edges.join(deg, "src").repartition(col("src"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        ewd.count()
        noop(loop(ewd, 8).orderBy("doc_id"))
        ewd.unpersist(false)
      }
      time("pr loop8 ewd localCheckpoint") {
        val ewd = edges.join(deg, "src").localCheckpoint(true)
        noop(loop(ewd, 8).orderBy("doc_id"))
      }
      time("pr loop8 shufflePartitions=4") {
        Tuning.withShufflePartitions(spark, 4) {
          val ewd = edges.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
          ewd.count()
          noop(loop(ewd, 8).orderBy("doc_id"))
          ewd.unpersist(false)
        }
      }
      time("pr loop2 (per-round cost slope)") {
        val ewd = edges.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
        ewd.count()
        noop(loop(ewd, 2).orderBy("doc_id"))
        ewd.unpersist(false)
      }
      println(s"[probe] vp pairs = ${vp.count()}, docs = ${docs.count()}")
      vp.unpersist(false)
    }

    // ---- tfidf: dl join vs window-sum dlen ----
    if (on("tfidf")) {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      noop(docs)
      val nDocs = docs.select(countDistinct("doc_id").as("nd"))
      val tok = docs
        .select(col("doc_id"), explode(split(col("text"), "[^a-z]+")).as("word"))
        .filter(col("word") =!= "")
      val tf = tok.groupBy("doc_id", "word").agg(count(lit(1)).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("score").desc, col("word"))
      time("tfidf shipped (dl join)") {
        val dl = tf.groupBy("doc_id").agg(sum("c").as("dlen"))
        val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
        noop(tf.join(dl, "doc_id")
          .join(dfreq, "word")
          .crossJoin(broadcast(nDocs))
          .withColumn("score",
            round((col("c").cast("double") / col("dlen")) *
              log(col("nd").cast("double") / col("df")), 6))
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 3)
          .select("doc_id", "rnk", "word", "score")
          .orderBy("doc_id", "rnk"))
      }
      time("tfidf window dlen") {
        val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
        val wd = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
        noop(tf.join(dfreq, "word")
          .crossJoin(broadcast(nDocs))
          .withColumn("dlen", sum("c").over(wd))
          .withColumn("score",
            round((col("c").cast("double") / col("dlen")) *
              log(col("nd").cast("double") / col("df")), 6))
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 3)
          .select("doc_id", "rnk", "word", "score")
          .orderBy("doc_id", "rnk"))
      }
    }

    // ---- sim_neardup_param attribution ----
    if (on("neardup")) {
      noop(spark.read.parquet(s"$sfDir/embeddings.parquet"))
      time("embeddings.count()") {
        spark.read.parquet(s"$sfDir/embeddings.parquet").count(); ()
      }
      time("embeddings.count() aggPushdown") {
        withConfs("spark.sql.parquet.aggregatePushdown" -> "true") {
          spark.read.parquet(s"$sfDir/embeddings.parquet").count(); ()
        }
      }
      time("sim_neardup_param (as shipped)")(
        noop(SparkEntry.queries("sim_neardup_param")(spark, sfDir)))
      time("sim_neardup_scaled (as shipped)")(
        noop(SparkEntry.queries("sim_neardup_scaled")(spark, sfDir)))
    }

    // ---- pii: codegen CSE check + timing ----
    if (on("pii")) {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      noop(docs)
      import org.apache.spark.sql.graft.TextColumns
      val p = TextColumns.piiScan(col("text"))
      val scan = docs.select(col("doc_id"),
        p.getField("n_emails").as("n_emails"),
        p.getField("n_digit_runs").as("n_digit_runs"),
        md5(p.getField("scrubbed")).as("scrubbed_md5"))
      val code = org.apache.spark.sql.execution.debug.codegenString(
        scan.queryExecution.executedPlan)
      val evals = "PiiScan\\.compute\\(".r.findAllIn(code).size
      println(s"[probe] pii_scan compute calls in generated code = $evals (want 1)")
      val email = "[a-z0-9._-]+@[a-z0-9.-]+"
      val digits = "[0-9]{6,}"
      val old = docs.select(col("doc_id"),
        expr(s"size(regexp_extract_all(text, '$email', 0))").cast("long").as("n_emails"),
        expr(s"size(regexp_extract_all(regexp_replace(text, '$email', '<EMAIL>'), '$digits', 0))")
          .cast("long").as("n_digit_runs"),
        md5(regexp_replace(regexp_replace(col("text"), email, "<EMAIL>"),
          digits, "<NUM>")).as("scrubbed_md5"))
      time("pii regex chain proj")(noop(old))
      time("pii pii_scan proj")(noop(scan))
    }

    // ---- substring: guard-scan share ----
    if (on("substr")) {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      noop(docs)
      import org.apache.spark.sql.graft.TextColumns
      val cur = docs
        .withColumn("grams",
          when(size(TextColumns.letterTokens(
              lower(TextColumns.nfc(col("text"))))) >= 8,
            TextColumns.wordNGramsU(lower(TextColumns.nfc(col("text"))), 8))
            .otherwise(array().cast("array<string>")))
        .select(col("doc_id"), posexplode(col("grams")).as(Seq("pos", "gram")))
        .select(col("doc_id"), col("pos").cast(LongType).as("pos"),
          substring(md5(col("gram")), 1, 16).as("gh"))
      time("subGramTable shipped (guard+ngrams)")(noop(cur))
      val fused = docs
        .withColumn("grams",
          TextColumns.wordNGramsU(lower(TextColumns.nfc(col("text"))), 8))
        .select(col("doc_id"), posexplode(col("grams")).as(Seq("pos", "gram")))
        .select(col("doc_id"), col("pos").cast(LongType).as("pos"),
          substring(md5(col("gram")), 1, 16).as("gh"))
      time("subGramTable no-guard lower bound")(noop(fused))
      time("dedup_substring (as shipped)")(
        noop(SparkEntry.queries("dedup_substring")(spark, sfDir)))
    }

    spark.stop()
  }
}
