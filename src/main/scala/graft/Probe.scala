package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main for the optimization round — times plan
  * variants of a hot query through the noop sink so the expensive
  * operator can be attributed (guide §1). Not part of the contract.
  * Usage: runMain graft.Probe <sfDir> <reps>
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
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
      println(f"[probe] $name%-40s min=${ts.min}%.3f p50=${ts.sorted.apply(ts.size / 2)}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    // warm the scan
    noop(li)

    val proj = li.select(
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

    time("scan only")(noop(li.select("l_orderkey", "l_linenumber",
      "l_extendedprice", "l_tax", "l_discount", "l_quantity")))
    time("project only")(noop(proj))
    time("project noround")(noop(li.select(
      col("l_orderkey"), col("l_linenumber"),
      (col("l_extendedprice") * (lit(1) + col("l_tax"))).as("gross"),
      abs(col("l_discount") - 0.05).as("disc_dev"),
      sqrt(col("l_quantity")).as("qty_sqrt"),
      pow(col("l_quantity"), 2).as("qty_sq"),
      log(col("l_extendedprice")).as("price_ln"),
      floor(col("l_extendedprice")).as("price_floor"),
      ceil(col("l_extendedprice")).as("price_ceil"),
      (col("l_linenumber") % 3).as("ln_mod3"),
      greatest(col("l_discount"), col("l_tax")).as("max_rate"))))
    time("project + sortWithin")(noop(proj.sortWithinPartitions(
      sortCols.map(col): _*)))
    time("project + global orderBy (=query)")(noop(proj.orderBy(
      sortCols.map(col): _*)))
    time("project + orderBy 2 keys only")(noop(proj.orderBy(
      col("l_orderkey"), col("l_linenumber"))))
    time("persist(proj) + orderBy") {
      val p = proj.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      noop(p.orderBy(sortCols.map(col): _*))
      p.unpersist(blocking = true)
    }
    time("localCheckpoint(proj) + orderBy") {
      val p = proj.localCheckpoint()
      noop(p.orderBy(sortCols.map(col): _*))
    }

    // ---- fn_map / text_pii_scrub double-eval check ----
    // ---- single-row-group scan parallelism check ----
    time("agg_pricing 1-task") {
      noop(li.groupBy("l_returnflag", "l_linestatus").agg(
        sum(col("l_quantity").cast("decimal(18,2)")).as("sq"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).as("sp"),
        avg(col("l_discount")).as("ad"), count(lit(1)).as("n")))
    }
    time("agg_pricing repart32") {
      noop(li.repartition(32).groupBy("l_returnflag", "l_linestatus").agg(
        sum(col("l_quantity").cast("decimal(18,2)")).as("sq"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).as("sp"),
        avg(col("l_discount")).as("ad"), count(lit(1)).as("n")))
    }
    time("fnmath proj repart32")(noop(li.repartition(32).select(
      col("l_orderkey"), col("l_linenumber"),
      round(col("l_extendedprice") * (lit(1) + col("l_tax")), 4).as("gross"),
      round(abs(col("l_discount") - 0.05), 4).as("disc_dev"),
      round(sqrt(col("l_quantity")), 6).as("qty_sqrt"),
      round(pow(col("l_quantity"), 2), 2).as("qty_sq"),
      round(log(col("l_extendedprice")), 6).as("price_ln"),
      floor(col("l_extendedprice")).as("price_floor"),
      ceil(col("l_extendedprice")).as("price_ceil"),
      (col("l_linenumber") % 3).as("ln_mod3"),
      greatest(col("l_discount"), col("l_tax")).as("max_rate"))))

    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    noop(ev)
    val mapProj = ev
      .withColumn("m", from_json(col("props"),
        org.apache.spark.sql.types.DataType.fromDDL("map<string,int>")))
      .select(
        col("event_id"),
        array_join(array_sort(map_keys(col("m"))), ",").as("keys_csv"),
        size(col("m")).cast("long").as("n_keys"),
        element_at(col("m"), "k").as("k_val"))
    time("fn_map proj only")(noop(mapProj))
    time("fn_map proj+orderBy (=query)")(noop(mapProj.orderBy("event_id")))
    time("fn_map ckpt+orderBy") {
      noop(mapProj.localCheckpoint().orderBy("event_id"))
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    noop(docs)
    val email = "[a-z0-9._-]+@[a-z0-9.-]+"
    val digits = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
    val piiProj = docs.select(col("doc_id"),
      expr(s"size(regexp_extract_all(regexp_replace(text, '$email', '<EMAIL>'), '$digits', 0))")
        .cast("long").as("n_ssn"),
      md5(regexp_replace(regexp_replace(col("text"), email, "<EMAIL>"),
        digits, "<SSN>")).as("scrubbed_md5"))
    time("pii proj only")(noop(piiProj))
    time("pii proj+orderBy (=query-ish)")(noop(piiProj.orderBy("doc_id")))
    time("pii ckpt+orderBy") {
      noop(piiProj.localCheckpoint().orderBy("doc_id"))
    }

    spark.stop()
  }
}
