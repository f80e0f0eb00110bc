package graft.cli

import org.apache.spark.sql.SparkSession

import graft.model._
import graft.store.MetricStore

/** Thin CLI mirroring the reference bin tool contracts
  * (SURVEY.md §2.2) over a MetricStore directory:
  *
  *   create <store> <metric> <ret[,ret...]> [xff] [aggregationMethod]
  *   update <store> <metric> <ts:value> [ts:value ...]     (ts "N:" → now)
  *   fetch  <store> <metric> <from> <until> [--json] [--drop nulls]
  *   info   <store> <metric> [--json]
  *   dump   <store> <metric>
  *   set-aggregation-method <store> <metric> <method>
  *   set-xfilesfactor <store> <metric> <xff>
  *   estimate <ret[,ret...]>
  *   import-rrd <store> <dump.xml> [method] [xff]   (rrd2whisper from XML)
  *   vacuum <store> [now]   (drop time buckets past every retention)
  *
  * The fetch --json shape {"start","end","step","values"} matches
  * bin/whisper-fetch.py:72-82.
  */
object WhisperCli {

  private def session(): SparkSession = {
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("whisperspark-cli")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { usage(); sys.exit(1) }
    val now = sys.env.get("WHISPER_NOW").map(_.toLong)
      .getOrElse(System.currentTimeMillis() / 1000)
    args(0) match {
      case "estimate" =>
        val archives = Retention.parseSchema(args(1))
        Retention.validateArchiveList(archives)
        println(s"estimated size: ${Retention.estimateFileSize(archives)} bytes, " +
          s"${Retention.estimateDiskSize(archives)} bytes on disk (4 KiB blocks)")

      case "create" =>
        val Array(_, store, metric, rets, rest @ _*) = args: @unchecked
        val xff = rest.headOption.map(_.toFloat).getOrElse(0.5f)
        val agg = rest.lift(1).map(AggregationMethod.fromName)
          .getOrElse(AggregationMethod.default)
        new MetricStore(session(), store)
          .create(metric, RetentionPolicy(Retention.parseSchema(rets), xff, agg))
        println(s"created $metric")

      case "update" =>
        val Array(_, store, metric, points @ _*) = args: @unchecked
        val spark = session()
        import spark.implicits._
        val rows = points.zipWithIndex.map {
          case (p, i) =>
            val Array(ts, v) = p.split(":", 2)
            val t = if (ts == "N" || ts.isEmpty) now else ts.toLong
            (metric, t, v.toDouble, i.toLong)
        }
        new MetricStore(spark, store)
          .updateMany(rows.toDF("metric", "ts", "value", "seq"), now)
        println(s"updated ${rows.size} points")

      case "fetch" =>
        // mirrors bin/whisper-fetch.py: --json, --pretty, --drop
        // nulls|zeroes|empty, plus explicit archive selection by
        // precision (fetch archiveToSelect, whisper.py:943-957)
        val Array(_, store, metric, rest @ _*) = args: @unchecked
        // from/until are optional positionals: default window is the last
        // 24 h (bin/whisper-fetch.py:22-23)
        val (pos, opts) = rest.span(a => !a.startsWith("--"))
        val from = pos.headOption.map(_.toLong).getOrElse(now - 86400)
        val until = pos.lift(1).map(_.toLong).getOrElse(now)
        val archive = opts.sliding(2).collectFirst {
          case Seq("--archive", p) => Retention.parseRetentionDef(s"$p:1").secondsPerPoint
        }
        Seq("--archive", "--drop").foreach { fl =>
          if (opts.lastOption.contains(fl)) {
            println(s"$fl requires an argument"); sys.exit(1)
          }
        }
        val res = new MetricStore(session(), store)
          .fetch(metric, from, until, now, archive)
          .getOrElse { println("no data in requested range"); sys.exit(0); sys.error("unreachable") }
        val dropMode = opts.sliding(2).collectFirst { case Seq("--drop", m) => m }
        def dropped(v: Option[Double]): Boolean = dropMode match {
          case Some("nulls")  => v.isEmpty
          case Some("zeroes") => v.contains(0.0)
          case Some("empty")  => v.isEmpty || v.contains(0.0)
          case _ => false
        }
        if (opts.contains("--json")) {
          val vals = res.values.filterNot(dropped)
            .map(_.map(_.toString).getOrElse("null")).mkString("[", ", ", "]")
          println(s"""{"start": ${res.fromInterval}, "end": ${res.untilInterval}, """ +
            s""""step": ${res.step}, "values": $vals}""")
        } else {
          val fmt = java.time.format.DateTimeFormatter
            .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
          res.values.zipWithIndex.foreach {
            case (v, i) =>
              val t = res.fromInterval + i * res.step
              val ts =
                if (opts.contains("--pretty")) fmt.format(java.time.Instant.ofEpochSecond(t))
                else t.toString
              val s = v.map(_.toString).getOrElse("None")
              if (!dropped(v)) println(s"$ts\t$s")
          }
        }

      case "info" =>
        val Array(_, store, metric, opts @ _*) = args: @unchecked
        val (p, levels) = new MetricStore(session(), store).info(metric)
          .getOrElse { println(s"unknown metric $metric"); sys.exit(1); sys.error("unreachable") }
        // single-field lookup (bin/whisper-info.py:43-49)
        val fieldArg = opts.find(!_.startsWith("--"))
        if (fieldArg.isDefined) {
          fieldArg.get match {
            case "aggregationMethod" => println(p.aggregation)
            case "maxRetention"      => println(p.maxRetention)
            case "xFilesFactor"      => println(p.xff)
            case f =>
              println(s"Unknown field: $f"); sys.exit(1)
          }
        } else if (opts.contains("--json")) {
          val archs = levels.map(l =>
            s"""{"offset": ${l.offset}, "secondsPerPoint": ${l.secondsPerPoint}, """ +
              s""""points": ${l.points}, "retention": ${l.retention}, "size": ${l.points * 12}}""")
            .mkString("[", ", ", "]")
          println(s"""{"aggregationMethod": "${p.aggregation}", "maxRetention": ${p.maxRetention}, """ +
            s""""xFilesFactor": ${p.xff}, "archives": $archs}""")
        } else {
          println(s"aggregationMethod: ${p.aggregation}")
          println(s"maxRetention: ${p.maxRetention}")
          println(s"xFilesFactor: ${p.xff}")
          levels.foreach { l =>
            println(s"Archive ${l.level}: secondsPerPoint=${l.secondsPerPoint} " +
              s"points=${l.points} retention=${l.retention} offset=${l.offset}")
          }
        }

      case "dump" =>
        val Array(_, store, metric, opts @ _*) = args: @unchecked
        val raw = opts.contains("--raw")
        val ms = new MetricStore(session(), store)
        val (p, _) = ms.info(metric).getOrElse {
          println(s"unknown metric $metric"); sys.exit(1); sys.error("unreachable")
        }
        p.levels.indices.foreach { i =>
          if (!raw) println(s"Archive $i (step ${p.levels(i).secondsPerPoint}s):")
          ms.levelData(i)
            .where(org.apache.spark.sql.functions.col("metric") === metric)
            .orderBy("interval")
            .collect()
            .zipWithIndex
            .foreach {
              case (r, idx) =>
                // --raw emits ts:value lines re-ingestable by `update`
                // (bin/whisper-dump.py:123-124)
                if (raw) println(s"${r.getAs[Long]("interval")}:${r.getAs[Double]("value")}")
                else println(s"$idx: ${r.getAs[Long]("interval")}, ${r.getAs[Double]("value")}")
            }
        }

      case "import" =>
        // rrd2whisper analog (bin/rrd2whisper.py): bulk-load an exported
        // series (CSV "timestamp,value") into a fresh metric
        val Array(_, store, metric, rets, csvPath) = args: @unchecked
        val spark = session()
        import spark.implicits._
        val ms = new MetricStore(spark, store)
        ms.create(metric, RetentionPolicy(Retention.parseSchema(rets)))
        val pts = spark.read
          .option("header", "false")
          .schema("ts LONG, value DOUBLE")
          .csv(csvPath)
          .select(org.apache.spark.sql.functions.lit(metric).as("metric"),
            $"ts", $"value", $"ts".as("seq")) // RRD exports have unique timestamps
        ms.updateMany(pts, now)
        println(s"imported ${pts.count()} points into $metric")

      case "import-rrd" =>
        // rrd2whisper from an `rrdtool dump` XML (the container has no
        // rrdtool binary; the dump is RRD's portable form). One metric
        // per datasource, archives from the RRAs matching the
        // consolidation function, coarsest-first migration.
        val Array(_, store, xmlPath, rest @ _*) = args: @unchecked
        val method = rest.headOption
          .map(graft.model.AggregationMethod.fromName)
          .getOrElse(graft.model.AggregationMethod.Average)
        val xff = rest.lift(1).map(_.toFloat)
        val base = new java.io.File(xmlPath).getName
          .stripSuffix(".xml").stripSuffix(".rrd")
        val created = graft.sources.RrdXmlSource.importDump(
          new MetricStore(session(), store), xmlPath, base, now, method, xff)
        println(s"imported RRD datasources as: ${created.mkString(", ")}")

      case "import-wsp" =>
        // migrate an actual whisper file (or a whole carbon tree with
        // --tree) into the store, level for level
        val Array(_, store, rest @ _*) = args: @unchecked
        val ms = new MetricStore(session(), store)
        rest match {
          case Seq("--tree", dir) =>
            val metrics = graft.sources.WspSource.importTree(ms, dir)
            println(s"imported ${metrics.size} metrics: ${metrics.mkString(", ")}")
          case Seq(metric, path) =>
            val p = graft.sources.WspSource.importFile(ms, metric, path)
            println(s"imported $metric (${p.levels.size} archives)")
          case _ =>
            println("usage: import-wsp <store> (<metric> <file.wsp> | --tree <dir>)")
            sys.exit(1)
        }

      case "export-wsp" =>
        val Array(_, store, metric, path) = args: @unchecked
        val p = graft.sources.WspSource.exportFile(
          new MetricStore(session(), store), metric, path, now)
        println(s"exported $metric (${p.levels.size} archives) to $path")

      case "merge" =>
        // optional --from/--until interval clamp (whisper-merge.py:18-24;
        // the API clamp is whisper.py:1062-1074 semantics)
        val Array(_, store, src, dst, rest @ _*) = args: @unchecked
        def flagVal(name: String): Option[Long] = {
          val v = rest.sliding(2).collectFirst { case Seq(`name`, v) => v.toLong }
          // a flag with its value missing must error, not silently merge
          // the whole series (whisper-merge.py: optparse errors out)
          if (v.isEmpty && rest.contains(name)) {
            println(s"$name requires a timestamp argument"); sys.exit(1)
          }
          v
        }
        new MetricStore(session(), store)
          .mergeMetric(src, dst, flagVal("--from"), flagVal("--until"))
        println(s"merged $src into $dst")

      case "fill" =>
        // bin/whisper-fill.py main: fill_archives(src, dst, time.time())
        val Array(_, store, dst, src) = args: @unchecked
        new MetricStore(session(), store).fillArchives(src, dst, now, now)
        println(s"filled $dst gaps from $src")

      case "diff" =>
        // output modes mirror bin/whisper-diff.py:41-112: default pretty
        // per-archive blocks, --columns flat rows, --summary per-archive
        // counts, --json the sorted-key dict shape, plus --until and
        // --ignore-empty compare clamps
        val Array(_, store, a, b, rest @ _*) = args: @unchecked
        val summary = rest.contains("--summary")
        val columns = rest.contains("--columns")
        val headers = !rest.contains("--no-headers")
        val asJson = rest.contains("--json")
        val ignoreEmpty = rest.contains("--ignore-empty")
        val until = rest.sliding(2).collectFirst { case Seq("--until", v) => v.toLong }
        if (until.isEmpty && rest.contains("--until")) {
          println("--until requires a timestamp argument"); sys.exit(1)
        }
        val (df, totals) = new MetricStore(session(), store)
          .diffMetricsDetail(a, b, until, ignoreEmpty, now)
        val rows = df.orderBy("level", "interval").collect()
        def vstr(r: org.apache.spark.sql.Row, idx: Int): String =
          if (r.isNullAt(idx)) "None" else r.getDouble(idx).toString
        def vjson(r: org.apache.spark.sql.Row, idx: Int): String =
          if (r.isNullAt(idx)) "null" else r.getDouble(idx).toString
        val byLevel = totals.indices.map(i =>
          (i, rows.filter(_.getInt(0) == i), totals(i)))
        if (summary && asJson) {
          // json.dumps(sort_keys=True, indent=2, separators=(',', ' : '))
          val archives = byLevel.map {
            case (i, pts, total) =>
              s"""    {\n      "archive" : $i,\n      "points" : ${pts.length},\n      "total" : $total\n    }"""
          }.mkString(",\n")
          println(s"""{\n  "archives" : [\n$archives\n  ],\n  "path_a" : "$a",\n  "path_b" : "$b"\n}""")
        } else if (asJson) {
          val archives = byLevel.map {
            case (i, pts, total) =>
              val dps = pts.map(r =>
                s"""        {\n          "timestamp" : ${r.getLong(1)},\n          "value_a" : ${vjson(r, 2)},\n          "value_b" : ${vjson(r, 3)}\n        }""").mkString(",\n")
              val dpBlock = if (pts.isEmpty) "[]" else s"[\n$dps\n      ]"
              s"""    {\n      "archive" : $i,\n      "datapoint" : $dpBlock,\n      "points" : ${pts.length},\n      "total" : $total\n    }"""
          }.mkString(",\n")
          println(s"""{\n  "archives" : [\n$archives\n  ],\n  "path_a" : "$a",\n  "path_b" : "$b"\n}""")
        } else if (summary) {
          val f = if (columns) "%s %s %s" else "%7s %9s %9s"
          if (headers) println(f.format("archive", "total", "differing"))
          byLevel.foreach {
            case (i, pts, total) => println(f.format(i, total, pts.length))
          }
        } else if (columns) {
          if (headers) println("%s %s %s %s".format("archive", "timestamp", "value_a", "value_b"))
          byLevel.foreach {
            case (i, pts, _) =>
              pts.foreach(r => println("%s %d %s %s".format(i, r.getLong(1), vstr(r, 2), vstr(r, 3))))
          }
        } else {
          val h = "%7s %11s %13s %13s"
          if (headers) println(h.format("archive", "timestamp", "value_a", "value_b"))
          byLevel.foreach {
            case (i, pts, total) =>
              println("Archive %d (%d of %d datapoints differ)".format(i, pts.length, total))
              println(h.format("", "timestamp", "value_a", "value_b"))
              pts.foreach(r =>
                println("%7s %11d %13s %13s".format("", r.getLong(1), vstr(r, 2), vstr(r, 3))))
          }
        }

      case "resize" =>
        // --nobackup drops the .bak after the swap (whisper-resize.py:58,
        // 227-229); positional [xff] [aggregationMethod] as before
        val Array(_, store, rets, rest @ _*) = args: @unchecked
        val (pos, flags) = rest.partition(a => !a.startsWith("--"))
        val xff = pos.headOption.map(_.toFloat).getOrElse(0.5f)
        val agg = pos.lift(1).map(AggregationMethod.fromName)
          .getOrElse(AggregationMethod.default)
        new MetricStore(session(), store)
          .resize(RetentionPolicy(Retention.parseSchema(rets), xff, agg), now)
        if (flags.contains("--nobackup")) {
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete()
          }
          rm(new java.io.File(s"$store.bak"))
          println(s"resized store to $rets (no backup kept)")
        } else println(s"resized store to $rets (backup at $store.bak)")

      case "validate" =>
        val bad = new MetricStore(session(), args(1)).validateAll()
        if (bad.isEmpty) println("all policies valid")
        else bad.foreach { case (m, e) => println(s"CORRUPT $m: $e") }

      case "vacuum" =>
        // whisper's ring buffer overwrites expired slots in place; the
        // partitioned store needs an explicit sweep — whole expired time
        // buckets are unlinked (no data rewrite), keeping level listings
        // and the incremental cascade's change hull bounded by retention
        new MetricStore(session(), args(1))
          .vacuum(args.lift(2).map(_.toLong).getOrElse(now))
        println("vacuumed expired buckets")

      case "scale" =>
        val Array(_, store, metric, factor) = args: @unchecked
        new MetricStore(session(), store)
          .transformValues(metric, _ * factor.toDouble)
        println(s"scaled $metric by $factor")

      case "set-aggregation-method" =>
        val Array(_, store, metric, m) = args: @unchecked
        val old = new MetricStore(session(), store)
          .setAggregationMethod(metric, AggregationMethod.fromName(m))
        println(s"Updated aggregation method: $metric ($old -> $m)")

      case "set-xfilesfactor" =>
        val Array(_, store, metric, x) = args: @unchecked
        val old = new MetricStore(session(), store).setXFilesFactor(metric, x.toFloat)
        println(s"Updated xFilesFactor: $metric ($old -> $x)")

      case other =>
        println(s"unknown command: $other"); usage(); sys.exit(1)
    }
  }

  private def usage(): Unit =
    println("usage: WhisperCli <create|update|fetch|info|dump|merge|fill|" +
      "diff|resize|validate|vacuum|scale|set-aggregation-method|" +
      "set-xfilesfactor|estimate|import|import-rrd|import-wsp|export-wsp> ...")
}
