package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Analysis, AsOfJoin}
import graft.partitioning._
import graft.sources.{BucketReader, BucketWriter, Merge}

/** Analysis + compaction operators wired to the driver gate: overpass
  * sessionization (W1-W4) and the merge path (S12) are hash-checked against
  * SQL mirrors; swath/grid operators are covered by ScalaTest (their output
  * shape is dataframe-with-null-holes, SQL-expressible too — see q28).
  */
object AnalysisQueries extends QueryModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // W1: distinct-timestep gap sessionization per user via the library op.
    "q25_overpass_times" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir, "events").select($"user_id", $"ts".as("time"))
      Analysis.listOverpassTimes(ev, gapSeconds = 1800,
          partitionBy = Seq("user_id"))
        .select($"user_id", $"overpass_id",
          unix_micros($"start_time").as("start_us"),
          unix_micros($"end_time").as("end_us"))
    }),

    // W4: per-row session occurrence count (window, no join-back).
    "q26_overpass_count" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir, "events")
        .select($"event_id", $"user_id", $"ts".as("time"))
      Analysis.countOverpassOccurrence(ev, gapSeconds = 600,
          partitionBy = Seq("user_id"))
        .select($"event_id", $"user_id", $"overpass_id",
          $"count_overpass_occurence")
    }),

    // Bloom-prefiltered join: nation-7 suppliers' revenue from lineitem.
    // The small side builds a broadcast Bloom; the big side kills
    // non-matching rows AT THE SCAN (codegen'd probe) before the
    // shuffle join — identical result to the plain join (oracle), ~24×
    // less exchanged at this selectivity.
    "q193_bloom_join" -> ((s, dir) => {
      import s.implicits._
      val supp = graft.core.Tables(s, dir, "supplier")
        .where($"s_nationkey" === 7).select($"s_suppkey")
      val li = graft.core.Tables(s, dir, "lineitem")
        .select($"l_suppkey",
          round($"l_extendedprice" * 100).cast("long").as("cents"))
      graft.operators.Joins.bloomFilteredJoin(li, supp, "l_suppkey", "s_suppkey")
        .groupBy($"s_suppkey")
        .agg(count(lit(1)).as("n_items"), sum($"cents").as("revenue_cents"))
    }),

    // Ordered-step funnel view → click → purchase within 1 hour of the
    // first view: per step one filtered scan + one shuffle join on the
    // user key + a min-agg — never a window over the full stream. All
    // time arithmetic in unix micros (integer-exact).
    "q184_funnel" -> ((s, dir) => {
      Analysis.funnelSteps(graft.core.Tables(s, dir, "events"),
        "user_id", "event_type", "ts",
        steps = Seq("view", "click", "purchase"), withinSeconds = 3600L)
    }),

    // Funnel time-to-convert distribution: per-user completion latency
    // (purchase time − first view time, 7-day window so the completer
    // population is non-degenerate: 126 of 150 users) summarized by the min-k quantile sketch in its EXACT
    // regime (k ≥ completers, so the sample IS the population and the
    // p50/p90 convention replays in SQL).
    "q198_funnel_latency" -> ((s, dir) => {
      import s.implicits._
      val comp = Analysis.funnelCompletions(graft.core.Tables(s, dir, "events"),
        "user_id", "event_type", "ts",
        steps = Seq("view", "click", "purchase"), withinSeconds = 604800L)
      val lat = comp.select(lit("all").as("g"), $"u",
        ($"tk" - $"t1").cast("double").as("lat_us"))
      graft.operators.Sketches
        .groupQuantiles(lat, "g", "u", "lat_us", Seq(0.5, 0.9), k = 8192)
        .select($"p50", $"p90", $"n_sampled")
    }),

    // Funnel conversion BY COHORT — the two new analytics ops composed:
    // users bucketed by first-event hour, per cohort the member count
    // and how many completed the 7-day view→click→purchase funnel.
    // Pure joins over the q184/q185 frames; rates stay exact integer
    // pairs (completers, size) per the engine's no-float-ratio rule.
    "q201_cohort_conversion" -> ((s, dir) => {
      import s.implicits._
      val ev = graft.core.Tables(s, dir, "events")
      val first = ev.select($"user_id".as("u"), unix_micros($"ts").as("us"))
        .groupBy($"u").agg(min($"us").as("f"))
        .select($"u", expr("f div 3600000000").as("cohort_bucket"))
      val comp = Analysis.funnelCompletions(ev, "user_id", "event_type", "ts",
          steps = Seq("view", "click", "purchase"), withinSeconds = 604800L)
        .select($"u", lit(1L).as("done"))
      first.join(comp, Seq("u"), "left")
        .groupBy($"cohort_bucket")
        .agg(count(lit(1)).as("n_users"),
          sum(coalesce($"done", lit(0L))).as("n_converted"))
    }),

    // PMI-style co-occurrence mining over (user, event_type): the four
    // exact integers log(n·c_ab/(c_a·c_b)) needs, per unordered type
    // pair — the association-mining primitive. The pair join runs within
    // user only (fan-out bounded by types-per-user²), counts join back
    // on the tiny type dimension.
    "q203_pmi_cooccurrence" -> ((s, dir) =>
      Analysis.cooccurrenceCounts(graft.core.Tables(s, dir, "events"),
        "user_id", "event_type")),

    // First/last-touch attribution: for every purchase, the first and
    // last preceding view/click by the same user (ties toward the
    // earlier event id) — one window pass per user timeline, no
    // self-join; unattributed conversions keep nulls.
    "q204_touch_attribution" -> ((s, dir) =>
      Analysis.touchAttribution(graft.core.Tables(s, dir, "events"),
        "user_id", "event_type", "ts", "event_id",
        conversionType = "purchase", touchTypes = Seq("view", "click"))),

    // Journey discovery: each user's first-4 event-type path (time
    // order, id tiebreak) counted across users — the funnel-DISCOVERY
    // companion to q184's known-path check.
    "q206_event_paths" -> ((s, dir) =>
      Analysis.eventPaths(graft.core.Tables(s, dir, "events"),
        "user_id", "event_type", "ts", "event_id", k = 4)),

    // Cohort retention triangle: users bucketed by first-event hour,
    // distinct-active counts per (cohort, hours-since) cell — two aggs
    // and one join, floor-division bucket arithmetic.
    "q185_cohort_retention" -> ((s, dir) => {
      Analysis.cohortRetention(graft.core.Tables(s, dir, "events"),
        "user_id", "ts", bucketSeconds = 3600L)
    }),

    // Exact-integer 3-sigma outlier flags per event_type: the
    // cross-multiplied variance test (N·x−S)² > 9·(N·Q−S²) — no float
    // mean/stddev anywhere, one moments agg + one join back. ~2% of
    // rows flag at this grouping (the distribution has a long tail), so
    // the boundary itself is exercised. 64-bit bound: N·max|cents| must
    // stay under ~3·10⁹ — holds through sf1 here; larger scales bucket
    // the groups by time (see Analysis.outlierFlags scaladoc).
    "q189_outlier_flags" -> ((s, dir) => {
      import s.implicits._
      val ev = graft.core.Tables(s, dir, "events")
        .select($"event_id", $"event_type",
          round($"value" * 100).cast("long").as("cents"))
      Analysis.outlierFlags(ev, Seq("event_type"), $"cents", kSigma = 3)
        .select($"event_id", $"event_type", $"cents", $"is_outlier")
    }),

    // W7+W8: per-user hourly series reindexed onto the full hour axis, then
    // bounded linear interpolation of the holes (limit 3). The blend
    // arithmetic (pv + (nv-pv)*k/n on exact-integer-cent doubles) is
    // mirrored operation-for-operation in the oracle — no rounding, no
    // trig, so the doubles are bit-identical.
    "q53_regularize_interp" -> ((s, dir) => {
      import s.implicits._
      val hourly = Tables(s, dir, "events")
        .where($"user_id" < 50)
        .groupBy($"user_id", date_trunc("hour", $"ts").as("hour"))
        .agg(sum(round($"value" * 100).cast("long")).as("sum_cents"))
      val b = hourly.agg(min($"hour"), max($"hour")).head()
      val axis = s.range(1).select(explode(sequence(
        lit(b.getTimestamp(0)), lit(b.getTimestamp(1)),
        expr("INTERVAL 1 HOUR"))).as("hour"))
      val users = hourly.select($"user_id").distinct()
      val grid = users.crossJoin(broadcast(axis))
      val joined = grid.join(hourly, Seq("user_id", "hour"), "left")
      Analysis.interpolateLinear(joined, "sum_cents", "hour",
          limit = 3, partitionBy = Seq("user_id"))
        .select($"user_id", unix_micros($"hour").as("t_us"),
          $"sum_cents".as("interp_cents"))
    }),

    // S12/T8: full compaction round trip — granule-style bucket → merge
    // (month periods, {prefix}_{i}.parquet naming) → read back through the
    // merged bucket; hash-compared against plain SQL on the raw table.
    "q27_merge_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val src = s"/tmp/graft_merge_src_${QueryModule.cacheKey(dir)}"
      val dst = s"/tmp/graft_merge_dst_${QueryModule.cacheKey(dir)}"
      // fresh destination: period files from a previous code revision would
      // otherwise linger beside the newly merged ones
      def rmrf(d: String): Unit = {
        val p = java.nio.file.Paths.get(d)
        if (java.nio.file.Files.exists(p)) {
          val w = java.nio.file.Files.walk(p)
          try scala.jdk.CollectionConverters.IteratorHasAsScala(w.iterator()).asScala
            .toSeq.sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
          finally w.close()
        }
      }
      rmrf(dst)
      val ev = Tables(s, dir, "events")
        .withColumn("lon", (($"event_id" % 3600).cast("double") / 10.0) - 180.0)
        .withColumn("lat", ((($"event_id" * 7) % 1800).cast("double") / 10.0) - 90.0)
        .select($"event_id", $"lon", $"lat", $"ts".as("time"), $"value")
      BucketWriter.writeBucket(ev, src, LonLatPartitioning(size = (20, 20)),
        mode = "overwrite")
      Merge.mergeGranuleBuckets(s, src, dst, temporalPartitioning = "month")
      BucketReader.read(s, dst,
          query = BucketReader.ByExtent(Extent(-60, 60, -45, 45)))
        .select($"event_id", $"lon", $"lat", unix_micros($"time").as("t_us"),
          round($"value" * 100).cast("long").as("value_cents"),
          $"lon_bin", $"lat_bin")
    }),

    // T8: UPDATE-mode merge — re-merge one day's data (values shifted)
    // into an existing day-partitioned archive; exactly that day's files
    // are replaced, every other period survives untouched. The oracle
    // recomputes the expected post-update state from the raw table.
    "q54_update_merge" -> ((s, dir) => {
      import s.implicits._
      // v-token: bump when the synth/source shape changes (stale /tmp cache)
      val h = s"v1_${QueryModule.cacheKey(dir)}"
      val srcA = s"/tmp/graft_upd_srcA_$h"; val srcB = s"/tmp/graft_upd_srcB_$h"
      val dst = s"/tmp/graft_upd_dst_$h"
      // the MERGES are the operation under test and run fresh every time;
      // the two deterministic source buckets are built once (marker-gated)
      graft.sources.BucketFs.deleteRecursive(dst)
      val ev = Tables(s, dir, "events")
        .withColumn("lon", (($"event_id" % 3600).cast("double") / 10.0) - 180.0)
        .withColumn("lat", ((($"event_id" * 7) % 1800).cast("double") / 10.0) - 90.0)
        .select($"event_id", $"lon", $"lat", $"ts".as("time"), $"value")
      // coarse cells: day periods × fine cells would mean 10^3-10^4 tiny
      // period files, and q54 tests UPDATE semantics, not pruning (q27
      // covers the fine-grained layout)
      val p = LonLatPartitioning(size = (60, 45))
      if (!graft.sources.BucketFs.exists(s"$srcA/_staged_ok")) {
        graft.sources.BucketFs.deleteRecursive(srcA)
        BucketWriter.writeBucket(ev, srcA, p, mode = "overwrite")
        graft.sources.BucketFs.writeString(s"$srcA/_staged_ok", "ok\n")
      }
      Merge.mergeGranuleBuckets(s, srcA, dst, temporalPartitioning = "day")
      if (!graft.sources.BucketFs.exists(s"$srcB/_staged_ok")) {
        graft.sources.BucketFs.deleteRecursive(srcB)
        // to_timestamp parses in the SESSION timezone (UTC) — a
        // java.sql.Timestamp.valueOf literal would parse in the JVM
        // default zone and silently select the wrong day off-UTC
        val day15 = ev.where(date_trunc("day", $"time") ===
            to_timestamp(lit("2024-01-15 00:00:00")))
          .withColumn("value", $"value" + 1000.0)
        BucketWriter.writeBucket(day15, srcB, p, mode = "overwrite")
        graft.sources.BucketFs.writeString(s"$srcB/_staged_ok", "ok\n")
      }
      Merge.mergeGranuleBuckets(s, srcB, dst, temporalPartitioning = "day",
        update = true)
      BucketReader.read(s, dst,
          query = BucketReader.ByExtent(Extent(-60, 60, -45, 45)))
        .select($"event_id", $"lon", $"lat", unix_micros($"time").as("t_us"),
          round($"value" * 100).cast("long").as("value_cents"))
    }),

    // As-of (backward) join — the time-series lookup operator Spark lacks:
    // every event gets the most recent prior error value for its user.
    // Checked against DuckDB's native ASOF JOIN.
    "q43_asof_join" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir, "events")
        .select($"event_id", $"user_id", $"ts".as("time"))
      val errors = Tables(s, dir, "events")
        .where($"event_type" === "error")
        .groupBy($"user_id", $"ts".as("time"))
        .agg(max(round($"value" * 100).cast("long")).as("err_cents"))
      AsOfJoin.backward(ev, errors, Seq("user_id"), "time", Seq("err_cents"))
        .select($"event_id", $"user_id", unix_micros($"time").as("t_us"),
          $"err_cents")
    }),

    // W5+W6: contiguous along-track re-indexing across granules, then the
    // dense (x_index × y_index) swath mesh with null holes
    // (get_swath_indices + overpass_to_dataset, analysis.py:113-255). A
    // deterministic multi-granule swath is synthesized from events:
    // granule = id%4+100, along = (id div 7)%120 + (id%4)*3, cross = id%25;
    // rows pre-aggregated to one per (granule, along, cross) so the
    // operator's dropDuplicates is the identity (deterministic hash).
    "q55_swath_grid" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir, "events").where($"event_id" < 12000)
        .withColumn("__granule", ($"event_id" % 4) + 100)
        .withColumn("__along", expr("(event_id div 7) % 120 + (event_id % 4) * 3"))
        .withColumn("gpm_cross_track_id", $"event_id" % 25)
      val uniq = ev.groupBy($"__granule", $"__along", $"gpm_cross_track_id")
        .agg(min($"event_id").as("min_id"),
          count(lit(1)).as("n_obs"),
          sum(round($"value" * 100).cast("long")).as("sum_cents"))
        .withColumn("gpm_id",
          concat($"__granule".cast("string"), lit("-"), $"__along".cast("string")))
        .drop("__granule", "__along")
      Analysis.overpassToGrid(s, uniq)
        .select($"x_index", $"y_index", $"min_id", $"n_obs", $"sum_cents")
    }),

    // J5: temporal stack concat — per-period frames stacked along time
    // (xr.concat over remapped overpasses,
    // example_creation_imagery_temporal_stack.py:56-59). The pm frame's
    // columns arrive scrambled AND carry an extra column the am frame
    // lacks, so the gate proves by-name resolution + null-filled
    // outer alignment, not positional union.
    "q67_temporal_concat" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir, "events")
      val am = ev.where(hour($"ts") < 12)
        .groupBy(date_trunc("day", $"ts").as("day"), $"event_type")
        .agg(count(lit(1)).as("n"),
          sum(round($"value" * 100).cast("long")).as("sum_cents"))
        .withColumn("overpass", lit("am"))
      val pm = ev.where(hour($"ts") >= 12)
        .groupBy(date_trunc("day", $"ts").as("day"), $"event_type")
        .agg(sum(round($"value" * 100).cast("long")).as("sum_cents"),
          count(lit(1)).as("n"),
          max($"user_id").cast("long").as("max_user"))
        .withColumn("overpass", lit("pm"))
        .select($"overpass", $"sum_cents", $"day", $"n", $"max_user", $"event_type")
      Analysis.temporalConcat(Seq(am, pm))
    }),

    // S9/S10: granule fan-out ETL round trip — a distributed single-job
    // ingest converts N virtual granules (rows a pure function of the
    // granule path, so executors need no SparkSession) into a partitioned
    // bucket, which is then read back through an extent query. One bad
    // granule exercises the error-capture contract without aborting.
    "q56_granule_etl" -> ((s, dir) => {
      import s.implicits._
      val dst = s"/tmp/graft_getl_v1_${QueryModule.cacheKey(dir)}"
      graft.sources.BucketFs.deleteRecursive(dst)
      val paths = (0 until 6).map(i => s"granule_$i") :+ "granule_bad"
      val errs = BucketWriter.writeGranulesBucketDistributed(
        s, paths, dst, LonLatPartitioning(size = (20, 20)),
        SyntheticGranuleReader, SyntheticGranuleReader.schema)
      require(errs.map(_._1) == Seq("granule_bad"),
        s"expected exactly the bad granule to fail, got $errs")
      BucketReader.read(s, dst,
          query = BucketReader.ByExtent(Extent(-60, 60, -45, 45)))
        .select($"id", $"lon", $"lat", $"value_cents", $"lon_bin", $"lat_bin")
    }),

    // S8: `_metadata` sidecar round trip — write a bucket with sidecars,
    // then answer from the SIDECAR alone (parquet-mr footer read, no data
    // scan): total rows across all row groups must equal the source count.
    // `_common_metadata` existing is asserted inline.
    "q63_metadata_sidecar" -> ((s, dir) => {
      import s.implicits._
      val dst = s"/tmp/graft_meta_v1_${QueryModule.cacheKey(dir)}"
      graft.sources.BucketFs.deleteRecursive(dst)
      val ev = Tables(s, dir, "events")
        .withColumn("lon", (($"event_id" % 3600).cast("double") / 10.0) - 180.0)
        .withColumn("lat", ((($"event_id" * 7) % 1800).cast("double") / 10.0) - 90.0)
        .select($"event_id", $"lon", $"lat", $"value")
      BucketWriter.writeBucket(ev, dst, LonLatPartitioning(size = (60, 45)),
        mode = "overwrite", writeMetadata = true)
      require(graft.sources.BucketFs.exists(s"$dst/_common_metadata"),
        "_common_metadata sidecar missing")
      // session conf, not a bare Configuration: carries spark.hadoop.*
      // overrides (fs impls, credentials) that a real store needs
      val conf = graft.sources.BucketFs.conf
      val meta = org.apache.parquet.hadoop.ParquetFileReader.readFooter(conf,
        new org.apache.hadoop.fs.Path(dst, "_metadata"),
        org.apache.parquet.format.converter.ParquetMetadataConverter.NO_FILTER)
      val totalRows = scala.jdk.CollectionConverters
        .ListHasAsScala(meta.getBlocks).asScala.map(_.getRowCount).sum
      s.createDataset(Seq(totalRows)).toDF("total_rows")
    }),

    // S9+P11: the per-granule naming contract ({granule}_{i}.parquet from
    // the driver-parallel ETL) combined with glob-filtered reads — reading
    // only granule 1's files must return exactly granule 1's rows.
    "q64_glob_read" -> ((s, dir) => {
      import s.implicits._
      val dst = s"/tmp/graft_glob_v1_${QueryModule.cacheKey(dir)}"
      graft.sources.BucketFs.deleteRecursive(dst)
      val reader = new BucketWriter.GranuleReader {
        def read(spark: SparkSession, path: String): Option[DataFrame] = {
          val gi = path.split('_').last.toInt
          val ev = Tables(spark, dir, "events")
            .where(col("event_id") % 3 === gi)
            .withColumn("lon", ((col("event_id") % 3600).cast("double") / 10.0) - 180.0)
            .withColumn("lat", (((col("event_id") * 7) % 1800).cast("double") / 10.0) - 90.0)
            .select(col("event_id"), col("lon"), col("lat"))
          Some(ev)
        }
      }
      val errs = BucketWriter.writeGranulesBucket(s, Seq("gran_0", "gran_1", "gran_2"),
        dst, LonLatPartitioning(size = (60, 45)), reader)
      require(errs.isEmpty, s"granule failures: $errs")
      BucketReader.read(s, dst, globPattern = "gran_1_*")
        .select($"event_id", $"lon", $"lat")
    }),

    // B16/B18: grid geometry export — per-cell WKT polygons (ccw from the
    // south-west corner) and the reference-order corner list (tl, bl, br,
    // tr). Pure config-derived geometry; the oracle rebuilds the strings
    // from generate_series arithmetic (integral-degree doubles print
    // identically in both engines).
    "q61_grid_geometry" -> ((s, dir) => {
      import s.implicits._
      val p = LonLatPartitioning(size = (30, 30))
      val wkt = p.toWkt()
      val n = p.nX * p.nY
      val corners = p.queryVerticesByIndices(
        (0 until n).map(_ % p.nX), (0 until n).map(_ / p.nX))
      val rows = (0 until n).map { c =>
        (c.toLong, wkt(c),
         corners(c).map(pt => s"${pt(0)} ${pt(1)}").mkString(", "))
      }
      s.createDataset(rows).toDF("cell_id", "wkt", "ref_corners")
    }),

    // T3/T4 period boundaries + grouping and W10 min-interval padding:
    // day-granularity group periods over the events time span (first/last
    // clamped to the data), plus the span padded out to a 120-day minimum.
    // Driver-side pure functions — exactly how merge planning uses them.
    "q62_period_groups" -> ((s, dir) => {
      import s.implicits._
      val r = Tables(s, dir, "events")
        .agg(unix_micros(min($"ts")), unix_micros(max($"ts"))).head()
      def ldt(us: Long) = java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(us, 1000000L),
        (Math.floorMod(us, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
      def us(t: java.time.LocalDateTime) =
        t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000
      val (t0, t1) = (ldt(r.getLong(0)), ldt(r.getLong(1)))
      val (p0, p1) = graft.sources.Temporal.ensureMinInterval(
        t0, t1, 120L * 24 * 3600)
      val groups = graft.sources.Temporal.listGroupPeriods(t0, t1, "day")
      val rows = groups.map { case (prefix, gs, ge) =>
        (prefix, us(gs), us(ge), us(p0), us(p1)) }
      s.createDataset(rows)
        .toDF("prefix", "start_us", "end_us", "padded_start_us", "padded_end_us")
    }),

    // P9/T6: trollsift filename parsing + filename-time file pruning.
    // Granule filenames are synthesized from event timestamps (end time is
    // DATE-LESS in the pattern, so the reference's day-wrap recombination
    // rule is exercised for sessions crossing midnight), pruned by a query
    // window with the three-case overlap rule, and the parsed times are
    // returned. The operator is inherently driver-side (it prunes file
    // lists BEFORE any scan), so the bounded name list is collected —
    // mirroring how a real read would use it.
    "q60_filename_prune" -> ((s, dir) => {
      import s.implicits._
      val pattern =
        "GR.{start_time:%Y%m%d-S%H%M%S}-E{end_time:%H%M%S}.{granule_id:s}.HDF5"
      val names = Tables(s, dir, "events").where($"event_id" < 5000)
        .select(concat(
          lit("GR."),
          date_format($"ts", "yyyyMMdd-'S'HHmmss"),
          lit("-E"),
          date_format($"ts" + expr("INTERVAL 90 MINUTES"), "HHmmss"),
          lit("."), $"event_id".cast("string"), lit(".HDF5")).as("fn"))
        .as[String].collect().toSeq
      val kept = graft.sources.FilenameInfo.filterFilepaths(names, Seq(pattern),
        start = Some(java.time.LocalDateTime.of(2024, 1, 10, 0, 0)),
        end = Some(java.time.LocalDateTime.of(2024, 1, 20, 0, 0)))
      val rows = kept.map { fn =>
        val i = graft.sources.FilenameInfo.parse(fn, pattern)
        // parsed times are whole seconds (the pattern carries no sub-second)
        (i.fields("granule_id").toLong,
         i.startTime.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L,
         i.endTime.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L)
      }
      s.createDataset(rows).toDF("granule_id", "start_us", "end_us")
    }),

    // T5: group files into temporal compaction batches — synthetic
    // granule files (the q60 construction) assigned to day periods by
    // the three-case overlap rule, with first/last periods clamped to the
    // file-time span and empty periods dropped.
    "q65_group_files" -> ((s, dir) => {
      import s.implicits._
      val files = Tables(s, dir, "events").where($"event_id" < 5000)
        .select($"event_id".cast("string").as("fn"),
          unix_micros(date_trunc("second", $"ts")).as("st_us"),
          unix_micros(date_trunc("second", $"ts" + expr("INTERVAL 90 MINUTES"))).as("et_us"))
        .as[(String, Long, Long)].collect().toSeq
      def ldt(us: Long) = java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(us, 1000000L),
        (Math.floorMod(us, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
      def us(t: java.time.LocalDateTime) =
        t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000
      val groups = graft.sources.Temporal.groupFilesByTime(
        files.map { case (fn, st, et) => (fn, ldt(st), ldt(et)) },
        None, None, "day")
      val rows = groups.toSeq.map { case (prefix, (gs, ge, fs)) =>
        (prefix, us(gs), us(ge), fs.size.toLong) }
      s.createDataset(rows).toDF("prefix", "start_us", "end_us", "n_files")
    }),

    // W6-shaped dense grid: aggregate events into a coarse LonLat grid and
    // left-join the full centroid mesh so empty cells surface as nulls.
    "q28_grid_cube" -> ((s, dir) => {
      import s.implicits._
      val p = LonLatPartitioning(size = (30, 30))
      val ev = Tables(s, dir, "events")
        .withColumn("lon", (($"event_id" % 3600).cast("double") / 10.0) - 180.0)
        .withColumn("lat", ((($"event_id" * 7) % 1800).cast("double") / 10.0) - 90.0)
      val agg = p.addCentroids(ev, "lon", "lat")
        .groupBy($"lon_c", $"lat_c")
        .agg(count(lit(1)).as("n"),
          sum(round($"value" * 100).cast("long")).as("sum_cents"))
      Analysis.toGridCube(s, agg, p)
        .select($"lon_c", $"lat_c",
          coalesce($"n", lit(0L)).as("n"),
          coalesce($"sum_cents", lit(0L)).as("sum_cents"))
    })
  )

  /** Executor-side granule converter for q56: rows are a pure function of
    * the path (id = granuleIndex*2000 + j with deterministic lon/lat/value),
    * so the DuckDB oracle regenerates the identical rows from
    * generate_series. A path without a numeric suffix throws — exercising
    * the per-granule error capture. */
  private[queries] object SyntheticGranuleReader
      extends BucketWriter.RowGranuleReader {
    val schema: org.apache.spark.sql.types.StructType =
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("lon",
          org.apache.spark.sql.types.DoubleType, nullable = false),
        org.apache.spark.sql.types.StructField("lat",
          org.apache.spark.sql.types.DoubleType, nullable = false),
        org.apache.spark.sql.types.StructField("value_cents",
          org.apache.spark.sql.types.LongType, nullable = false)))
    def rows(path: String): Iterator[org.apache.spark.sql.Row] = {
      val gi = path.split('_').last.toInt // throws for "granule_bad"
      (0 until 2000).iterator.map { j =>
        val id = gi * 2000L + j
        org.apache.spark.sql.Row(id,
          ((id * 13) % 3600).toDouble / 10.0 - 180.0,
          ((id * 7) % 1800).toDouble / 10.0 - 90.0,
          (id * 37) % 100000)
      }
    }
  }

  private val synthSql = OracleSql.synthEvents

  def oracle: Map[String, String] = Map(
    "q67_temporal_concat" -> """
      SELECT date_trunc('day', ts) AS day, event_type,
        COUNT(*) AS n,
        CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_cents,
        'am' AS overpass, CAST(NULL AS BIGINT) AS max_user
      FROM events WHERE EXTRACT(hour FROM ts) < 12 GROUP BY 1, 2
      UNION ALL
      SELECT date_trunc('day', ts) AS day, event_type,
        COUNT(*) AS n,
        CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_cents,
        'pm' AS overpass, CAST(MAX(user_id) AS BIGINT) AS max_user
      FROM events WHERE EXTRACT(hour FROM ts) >= 12 GROUP BY 1, 2""",
    "q55_swath_grid" -> """
      WITH src AS (
        SELECT event_id, value,
          (event_id % 4) + 100 AS granule,
          (event_id // 7) % 120 + (event_id % 4) * 3 AS along,
          event_id % 25 AS cross_id
        FROM events WHERE event_id < 12000),
      u AS (SELECT granule, along, cross_id,
          MIN(event_id) AS min_id,
          COUNT(*) AS n_obs,
          CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_cents
        FROM src GROUP BY 1, 2, 3),
      b AS (SELECT *, MIN(along) OVER (PARTITION BY granule) AS mn FROM u),
      g AS (SELECT granule, MAX(along) - MIN(along) + 1 AS width
            FROM u GROUP BY granule),
      o AS (SELECT granule,
          COALESCE(CAST(SUM(width) OVER (ORDER BY granule
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS xoff
        FROM g),
      idx AS (SELECT b.along - b.mn + o.xoff AS x_index, b.cross_id AS y_index,
          b.min_id, b.n_obs, b.sum_cents
        FROM b JOIN o ON b.granule = o.granule),
      bounds AS (SELECT MAX(x_index) AS x1, MIN(y_index) AS y0,
          MAX(y_index) AS y1 FROM idx),
      xs AS (SELECT UNNEST(generate_series(0, (SELECT x1 FROM bounds))) AS x_index),
      ys AS (SELECT UNNEST(generate_series((SELECT y0 FROM bounds),
                                           (SELECT y1 FROM bounds))) AS y_index),
      mesh AS (SELECT x_index, y_index FROM xs, ys)
      SELECT m.x_index, m.y_index, i.min_id, i.n_obs, i.sum_cents
      FROM mesh m LEFT JOIN idx i
        ON m.x_index = i.x_index AND m.y_index = i.y_index""",

    "q56_granule_etl" -> s"""
      WITH ids AS (SELECT i AS id FROM generate_series(0, 11999) t(i)),
      s AS (SELECT id,
        CAST((id*13) % 3600 AS DOUBLE)/10.0 - 180.0 AS lon,
        CAST((id*7) % 1800 AS DOUBLE)/10.0 - 90.0 AS lat,
        (id*37) % 100000 AS value_cents
        FROM ids)
      SELECT id, lon, lat, value_cents,
        ${OracleSql.axisLabel("lon", -180, 20, 180, 18, 2)} AS lon_bin,
        ${OracleSql.axisLabel("lat", -90, 20, 90, 9, 2)} AS lat_bin
      FROM s
      WHERE lon BETWEEN -60 AND 60 AND lat BETWEEN -45 AND 45""",

    "q25_overpass_times" -> """
      WITH d AS (SELECT DISTINCT user_id, ts FROM events),
      t AS (
        SELECT user_id, epoch_us(ts) AS ts_us,
          lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_us
        FROM d),
      m AS (
        SELECT user_id, ts_us,
          CAST(SUM(CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts_us
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - 1 AS overpass_id
        FROM t)
      SELECT user_id, overpass_id,
        MIN(ts_us) AS start_us, MAX(ts_us) AS end_us
      FROM m GROUP BY user_id, overpass_id""",

    "q26_overpass_count" -> """
      WITH t AS (
        SELECT event_id, user_id, epoch_us(ts) AS ts_us,
          lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_us
        FROM events),
      m AS (
        SELECT event_id, user_id,
          CAST(SUM(CASE WHEN prev_us IS NULL OR ts_us - prev_us > 600000000 THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts_us
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - 1 AS overpass_id
        FROM t)
      SELECT event_id, user_id, overpass_id,
        COUNT(*) OVER (PARTITION BY user_id, overpass_id) AS count_overpass_occurence
      FROM m""",

    "q193_bloom_join" -> """
      SELECT s.s_suppkey, CAST(COUNT(*) AS BIGINT) AS n_items,
        CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
          AS revenue_cents
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE s.s_nationkey = 7 GROUP BY 1""",

    "q184_funnel" -> """
      WITH e AS (SELECT user_id AS u, event_type AS t, epoch_us(ts) AS us
                 FROM events),
      s1 AS (SELECT u, MIN(us) AS t1 FROM e WHERE t = 'view' GROUP BY 1),
      s2 AS (SELECT e.u, s1.t1, MIN(e.us) AS tk FROM e JOIN s1 ON e.u = s1.u
             WHERE e.t = 'click' AND e.us > s1.t1
               AND e.us <= s1.t1 + 3600000000 GROUP BY 1, 2),
      s3 AS (SELECT e.u, s2.t1, MIN(e.us) AS tk FROM e JOIN s2 ON e.u = s2.u
             WHERE e.t = 'purchase' AND e.us > s2.tk
               AND e.us <= s2.t1 + 3600000000 GROUP BY 1, 2)
      SELECT CAST(1 AS INT) AS step, 'view' AS step_name,
        CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_users
      UNION ALL SELECT 2, 'click', CAST((SELECT COUNT(*) FROM s2) AS BIGINT)
      UNION ALL SELECT 3, 'purchase', CAST((SELECT COUNT(*) FROM s3) AS BIGINT)""",

    "q198_funnel_latency" -> """
      WITH e AS (SELECT user_id AS u, event_type AS t, epoch_us(ts) AS us
                 FROM events),
      s1 AS (SELECT u, MIN(us) AS t1 FROM e WHERE t = 'view' GROUP BY 1),
      s2 AS (SELECT e.u, s1.t1, MIN(e.us) AS tk FROM e JOIN s1 ON e.u = s1.u
             WHERE e.t = 'click' AND e.us > s1.t1
               AND e.us <= s1.t1 + 604800000000 GROUP BY 1, 2),
      s3 AS (SELECT e.u, s2.t1, MIN(e.us) AS tk FROM e JOIN s2 ON e.u = s2.u
             WHERE e.t = 'purchase' AND e.us > s2.tk
               AND e.us <= s2.t1 + 604800000000 GROUP BY 1, 2),
      lat AS (SELECT u, CAST(tk - t1 AS DOUBLE) AS l FROM s3),
      r AS (SELECT l, row_number() OVER (ORDER BY l) AS rn,
              (SELECT COUNT(*) FROM lat) AS n FROM lat)
      SELECT
        MAX(CASE WHEN rn = GREATEST(1, CAST(ceil(0.5 * n) AS BIGINT))
                 THEN l END) AS p50,
        MAX(CASE WHEN rn = GREATEST(1, CAST(ceil(0.9 * n) AS BIGINT))
                 THEN l END) AS p90,
        CAST(MAX(n) AS BIGINT) AS n_sampled
      FROM r""",

    "q201_cohort_conversion" -> """
      WITH e AS (SELECT user_id AS u, event_type AS t, epoch_us(ts) AS us
                 FROM events),
      first AS (SELECT u, MIN(us) // 3600000000 AS cohort_bucket
                FROM e GROUP BY 1),
      s1 AS (SELECT u, MIN(us) AS t1 FROM e WHERE t = 'view' GROUP BY 1),
      s2 AS (SELECT e.u, s1.t1, MIN(e.us) AS tk FROM e JOIN s1 ON e.u = s1.u
             WHERE e.t = 'click' AND e.us > s1.t1
               AND e.us <= s1.t1 + 604800000000 GROUP BY 1, 2),
      s3 AS (SELECT e.u, s2.t1, MIN(e.us) AS tk FROM e JOIN s2 ON e.u = s2.u
             WHERE e.t = 'purchase' AND e.us > s2.tk
               AND e.us <= s2.t1 + 604800000000 GROUP BY 1, 2)
      SELECT first.cohort_bucket,
        CAST(COUNT(*) AS BIGINT) AS n_users,
        CAST(SUM(CASE WHEN s3.u IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_converted
      FROM first LEFT JOIN s3 ON s3.u = first.u
      GROUP BY 1""",

    "q203_pmi_cooccurrence" -> """
      WITH ki AS (SELECT DISTINCT user_id AS k, event_type AS item
                  FROM events
                  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
      ic AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS n_item
             FROM ki GROUP BY 1),
      tot AS (SELECT CAST(COUNT(DISTINCT k) AS BIGINT) AS n_keys FROM ki),
      p AS (SELECT l.item AS a, r.item AS b, CAST(COUNT(*) AS BIGINT) AS n_ab
            FROM ki l JOIN ki r ON l.k = r.k AND l.item < r.item
            GROUP BY 1, 2)
      SELECT p.a, p.b, p.n_ab, ia.n_item AS n_a, ib.n_item AS n_b,
        tot.n_keys
      FROM p JOIN ic ia ON ia.item = p.a JOIN ic ib ON ib.item = p.b, tot""",

    "q204_touch_attribution" -> """
      WITH e AS (SELECT user_id AS u, event_type AS t, epoch_us(ts) AS us,
                   event_id AS id
                 FROM events),
      w AS (SELECT u, t, us, id,
          first_value(CASE WHEN t IN ('view', 'click')
              THEN struct_pack(us := us, id := id, t := t) END IGNORE NULLS)
            OVER (PARTITION BY u ORDER BY us, id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ft,
          last_value(CASE WHEN t IN ('view', 'click')
              THEN struct_pack(us := us, id := id, t := t) END IGNORE NULLS)
            OVER (PARTITION BY u ORDER BY us, id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lt
        FROM e)
      SELECT u, id AS conversion_id, us AS conversion_us,
        ft.t AS first_touch_type, ft.us AS first_touch_us,
        lt.t AS last_touch_type, lt.us AS last_touch_us
      FROM w WHERE t = 'purchase'""",

    "q206_event_paths" -> """
      WITH e AS (SELECT user_id AS u, event_type AS t, epoch_us(ts) AS us,
                   event_id AS id
                 FROM events),
      r AS (SELECT u, t,
              row_number() OVER (PARTITION BY u ORDER BY us, id) AS rn
            FROM e),
      p AS (SELECT u, string_agg(t, '>' ORDER BY rn) AS path
            FROM r WHERE rn <= 4 GROUP BY u)
      SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
      FROM p GROUP BY 1""",

    "q185_cohort_retention" -> """
      WITH e AS (SELECT user_id AS u, epoch_us(ts) AS us FROM events),
      f AS (SELECT u, MIN(us) AS f FROM e GROUP BY 1)
      SELECT f.f // 3600000000 AS cohort_bucket,
        e.us // 3600000000 - f.f // 3600000000 AS periods_since,
        CAST(COUNT(DISTINCT e.u) AS BIGINT) AS n_users
      FROM e JOIN f ON e.u = f.u
      GROUP BY 1, 2""",

    "q189_outlier_flags" -> """
      WITH e AS (SELECT event_id, event_type,
              CAST(round(value * 100) AS BIGINT) AS cents
            FROM events),
      g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(cents) AS BIGINT) AS s,
              CAST(SUM(cents * cents) AS BIGINT) AS q
            FROM e GROUP BY 1)
      SELECT e.event_id, e.event_type, e.cents,
        (e.cents * g.n - g.s) * (e.cents * g.n - g.s)
          > 9 * (g.n * g.q - g.s * g.s) AS is_outlier
      FROM e JOIN g ON e.event_type = g.event_type""",

    "q53_regularize_interp" -> """
      WITH e AS (
        SELECT user_id, date_trunc('hour', ts) AS hour,
          CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_cents
        FROM events WHERE user_id < 50 GROUP BY 1, 2),
      bounds AS (SELECT MIN(hour) AS h0, MAX(hour) AS h1 FROM e),
      axis AS (SELECT UNNEST(generate_series(
        (SELECT h0 FROM bounds), (SELECT h1 FROM bounds),
        INTERVAL 1 HOUR)) AS hour),
      grid AS (SELECT u.user_id, a.hour
               FROM (SELECT DISTINCT user_id FROM e) u, axis a),
      j AS (SELECT g.user_id, g.hour, CAST(e.sum_cents AS DOUBLE) AS v
            FROM grid g LEFT JOIN e
              ON g.user_id = e.user_id AND g.hour = e.hour),
      r AS (SELECT user_id, hour, v,
        row_number() OVER (PARTITION BY user_id ORDER BY hour) AS rn
        FROM j),
      w AS (SELECT user_id, hour, v, rn,
        last_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY hour
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY hour
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pr,
        first_value(CASE WHEN v IS NOT NULL THEN v END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY hour
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY hour
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nr
        FROM r)
      SELECT user_id, epoch_us(hour) AS t_us,
        CASE WHEN v IS NOT NULL THEN v
             WHEN pv IS NOT NULL AND nv IS NOT NULL AND nr - pr - 1 <= 3
             THEN pv + (nv - pv) * CAST(rn - pr AS DOUBLE)
                    / CAST(nr - pr AS DOUBLE)
             ELSE NULL END AS interp_cents
      FROM w""",

    "q63_metadata_sidecar" -> """
      SELECT COUNT(*) AS total_rows FROM events""",

    "q64_glob_read" -> s"""
      WITH s AS (${OracleSql.synthEvents})
      SELECT event_id, lon, lat FROM s WHERE event_id % 3 = 1""",

    "q65_group_files" -> """
      WITH f AS (
        SELECT date_trunc('second', ts) AS st,
               date_trunc('second', ts + INTERVAL 90 MINUTE) AS et
        FROM events WHERE event_id < 5000),
      b AS (SELECT MIN(st) AS t0, MAX(et) AS t1 FROM f),
      days AS (SELECT UNNEST(generate_series(
          (SELECT date_trunc('day', t0) FROM b),
          (SELECT date_trunc('day', t1) FROM b), INTERVAL 1 DAY)) AS gs),
      g AS (SELECT
          GREATEST(gs, (SELECT t0 FROM b)) AS cs,
          LEAST(gs + INTERVAL 1 DAY, (SELECT t1 FROM b)) AS ce
        FROM days),
      cnt AS (SELECT cs, ce,
          (SELECT COUNT(*) FROM f
           WHERE (f.st <= g2.cs AND f.et > g2.cs)
              OR (f.st >= g2.cs AND f.et <= g2.ce)
              OR (f.st < g2.ce AND f.et > g2.ce)) AS n_files
        FROM g g2 WHERE cs < ce)
      SELECT CAST(year(cs) AS VARCHAR) || '_' || CAST(month(cs) AS VARCHAR)
          || '_' || CAST(day(cs) AS VARCHAR) AS prefix,
        epoch_us(cs) AS start_us, epoch_us(ce) AS end_us,
        CAST(n_files AS BIGINT) AS n_files
      FROM cnt WHERE n_files > 0""",

    "q61_grid_geometry" -> """
      WITH cells AS (
        SELECT gy.j * 12 + gx.i AS cell_id,
          -180.0 + gx.i * 30.0 AS x0, -180.0 + (gx.i + 1) * 30.0 AS x1,
          -90.0 + gy.j * 30.0 AS y0, -90.0 + (gy.j + 1) * 30.0 AS y1
        FROM generate_series(0, 11) gx(i), generate_series(0, 5) gy(j))
      SELECT cell_id,
        'POLYGON ((' || x0 || ' ' || y0 || ', ' || x1 || ' ' || y0 || ', '
          || x1 || ' ' || y1 || ', ' || x0 || ' ' || y1 || ', '
          || x0 || ' ' || y0 || '))' AS wkt,
        x0 || ' ' || y1 || ', ' || x0 || ' ' || y0 || ', '
          || x1 || ' ' || y0 || ', ' || x1 || ' ' || y1 AS ref_corners
      FROM cells""",

    "q62_period_groups" -> """
      WITH b AS (SELECT MIN(ts) AS t0, MAX(ts) AS t1 FROM events),
      p AS (SELECT t0, t1,
          CASE WHEN epoch(t1) - epoch(t0) >= 120*24*3600 THEN t0
               ELSE t0 - INTERVAL 5184000 SECOND END AS p0,
          CASE WHEN epoch(t1) - epoch(t0) >= 120*24*3600 THEN t1
               ELSE t1 + INTERVAL 5184000 SECOND END AS p1
        FROM b),
      days AS (SELECT UNNEST(generate_series(
          (SELECT date_trunc('day', t0) FROM b),
          (SELECT date_trunc('day', t1) FROM b), INTERVAL 1 DAY)) AS gs),
      c AS (SELECT
          GREATEST(gs, (SELECT t0 FROM b)) AS cs,
          LEAST(gs + INTERVAL 1 DAY, (SELECT t1 FROM b)) AS ce
        FROM days)
      SELECT
        CAST(year(cs) AS VARCHAR) || '_' || CAST(month(cs) AS VARCHAR)
          || '_' || CAST(day(cs) AS VARCHAR) AS prefix,
        epoch_us(cs) AS start_us, epoch_us(ce) AS end_us,
        (SELECT epoch_us(p0) FROM p) AS padded_start_us,
        (SELECT epoch_us(p1) FROM p) AS padded_end_us
      FROM c WHERE cs < ce""",

    "q60_filename_prune" -> """
      WITH e AS (SELECT event_id AS granule_id,
          date_trunc('second', ts) AS st,
          date_trunc('second', ts + INTERVAL 90 MINUTE) AS et
        FROM events WHERE event_id < 5000)
      SELECT granule_id, epoch_us(st) AS start_us, epoch_us(et) AS end_us
      FROM e
      WHERE (st <= TIMESTAMP '2024-01-10' AND et > TIMESTAMP '2024-01-10')
         OR (st >= TIMESTAMP '2024-01-10' AND et <= TIMESTAMP '2024-01-20')
         OR (st < TIMESTAMP '2024-01-20' AND et > TIMESTAMP '2024-01-20')""",

    "q54_update_merge" -> s"""
      WITH s AS (${OracleSql.synthEvents})
      SELECT event_id, lon, lat, epoch_us(ts) AS t_us,
        CASE WHEN date_trunc('day', ts) = TIMESTAMP '2024-01-15'
             THEN CAST(round((value + 1000.0) * 100) AS BIGINT)
             ELSE CAST(round(value * 100) AS BIGINT) END AS value_cents
      FROM s
      WHERE lon BETWEEN -60 AND 60 AND lat BETWEEN -45 AND 45""",

    "q43_asof_join" -> """
      WITH r AS (
        SELECT user_id, ts, MAX(CAST(round(value*100) AS BIGINT)) AS err_cents
        FROM events WHERE event_type = 'error' GROUP BY user_id, ts)
      SELECT e.event_id, e.user_id, epoch_us(e.ts) AS t_us, r.err_cents
      FROM events e ASOF LEFT JOIN r
        ON e.user_id = r.user_id AND e.ts >= r.ts""",

    "q27_merge_roundtrip" -> s"""
      WITH s AS ($synthSql)
      SELECT event_id, lon, lat, epoch_us(ts) AS t_us,
        CAST(round(value*100) AS BIGINT) AS value_cents,
        ${OracleSql.axisLabel("lon", -180, 20, 180, 18, 2)} AS lon_bin,
        ${OracleSql.axisLabel("lat", -90, 20, 90, 9, 2)} AS lat_bin
      FROM s
      WHERE lon BETWEEN -60 AND 60 AND lat BETWEEN -45 AND 45""",

    "q28_grid_cube" -> s"""
      WITH s AS ($synthSql),
      b AS (SELECT
        ${OracleSql.centroid(OracleSql.binIdx("lon", -180, 30, 180, 12), -180, 30)} AS lon_c,
        ${OracleSql.centroid(OracleSql.binIdx("lat", -90, 30, 90, 6), -90, 30)} AS lat_c,
        value FROM s),
      agg AS (SELECT lon_c, lat_c, COUNT(*) AS n,
        CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_cents
        FROM b GROUP BY lon_c, lat_c),
      mesh AS (
        SELECT ${OracleSql.centroid("x", -180, 30)} AS lon_c,
               ${OracleSql.centroid("y", -90, 30)} AS lat_c
        FROM generate_series(0, 11) AS gx(x), generate_series(0, 5) AS gy(y))
      SELECT m.lon_c, m.lat_c,
        CAST(COALESCE(agg.n, 0) AS BIGINT) AS n, CAST(COALESCE(agg.sum_cents, 0) AS BIGINT) AS sum_cents
      FROM mesh m LEFT JOIN agg ON m.lon_c = agg.lon_c AND m.lat_c = agg.lat_c"""
  )
}
