package graft.queries

import org.apache.spark.sql.functions._

/** Round-13 pack, second batch — physical-layout planners for the
  * stewardship family: per-hot-key salt plan (the q325 advisor's
  * "salted_shuffle" verdict made actionable), small-file compaction
  * plan (the q302/q326 file layouts' maintenance step), and a column
  * encoding advisor (the parquet writer's dictionary/RLE/delta choice
  * as a queryable table).
  */
object Pipeline54 {

  val entries: Seq[QEntry] = Seq(

    // Per-hot-key salt plan: keys holding > 0.1% of the corpus (at
    // most 1000 of them — the census is self-bounding) get an explicit
    // salt fan-out = ceil(rows / target) with target = total div 1000,
    // and the planned post-salt max task rows = ceil(rows / salt). The
    // q325 advisor says WHICH joins need salting; this emits the
    // actionable plan (key → fan-out) a salted join executes with. One
    // map-side-combined census; the hot filter reduces to a ≤1000-row
    // dimension before anything else happens.
    QEntry("q333_salt_planner",
      (s, d) => {
        val keyed = Tables.events(s, d).select(col("user_id"))
        val tot = keyed.agg(count(lit(1)).as("total"))
        val counts = keyed.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_rows"))
        counts.crossJoin(broadcast(tot))
          .withColumn("target", expr("greatest(1L, total div 1000)"))
          .filter(col("n_rows") > col("target"))
          .select(col("user_id"), col("n_rows"),
            expr("n_rows * 1000000 div total").as("share_ppm"),
            expr("(n_rows + target - 1) div target").as("salt_factor"),
            expr("(n_rows + ((n_rows + target - 1) div target) - 1) div " +
              "((n_rows + target - 1) div target)").as("rows_after_salt"))
          .orderBy(col("n_rows").desc, col("user_id"))
      },
      Some("""WITH t AS (SELECT count(*) AS total FROM events),
              c AS (SELECT user_id, count(*) AS n_rows
                    FROM events GROUP BY user_id)
              SELECT user_id, n_rows,
                n_rows * 1000000 // total AS share_ppm,
                (n_rows + greatest(1, total // 1000) - 1) //
                  greatest(1, total // 1000) AS salt_factor,
                (n_rows + ((n_rows + greatest(1, total // 1000) - 1) //
                  greatest(1, total // 1000)) - 1) //
                 ((n_rows + greatest(1, total // 1000) - 1) //
                  greatest(1, total // 1000)) AS rows_after_salt
              FROM c, t
              WHERE n_rows > greatest(1, total // 1000)
              ORDER BY n_rows DESC, user_id""")),

    // Small-file compaction plan: the write pattern that produces the
    // small-file problem (per-day, per-writer-task files — here day ×
    // o_orderkey%8, sizes = the rows' serialized byte estimate), then
    // the plan that fixes it: within each day, files in task order
    // pack greedily into output bins of ~64 KB via cumulative-byte
    // arithmetic (bin = cum_before div target — one partitioned
    // window over the FILE dimension, never corpus rows). Emits one
    // row per planned output file with its input count and bytes;
    // before/after counts ride along, so the plan quantifies its own
    // win. The day partition keys the compaction job a table service
    // would run per partition in parallel.
    QEntry("q334_compaction_planner",
      (s, d) => {
        val target = 65536L
        val files = Tables.orders(s, d)
          .select(
            expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 " +
              "00:00:00', o_orderdate) div 86400000000").as("day"),
            (col("o_orderkey") % 8).as("task"),
            // serialized-size estimate: key + custkey + price cents +
            // status/priority strings
            (lit(24L) + length(col("o_orderstatus")) +
              length(col("o_orderpriority"))).as("bytes"))
          .groupBy(col("day"), col("task"))
          .agg(count(lit(1)).as("n_rows"), sum(col("bytes")).as("bytes"))
        val dim = graft.pipeline.Stats.boundedDimPerKey(
          files, Seq("day"), "q334_compaction_planner",
          maxRowsPerKey = 10000000L)
        import org.apache.spark.sql.expressions.Window
        val w = Window
          .partitionBy(col("day")).orderBy(col("task"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val planned = dim
          .withColumn("cum", sum(col("bytes")).over(w))
          .withColumn("bin", expr(s"(cum - bytes) div $target"))
        planned.groupBy(col("day"), col("bin"))
          .agg(count(lit(1)).as("n_input_files"),
            sum(col("n_rows")).as("n_rows"),
            sum(col("bytes")).as("bytes_out"))
          .orderBy(col("day"), col("bin"))
      },
      Some("""WITH f AS (
                SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                  o_orderkey % 8 AS task,
                  count(*) AS n_rows,
                  sum(24 + length(o_orderstatus) +
                    length(o_orderpriority)) AS bytes
                FROM orders GROUP BY 1, 2),
              p AS (
                SELECT day, task, n_rows, bytes,
                  sum(bytes) OVER (PARTITION BY day ORDER BY task
                    ROWS UNBOUNDED PRECEDING) AS cum
                FROM f)
              SELECT day, CAST((cum - bytes) // 65536 AS BIGINT) AS bin,
                CAST(count(*) AS BIGINT) AS n_input_files,
                CAST(sum(n_rows) AS BIGINT) AS n_rows,
                CAST(sum(bytes) AS BIGINT) AS bytes_out
              FROM p GROUP BY day, CAST((cum - bytes) // 65536 AS BIGINT)
              ORDER BY day, bin""")),

    // Column encoding advisor: per column of the orders arrival
    // stream, the stats a parquet writer weighs — cardinality,
    // serialized width, adjacent-run share, adjacent-monotone share —
    // and the verdict (dictionary / rle / delta / plain). Adjacency
    // is TRUE arrival adjacency via GlobalRank + a rank self-join
    // (distributed; no unpartitioned window ever sees corpus rows);
    // values ride as zero-padded sortable strings so one melt serves
    // every column, numeric order intact. The fixture reads exactly
    // as a writer would hope: o_orderkey → delta (monotone arrival),
    // status/priority → dictionary, custkey/price → plain.
    QEntry("q335_encoding_advisor",
      (s, d) => {
        // checkpoint the NARROW ranked base (rn + mostly-numeric
        // source columns, ~80 B/row); the padded sortable strings are
        // derived inline per consumer — caching them tripled the
        // resident bytes and OOM'd an 8 GiB heap at the sf≈10 replica
        val ranked = graft.operators.GlobalRank.rowNumber(
          Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_custkey"),
              col("o_orderstatus"), col("o_orderpriority"),
              expr("CAST(round(o_totalprice * 100) AS BIGINT)")
                .as("cents")),
          "rn", col("o_orderkey"))
          .localCheckpoint()
        def pad(c: org.apache.spark.sql.Column) =
          lpad(c.cast("string"), 14, "0")
        val cols = Seq(
          ("o_orderkey", pad(col("o_orderkey")),
            length(col("o_orderkey").cast("string"))),
          ("o_custkey", pad(col("o_custkey")),
            length(col("o_custkey").cast("string"))),
          ("o_orderstatus", col("o_orderstatus"),
            length(col("o_orderstatus"))),
          ("o_orderpriority", col("o_orderpriority"),
            length(col("o_orderpriority"))),
          ("o_totalprice", pad(col("cents")),
            length(col("cents").cast("string"))))
        val vals = ranked.select(col("rn") +: cols.map { case (n, v, l) =>
            struct(v.as("v"), l.as("len")).as(n) }: _*)
        // adjacency at ROW grain: ONE rn self-join carrying all five
        // columns, flags aggregated without any melt — the melt-grain
        // join shuffled 5× the rows and went 31× at the sf≈10 replica
        val adjoined = vals.join(
          vals.select(Seq((col("rn") - 1).as("rn")) ++ cols.map {
            case (n, _, _) => col(n).as(s"__n_$n") }: _*), "rn")
        val adjRow = adjoined.agg(
          count(lit(1)).as("n_adj"),
          cols.flatMap { case (n, _, _) => Seq(
            sum((col(s"$n.v") === col(s"__n_$n.v")).cast("long"))
              .as(s"eq_$n"),
            sum((col(s"$n.v") < col(s"__n_$n.v")).cast("long"))
              .as(s"inc_$n")) }: _*)
        val adj = adjRow.select(explode(array(cols.map { case (n, _, _) =>
            struct(lit(n).as("col_name"), col("n_adj"),
              col(s"eq_$n").as("adj_eq"), col(s"inc_$n").as("adj_inc"))
          }: _*)).as("f"))
          .select(col("f.col_name"), col("f.n_adj"), col("f.adj_eq"),
            col("f.adj_inc"))
        // cardinality/width stats still need the value grain — one
        // melt straight into a map-side-combined aggregate, never
        // checkpointed, never joined
        val base = vals.select(explode(array(cols.map { case (n, _, _) =>
            struct(lit(n).as("col_name"), col(s"$n.v").as("v"),
              col(s"$n.len").as("len")) }: _*)).as("f"))
          .select(col("f.col_name"), col("f.v"), col("f.len"))
          .groupBy(col("col_name"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("v")).as("n_distinct"),
            expr("sum(len) * 100 div count(1)").as("avg_len_centi"))
        base.join(broadcast(adj), "col_name")
          .select(col("col_name"), col("n"), col("n_distinct"),
            expr("n_distinct * 1000000 div n").as("distinct_ppm"),
            col("avg_len_centi"),
            expr("adj_eq * 1000000 div n_adj").as("adj_eq_ppm"),
            expr("adj_inc * 1000000 div n_adj").as("adj_inc_ppm"))
          .withColumn("encoding",
            when(col("adj_inc_ppm") >= 990000L, "delta")
              .when(col("adj_eq_ppm") >= 500000L, "rle")
              .when(col("distinct_ppm") <= 10000L, "dictionary")
              .otherwise("plain"))
          .orderBy(col("col_name"))
      },
      Some("""WITH ranked AS (
                SELECT row_number() OVER (ORDER BY o_orderkey) AS rn,
                  o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
                FROM orders),
              m AS (
                SELECT rn, 'o_orderkey' AS col_name,
                  lpad(CAST(o_orderkey AS VARCHAR), 14, '0') AS v,
                  length(CAST(o_orderkey AS VARCHAR)) AS len FROM ranked
                UNION ALL
                SELECT rn, 'o_custkey',
                  lpad(CAST(o_custkey AS VARCHAR), 14, '0'),
                  length(CAST(o_custkey AS VARCHAR)) FROM ranked
                UNION ALL
                SELECT rn, 'o_orderstatus', o_orderstatus,
                  length(o_orderstatus) FROM ranked
                UNION ALL
                SELECT rn, 'o_orderpriority', o_orderpriority,
                  length(o_orderpriority) FROM ranked
                UNION ALL
                SELECT rn, 'o_totalprice',
                  lpad(CAST(cents AS VARCHAR), 14, '0'),
                  length(CAST(cents AS VARCHAR)) FROM ranked),
              adj AS (
                SELECT a.col_name, count(*) AS n_adj,
                  sum(CASE WHEN a.v = b.v THEN 1 ELSE 0 END) AS adj_eq,
                  sum(CASE WHEN a.v < b.v THEN 1 ELSE 0 END) AS adj_inc
                FROM m a JOIN m b
                  ON b.rn = a.rn + 1 AND b.col_name = a.col_name
                GROUP BY a.col_name),
              base AS (
                SELECT col_name, count(*) AS n,
                  count(DISTINCT v) AS n_distinct,
                  sum(len) * 100 // count(*) AS avg_len_centi
                FROM m GROUP BY col_name)
              SELECT base.col_name, CAST(n AS BIGINT) AS n,
                CAST(n_distinct AS BIGINT) AS n_distinct,
                CAST(n_distinct * 1000000 // n AS BIGINT) AS distinct_ppm,
                CAST(avg_len_centi AS BIGINT) AS avg_len_centi,
                CAST(adj_eq * 1000000 // n_adj AS BIGINT) AS adj_eq_ppm,
                CAST(adj_inc * 1000000 // n_adj AS BIGINT) AS adj_inc_ppm,
                CASE WHEN adj_inc * 1000000 // n_adj >= 990000
                       THEN 'delta'
                     WHEN adj_eq * 1000000 // n_adj >= 500000 THEN 'rle'
                     WHEN n_distinct * 1000000 // n <= 10000
                       THEN 'dictionary'
                     ELSE 'plain' END AS encoding
              FROM base JOIN adj USING (col_name)
              ORDER BY col_name"""))
  )
}
