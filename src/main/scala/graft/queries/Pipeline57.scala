package graft.queries

import org.apache.spark.sql.functions._

/** Round-13 pack, fifth batch — data-governance operations: the
  * right-to-erasure impact audit (the census a deletion pipeline runs
  * BEFORE rewriting files) completing the governance family beside
  * q330's fairness audit and q327's leakage audit.
  */
object Pipeline57 {

  val entries: Seq[QEntry] = Seq(

    // Erasure-impact audit: deterministic deletion requests (every
    // 97th customer key — the GDPR/CCPA "forget me" queue) fanned out
    // across the relational graph: direct rows (customer), FK rows
    // (orders via o_custkey), transitive rows (lineitem via the
    // affected orders — a semi-join two hops out), and the event
    // stream keyed by the same subject ids. Per table: subjects that
    // actually matched, rows to tombstone, table size, share in basis
    // points. Scale shape: each census is one semi-join + one count
    // aggregate (map-side combined); the transitive hop shuffles only
    // the affected ORDER KEYS (~1% of orders), never lineitem; nothing
    // corpus-grain is collected.
    QEntry("q340_erasure_audit",
      (s, d) => {
        val subjects = Tables.customer(s, d)
          .filter(col("c_custkey") % 97 === 0)
          .select(col("c_custkey").as("subject"))
          .localCheckpoint() // drives all four censuses
        def census(name: String, df: org.apache.spark.sql.DataFrame,
            key: org.apache.spark.sql.Column) = {
          val keyed = df.select(key.as("k"))
          val hit = keyed.join(subjects.select(col("subject").as("k")),
            Seq("k"), "left_semi")
          hit.agg(count(lit(1)).as("rows_affected"),
              countDistinct(col("k")).as("n_subjects"))
            .crossJoin(keyed.agg(count(lit(1)).as("table_rows")))
            .select(lit(name).as("table_name"), col("n_subjects"),
              col("rows_affected"), col("table_rows"),
              expr("rows_affected * 10000 div greatest(1L, table_rows)")
                .as("share_bp"))
        }
        val affectedOrders = Tables.orders(s, d)
          .join(subjects.select(col("subject").as("o_custkey")),
            Seq("o_custkey"), "left_semi")
          .select(col("o_orderkey"))
          .localCheckpoint() // the transitive hop's ~1% key set
        val lineitemCensus = {
          val hit = Tables.lineitem(s, d).select(col("l_orderkey"))
            .join(affectedOrders.select(col("o_orderkey").as("l_orderkey")),
              Seq("l_orderkey"), "left_semi")
          hit.agg(count(lit(1)).as("rows_affected"),
              countDistinct(col("l_orderkey")).as("n_subjects"))
            .crossJoin(Tables.lineitem(s, d)
              .agg(count(lit(1)).as("table_rows")))
            .select(lit("lineitem").as("table_name"),
              col("n_subjects"), col("rows_affected"), col("table_rows"),
              expr("rows_affected * 10000 div greatest(1L, table_rows)")
                .as("share_bp"))
        }
        census("customer", Tables.customer(s, d), col("c_custkey"))
          .union(census("orders", Tables.orders(s, d), col("o_custkey")))
          .union(lineitemCensus)
          .union(census("events", Tables.events(s, d), col("user_id")))
          .orderBy(col("table_name"))
      },
      Some("""WITH subj AS (
                SELECT c_custkey AS subject FROM customer
                WHERE c_custkey % 97 = 0),
              ao AS (
                SELECT o_orderkey FROM orders
                WHERE o_custkey IN (SELECT subject FROM subj)),
              c AS (
                SELECT 'customer' AS table_name,
                  count(DISTINCT c_custkey) AS n_subjects,
                  count(*) AS rows_affected
                FROM customer WHERE c_custkey IN
                  (SELECT subject FROM subj)),
              o AS (
                SELECT 'orders',
                  count(DISTINCT o_custkey), count(*)
                FROM orders WHERE o_custkey IN
                  (SELECT subject FROM subj)),
              l AS (
                SELECT 'lineitem',
                  count(DISTINCT l_orderkey), count(*)
                FROM lineitem WHERE l_orderkey IN
                  (SELECT o_orderkey FROM ao)),
              e AS (
                SELECT 'events',
                  count(DISTINCT user_id), count(*)
                FROM events WHERE user_id IN
                  (SELECT subject FROM subj)),
              u AS (
                SELECT * FROM c UNION ALL SELECT * FROM o
                UNION ALL SELECT * FROM l UNION ALL SELECT * FROM e),
              sz AS (
                SELECT 'customer' AS table_name, count(*) AS table_rows
                  FROM customer
                UNION ALL SELECT 'orders', count(*) FROM orders
                UNION ALL SELECT 'lineitem', count(*) FROM lineitem
                UNION ALL SELECT 'events', count(*) FROM events)
              SELECT u.table_name,
                CAST(u.n_subjects AS BIGINT) AS n_subjects,
                CAST(u.rows_affected AS BIGINT) AS rows_affected,
                CAST(sz.table_rows AS BIGINT) AS table_rows,
                CAST(u.rows_affected * 10000 //
                  greatest(1, sz.table_rows) AS BIGINT) AS share_bp
              FROM u JOIN sz USING (table_name)
              ORDER BY u.table_name"""))
  )
}
