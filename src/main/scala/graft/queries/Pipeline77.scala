package graft.queries

import org.apache.spark.sql.functions._

/** Round-14 pack, fourth batch — corpus-composition diligence: the
  * exact cross-source mirror census (the doc-grain exact twin of
  * q189's shingle Jaccard and q200's KMV containment).
  */
object Pipeline77 {

  val entries: Seq[QEntry] = Seq(

    // Cross-source mirror census: which source PAIRS ship byte-
    // identical documents, and how much of each side is mirrored —
    // the exact-dup complement of q189 (shingle overlap) and q200
    // (KMV containment): a full mirror scores 10000 bp here while its
    // shingle Jaccard can stay tiny. Corpus: an md5-drawn ~1/5 of each
    // source re-published under `mirror_<source>` and the ~1/25 nested
    // inside that draw additionally syndicated into one `agg` feed
    // (the planted crawl topology — h%25=0 ⊂ h%5=0, so agg docs mirror
    // twice and the (src, mirror_src, agg) triangle shows up in the
    // census; a hash draw, not id arithmetic, because the fixture's
    // round-robin id↔source layout would silently restrict an id-mod
    // plant to 4 of the 20 sources). One digest
    // projection → distinct (source, h) → h-keyed pair join (each
    // digest lives in ≤ 3 sources, so the join fan-out is bounded by
    // the mirror topology, never corpus²) → pair counts + directional
    // shares against each side's distinct-text census.
    QEntry("q386_mirror_census",
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("text"))
        val draw = conv(substring(md5(col("doc_id").cast("string")),
          1, 4), 16, 10).cast("long")
        val corpus = base
          .union(base.filter(draw % 5 === 0)
            .select(concat(lit("mirror_"), col("source")).as("source"),
              (col("doc_id") + 10000000L).as("doc_id"), col("text")))
          .union(base.filter(draw % 25 === 0)
            .select(lit("agg").as("source"),
              (col("doc_id") + 20000000L).as("doc_id"), col("text")))
        val st = corpus.select(col("source"), md5(col("text")).as("h"))
          .distinct()
          .localCheckpoint() // digest dim: sizes + both pair-join sides
        val sizes = st.groupBy(col("source")).agg(count(lit(1)).as("n"))
        st.select(col("source").as("sa"), col("h"))
          .join(st.select(col("source").as("sb"), col("h")), "h")
          .filter(col("sa") < col("sb"))
          .groupBy(col("sa"), col("sb"))
          .agg(count(lit(1)).as("n_shared"))
          .join(broadcast(sizes.select(col("source").as("sa"),
            col("n").as("na"))), "sa")
          .join(broadcast(sizes.select(col("source").as("sb"),
            col("n").as("nb"))), "sb")
          .select(col("sa"), col("sb"), col("n_shared"), col("na"),
            col("nb"),
            expr("n_shared * 10000 div na").as("share_a_bp"),
            expr("n_shared * 10000 div nb").as("share_b_bp"))
          .orderBy(col("sa"), col("sb"))
      },
      Some("""WITH base AS (
                SELECT source, doc_id, text FROM documents),
              corpus AS (
                SELECT source, text FROM base
                UNION ALL
                SELECT 'mirror_' || source, text FROM base
                WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                  1, 4))::BIGINT % 5 = 0
                UNION ALL
                SELECT 'agg', text FROM base
                WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                  1, 4))::BIGINT % 25 = 0),
              st AS (
                SELECT DISTINCT source, md5(text) AS h FROM corpus),
              sizes AS (
                SELECT source, count(*) AS n FROM st GROUP BY source),
              pairs AS (
                SELECT a.source AS sa, b.source AS sb,
                  count(*) AS n_shared
                FROM st a JOIN st b ON b.h = a.h AND a.source < b.source
                GROUP BY 1, 2)
              SELECT p.sa, p.sb, p.n_shared,
                za.n AS na, zb.n AS nb,
                p.n_shared * 10000 // za.n AS share_a_bp,
                p.n_shared * 10000 // zb.n AS share_b_bp
              FROM pairs p
              JOIN sizes za ON za.source = p.sa
              JOIN sizes zb ON zb.source = p.sb
              ORDER BY p.sa, p.sb"""))
  )
}
