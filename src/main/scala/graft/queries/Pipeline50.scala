package graft.queries

import org.apache.spark.sql.functions._

/** Round-12 pack, fourteenth batch — perceptual near-dup for the
  * multimodal column: dHash over the stubbed decode (the
  * `Multimodal.stubDecode` contract — fake luminances, REAL pipeline),
  * banded Hamming buckets, exact verify. Swap the md5 grid for a real
  * image decode and every stage downstream stands unchanged.
  */
object Pipeline50 {

  val entries: Seq[QEntry] = Seq(

    // Perceptual-hash near-dup (dHash): each media payload "decodes"
    // to an 8×8 luminance grid — STUB decode per the multimodal
    // contract: lum(cell) = md5(text ‖ cell) byte, deterministic and
    // oracle-replayable in place of a codec. The dHash is the 56-bit
    // row-wise gradient sign (8 rows × 7 horizontal diffs); every 20th
    // doc gets a PLANTED brightness-shifted copy (+3 clamped at 255 —
    // the transform dHash is built to survive: equal shifts preserve
    // sign, only saturation flips bits). Candidates from 4×14-bit
    // Hamming bands (a pair within distance 3 always shares a band),
    // verified at Hamming ≤ 6. Organic byte-identical docs surface at
    // distance 0; planted shifts at small distances — the image-dedup
    // recall story, pinned end to end through Spark-shaped stages
    // (one explode to the cell grain, one array fold, one band join).
    QEntry("q328_phash_neardup",
      (s, d) => {
        val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val all = base.select(col("doc_id").as("id"), col("text"),
            lit(0L).as("sh"))
          .union(base.filter(col("doc_id") % 20 === 0)
            .select((col("doc_id") + 10000000L).as("id"), col("text"),
              lit(3L).as("sh")))
        val lums = all
          .select(col("id"), col("text"), col("sh"),
            explode(sequence(lit(0), lit(63))).as("cell"))
          .select(col("id"), col("cell"),
            least(lit(255L),
              conv(substring(md5(concat(col("text"), lit(":"),
                col("cell").cast("string"))), 1, 2), 16, 10).cast("long")
                + col("sh")).as("lum"))
        val grids = lums.groupBy(col("id"))
          .agg(sort_array(collect_list(struct(col("cell"), col("lum"))))
            .as("g"))
          .select(col("id"),
            expr("transform(g, x -> x.lum)").as("l"))
        val fps = grids
          .select(col("id"), col("l"),
            explode(sequence(lit(0), lit(55))).as("k"))
          .select(col("id"),
            expr("CASE WHEN element_at(l, CAST(k div 7 AS INT) * 8 + " +
              "k % 7 + 1) > element_at(l, CAST(k div 7 AS INT) * 8 + " +
              "k % 7 + 2) THEN shiftleft(1L, CAST(k AS INT)) " +
              "ELSE 0L END").as("bit"))
          .groupBy(col("id")).agg(sum(col("bit")).as("fp"))
          .localCheckpoint() // band explode + verify both read it
        val bands = fps.select(col("id"), col("fp"),
          explode(sequence(lit(0), lit(3))).as("b"))
          .select(col("id"), col("fp"), col("b"),
            expr("(fp div shiftleft(1L, CAST(b * 14 AS INT))) % 16384")
              .as("bv"))
        val cand = bands.select(col("id").as("a_id"), col("fp").as("fa"),
            col("b"), col("bv"))
          .join(bands.select(col("id").as("b_id"), col("fp").as("fb"),
            col("b"), col("bv")), Seq("b", "bv"))
          .filter(col("a_id") < col("b_id"))
          .select(col("a_id"), col("b_id"), col("fa"), col("fb"))
          .distinct()
        cand
          .select(col("a_id"), col("b_id"),
            expr("bit_count(fa ^ fb)").cast("long").as("hamming"))
          .filter(col("hamming") <= 6)
          .orderBy(col("a_id"), col("b_id"))
      },
      Some("""WITH base AS (SELECT doc_id, text FROM documents),
              al AS (
                SELECT doc_id AS id, text, 0 AS sh FROM base
                UNION ALL
                SELECT doc_id + 10000000, text, 3 FROM base
                WHERE doc_id % 20 = 0),
              cells AS (SELECT unnest(generate_series(0, 63)) AS cell),
              lums AS (
                SELECT al.id, cells.cell,
                  least(255, ('0x' || substr(md5(al.text || ':' ||
                    CAST(cells.cell AS VARCHAR)), 1, 2))::BIGINT + al.sh)
                    AS lum
                FROM al, cells),
              grids AS (
                SELECT id, list(lum ORDER BY cell) AS l
                FROM lums GROUP BY id),
              ks AS (SELECT unnest(generate_series(0, 55)) AS k),
              fps AS (
                SELECT g.id,
                  sum(CASE WHEN g.l[(k // 7) * 8 + k % 7 + 1] >
                               g.l[(k // 7) * 8 + k % 7 + 2]
                      THEN (1::BIGINT << CAST(k AS INTEGER))
                      ELSE 0 END) AS fp
                FROM grids g, ks GROUP BY g.id),
              bands AS (
                SELECT id, fp, b,
                  (fp // (1::BIGINT << CAST(b * 14 AS INTEGER))) % 16384
                    AS bv
                FROM fps, (SELECT unnest(generate_series(0, 3)) AS b)),
              cand AS (
                SELECT DISTINCT a.id AS a_id, b.id AS b_id,
                  a.fp AS fa, b.fp AS fb
                FROM bands a JOIN bands b
                  ON a.b = b.b AND a.bv = b.bv AND a.id < b.id)
              SELECT a_id, b_id,
                CAST(bit_count(xor(fa, fb)) AS BIGINT) AS hamming
              FROM cand WHERE bit_count(xor(fa, fb)) <= 6
              ORDER BY a_id, b_id"""))
  )
}
