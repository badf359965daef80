package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy string join at edit distance <= 1 via symmetric-deletion
  * blocking (the SymSpell scheme): two strings within one edit always
  * share a member of D(x) = {x} ∪ { x minus one char } —
  *  - substitution: delete the differing position from both;
  *  - insertion/deletion: the shorter string IS a deletion of the longer;
  *  - equality: x itself.
  * So exploding each side to its |x|+1 deletion signatures and
  * equi-joining on the signature is a LOSSLESS candidate generator, and
  * the exact `levenshtein` filter runs on candidates only. Cost:
  * O(n·len) exploded rows and a hash join, versus the O(n·m) levenshtein
  * matrix of a theta join — the classic data-cleaning join (typo'd keys
  * against a clean dimension) made shuffle-shaped.
  *
  * The q76 oracle is the brute-force formulation, so the driver gate
  * itself proves the blocking drops no pair.
  */
object FuzzyJoin {

  /** D(x): the string itself plus every single-character deletion,
    * deduplicated (repeated chars collapse). Fused codegen kernel
    * (round 17, guide §4) — the interpreted
    * `array_distinct(transform(sequence(0, len), i -> concat(substr...)))`
    * lambda was the dominant task time of q192/q321/q76; same signature
    * set, first-occurrence order (expressions/Md5Sig.delSignatures). */
  private def delSignatures(s: org.apache.spark.sql.Column) =
    graft.expressions.functions.del_signatures(s)

  /** The blocking stage alone: distinct candidate id pairs (a_id <
    * b_id) sharing a deletion signature, BEFORE the exact levenshtein
    * filter — the observable behind blocking-quality audits (q321
    * measures its reduction ratio and pair completeness against
    * planted truth). */
  def deletionCandidates(df: DataFrame, id: String, str: String): DataFrame = {
    val sigs = df
      .select(col(id).as("__id"), explode(delSignatures(col(str))).as("sig"))
    sigs.select(col("__id").as("a_id"), col("sig"))
      .join(sigs.select(col("__id").as("b_id"), col("sig")), "sig")
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .distinct()
  }

  /** All (leftId, rightId, dist) with levenshtein(left, right) <= 1.
    * Column names in the output: left_id, right_id, dist. */
  def editDistance1(
      left: DataFrame, leftId: String, leftStr: String,
      right: DataFrame, rightId: String, rightStr: String): DataFrame = {
    val l = left.select(col(leftId).as("left_id"), col(leftStr).as("ls"))
      .select(col("left_id"), col("ls"), explode(delSignatures(col("ls"))).as("sig"))
    val r = right.select(col(rightId).as("right_id"), col(rightStr).as("rs"))
      .select(col("right_id"), col("rs"), explode(delSignatures(col("rs"))).as("sig"))
    l.join(r, "sig")
      .select(col("left_id"), col("right_id"), col("ls"), col("rs"))
      .distinct()
      .select(col("left_id"), col("right_id"),
        levenshtein(col("ls"), col("rs")).as("dist"))
      .filter(col("dist") <= 1)
  }
}
