package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword tokenization (the WordPiece/left-to-right
  * BPE-apply scheme): at each position consume the LONGEST vocabulary
  * piece that matches; a position no piece covers makes the whole word
  * [UNK]. Returns the piece count, or -1 for [UNK].
  *
  * The vocabulary rides the expression as a reference object (same
  * pattern as the centroid matrix / Bloom filter): a HashSet probe per
  * candidate length, longest-first, so the cost per word is
  * O(len · maxPieceLen) set lookups. Apply it to DISTINCT words and join
  * back (dictionary-encoding) — a 100 TB corpus has billions of token
  * OCCURRENCES but only millions of distinct words.
  *
  * (CodegenFallback: per-word loop dominates the virtual call.)
  */
object Tokenize {
  import org.apache.spark.sql.graftbridge.Bridge.{column => toCol, expression => toExpr}

  def greedyPieceCount(word: Column, vocab: Seq[String]): Column =
    toCol(GreedyPiecesExpr(toExpr(word), vocab.toArray))
}

case class GreedyPiecesExpr(child: Expression, vocab: Array[String])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType

  @transient private lazy val pieces: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.length * 2)
    vocab.foreach(s.add)
    s
  }
  @transient private lazy val maxLen: Int =
    if (vocab.isEmpty) 0 else vocab.map(_.length).max

  override def nullSafeEval(v: Any): Any = {
    val w = v.asInstanceOf[UTF8String].toString
    var pos = 0
    var n = 0
    while (pos < w.length) {
      var len = math.min(maxLen, w.length - pos)
      var matched = -1
      while (len >= 1 && matched < 0) {
        if (pieces.contains(w.substring(pos, pos + len))) matched = len
        len -= 1
      }
      if (matched < 0) return -1
      pos += matched
      n += 1
    }
    n
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "graft_greedy_pieces"
}
