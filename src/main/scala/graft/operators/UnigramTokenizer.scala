package graft.operators

/** Unigram-LM tokenizer apply (the SentencePiece/Kudo 2018 family,
  * beside the BPE train/encode pair in queries/TextOps): given a piece
  * vocabulary with integer scores, segment a word by Viterbi DP. The
  * textbook objective maximizes Σ log p(piece) — float, libm-bound,
  * and irreproducible across engines; this determinized variant
  * optimizes the integer tuple
  *
  *   (fewest pieces, then largest Σ piece score, then smallest split
  *    point — i.e. the longest final piece — applied recursively)
  *
  * which is a total order over segmentations, so the result is a pure
  * function of (word, vocabulary) — the property every spec and any
  * future oracle needs. Fewest-pieces-first is also what a compression
  * tokenizer is FOR (minimum tokens per word); the score breaks ties
  * toward frequent pieces exactly like the LM objective would.
  *
  * The DP is per-word imperative logic over a driver-broadcast
  * vocabulary — the mapPartitions niche (same as the media codecs):
  * no join shape expresses a backtracking DP, and the vocabulary is
  * model-scaled (KBs), never data-scaled.
  */
object UnigramTokenizer {

  /** Viterbi-segment `word`; every character of `word` must be in the
    * vocabulary as a single-char piece (the caller guarantees it by
    * construction — see q174), so segmentation never fails. */
  def segment(word: String, vocab: Map[String, Long], maxPieceLen: Int): Seq[String] = {
    val n = word.length
    if (n == 0) return Seq.empty
    val INF = Int.MaxValue
    val dpCnt = Array.fill(n + 1)(INF)
    val dpScore = new Array[Long](n + 1)
    val back = Array.fill(n + 1)(-1)
    dpCnt(0) = 0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (dpCnt(j) != INF) {
          vocab.get(word.substring(j, i)) match {
            case Some(sc) =>
              val c = dpCnt(j) + 1
              val s = dpScore(j) + sc
              // strict improvement only: j ascends, so on full ties the
              // SMALLEST j (longest final piece) wins — the documented
              // deterministic tie order
              if (c < dpCnt(i) || (c == dpCnt(i) && s > dpScore(i))) {
                dpCnt(i) = c
                dpScore(i) = s
                back(i) = j
              }
            case None => ()
          }
        }
        j += 1
      }
      i += 1
    }
    require(dpCnt(n) != INF, s"unsegmentable word '$word'")
    val out = List.newBuilder[String]
    val rev = scala.collection.mutable.ListBuffer.empty[(Int, Int)]
    var p = n
    while (p > 0) { rev.prepend((back(p), p)); p = back(p) }
    rev.foreach { case (a, b) => out += word.substring(a, b) }
    out.result()
  }
}
