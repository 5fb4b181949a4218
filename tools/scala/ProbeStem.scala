package graft

/** Dev probe: print Porter stems for the qc4 oracle word list. */
object ProbeStem {
  def main(args: Array[String]): Unit = {
    val words = Seq("running", "flies", "caresses", "ponies", "cats",
      "happiness", "relational", "conditional", "connection", "formalize",
      "electricity", "hopeful", "adjustment", "replacement", "controller",
      "motoring", "sized", "agreed", "plastered", "generalization")
    words.foreach(w =>
      println(s"[stem] ('$w', '${graft.functions.PorterStemmer.stem(w)}'),"))
  }
}
