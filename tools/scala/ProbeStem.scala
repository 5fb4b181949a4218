package graft

/** Dev probe: print Porter stems for the qc4 oracle word list. */
object ProbeStem {
  def main(args: Array[String]): Unit = {
    val words = Seq("running", "flies", "caresses", "ponies", "cats",
      "happiness", "relational", "conditional", "connection", "formalize",
      "electricity", "hopeful", "adjustment", "replacement", "controller",
      "motoring", "sized", "agreed", "plastered", "generalization",
      "ties", "dying", "news", "communication")
    words.foreach(w =>
      println(s"[stem] ('$w', '${graft.functions.Porter2Stemmer.stem(w)}'),"))
  }
}
