package graft

/** Dev probe: inspect template parse tree for ngrams substitution bug. */
object ProbeNgrams {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("4")
    val sql = "case when size(__a) >= __b then " +
      "transform(sequence(1, size(__a) - __b + 1), i -> slice(__a, i, __b)) " +
      "else array() end"
    val e = spark.sessionState.sqlParser.parseExpression(sql)
    println(e.treeString.take(4000))
    spark.stop()
  }
}
