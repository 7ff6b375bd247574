package graft.queries

/** Single source of truth for every named engine query (SURVEY.md §2
  * coverage). SparkEntry derives `queries` and `oracleSql` from here. */
object Registry {
  val all: Seq[GQuery] =
    Relational.all ++ TpchQueries.all ++ WindowQueries.all ++
      EntityQueries.all ++ TextQueries.all ++ PipelineQueries.all ++
      ChatQueries.all ++ SeriesQueries.all ++ IvmQueries.all ++
      InferenceQueries.all ++ SequenceQueries.all ++
      PackingQueries.all ++ Fuzz.all

  require(all.map(_.name).distinct.size == all.size,
    "duplicate query names in Registry")
}
