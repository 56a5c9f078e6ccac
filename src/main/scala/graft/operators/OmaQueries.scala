package graft.operators

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.oma._

/** Driver-gate surface of the OMA pipeline (steps 1-3 end-to-end on the
  * deterministic OSM fixture; golden-diffed against oma.jar in
  * OmaGoldenSpec — here the per-chunk structure is exposed as rows).
  */
object OmaQueries {

  val defs: Seq[QueryDef] = Seq(
    // fixture-driven (input-independent): the oracle is the frozen expected
    // chunk structure, which OmaGoldenSpec independently diffs against the
    // reference oma.jar output
    QueryDef.sql("oma_pipeline", FrozenOracles.omaPipeline) { (s, _) =>
      import s.implicits._
      val res = OmaPipeline.run(s, OsmXml.write(Fixtures.fixture),
        Fixtures.smallBbs, TypeConfig.Minimal, features = 31, zip = false, oneElement = false)
      res.parsed.chunks.zipWithIndex.map { case (c, i) =>
        (i.toLong, c.ctype.toString, c.blocks.length.toLong,
          c.blocks.map(_.slices.length).sum.toLong,
          c.blocks.map(_.slices.map(_.elements.length).sum).sum.toLong)
      }.toDF("chunk", "ctype", "n_blocks", "n_slices", "n_elements")
        .orderBy("chunk")
    },

    QueryDef.sql("oma_reunify", FrozenOracles.omaReunify) { (s, _) =>
      val (_, els) = ReunifySpark.reunify(s, Fixtures.fixture)
      els.groupBy(col("kind")).agg(
          count(lit(1)).as("n"),
          sum(expr("size(lon)")).as("n_vertices"),
          sum(expr("size(members)")).as("n_backlinks"))
        .orderBy("kind")
    }
  )
}
