package graft.oma

import java.nio.file.{Files, Paths}

/** Writes the adversarial golden fixture to disk in all three input
  * formats — the input generator for tools/spark_submit_demo.sh (the
  * end-to-end `spark-submit --class graft.oma.OmaCli` demonstration).
  */
object FixtureFiles {
  def main(args: Array[String]): Unit = {
    val dir = Paths.get(args(0))
    Files.createDirectories(dir)
    val in = Fixtures.fixture
    Files.write(dir.resolve("fixture.o5m"), O5m.write(in, resetEvery = 16))
    Files.write(dir.resolve("fixture.pbf"), Pbf.write(in, perBlock = 16))
    Files.writeString(dir.resolve("fixture.osm"), OsmXml.write(in))
    println(s"wrote fixture.{o5m,pbf,osm} to $dir")
  }
}
