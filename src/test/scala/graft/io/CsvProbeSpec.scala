package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.SparkSpec

/** S1 charset/separator probing and S4 routing
  * (reference main.py:1337-1342, 1188-1204). */
class CsvProbeSpec extends SparkSpec {

  private def tmpCsv(content: Array[Byte]): String = {
    val f = Files.createTempFile("probe_spec", ".csv")
    Files.write(f, content)
    f.toString
  }

  test("utf-8 with semicolons detected") {
    val (cs, sep) = CsvProbe.probe(
      tmpCsv("a;b;c\n1;2;3\n".getBytes(StandardCharsets.UTF_8)))
    assert(cs === StandardCharsets.UTF_8)
    assert(sep === ';')
  }

  test("latin-1 accents fall back from utf-8") {
    val (cs, sep) = CsvProbe.probe(
      tmpCsv("id,campaña\n1,café\n".getBytes(StandardCharsets.ISO_8859_1)))
    assert(cs === StandardCharsets.ISO_8859_1)
    assert(sep === ',')
  }

  test("separator inside quotes is not counted") {
    val (_, sep) = CsvProbe.probe(
      tmpCsv("a;\"x,y,z,w\";c\n".getBytes(StandardCharsets.UTF_8)))
    assert(sep === ';')
  }

  test("probe reads at most probeBytes and survives a split multibyte char") {
    // é at exactly the truncation boundary; trim-to-newline must rescue UTF-8
    val line = "héllo wörld;1\n"
    val big = (line * 20000).getBytes(StandardCharsets.UTF_8)
    val path = tmpCsv(big)
    val (cs, _) = CsvProbe.probe(path, probeBytes = 1001) // mid-char cut likely
    assert(cs === StandardCharsets.UTF_8)
  }

  test("empty file does not crash") {
    val (cs, _) = CsvProbe.probe(tmpCsv(Array.emptyByteArray))
    assert(cs === StandardCharsets.UTF_8) // empty decodes as anything; first wins
  }

  test("routeByName (main.py:1188-1204)") {
    assert(CsvProbe.routeByName("Reporte_Conducta_2024.csv") === Some("conducta"))
    assert(CsvProbe.routeByName("estados_ops.csv") === Some("estados_operativos"))
    assert(CsvProbe.routeByName("OPERATIVOS.xlsx") === Some("estados_operativos"))
    assert(CsvProbe.routeByName("other.csv") === None)
  }

  test("read: full pipeline (probe + distributed read) decodes latin-1") {
    val path = tmpCsv("id;campaña\n1;café\n2;niño\n"
      .getBytes(StandardCharsets.ISO_8859_1))
    val df = CsvProbe.read(spark, path)
    assert(df.columns.toSeq === Seq("id", "campaña"))
    assert(df.count() === 2)
    assert(df.collect().map(_.getString(1)).toSet === Set("café", "niño"))
  }

  test("property: routeCol (distributed) == routeByName (driver) on " +
      "arbitrary filenames") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val gen = for {
      pre <- org.scalacheck.Gen.alphaNumStr
      mid <- org.scalacheck.Gen.oneOf(
        "conducta", "estados", "operativo", "CONDUCTA", "Estados", "x", "")
      post <- org.scalacheck.Gen.alphaNumStr
    } yield s"$pre$mid$post.csv"
    val names = Iterator.continually(gen.sample).flatten.take(60).toSeq
    val out = names.toDF("f")
      .select(col("f"), CsvProbe.routeCol(col("f")).as("r")).collect()
    out.foreach { r =>
      assert(Option(r.getString(1)) === CsvProbe.routeByName(r.getString(0)),
        s"diverged on '${r.getString(0)}'")
    }
  }
}
