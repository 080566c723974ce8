package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tools.MediaFixtureGen

/** The multimodal plumbing over the in-memory fixture rows: byte-exact
  * dedup, decode-boundary determinism, resize contract, joint filtering.
  */
class MultimodalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private lazy val media = spark.createDataFrame(
    spark.sparkContext.parallelize(MediaFixtureGen.rows, 3),
    MediaFixtureGen.schema)

  test("byteDedupGroups finds the duplicate payload pairs (0,1) and (2,3)") {
    val groups = Multimodal.byteDedupGroups(media).collect()
    assert(groups.length === 10) // 12 media, two dup pairs
    val dups = groups.filter(_.getAs[Long]("group_size") == 2L)
      .map(_.getAs[Long]("keeper")).sorted
    assert(dups.toSeq === Seq(0L, 2L))
  }

  test("decodeFeatures is deterministic and partition-invariant") {
    val one = Multimodal.decodeFeatures(media.repartition(1))
      .collect().sortBy(_.media_id)
    val many = Multimodal.decodeFeatures(media.repartition(5))
      .collect().sortBy(_.media_id)
    assert(one.toSeq === many.toSeq)
    assert(one.forall(_.n_bytes === 16L * 16 * 3))
    // equal payloads -> equal features
    val byId = one.map(f => f.media_id -> f).toMap
    assert(byId(0L).phash === byId(1L).phash)
    assert(byId(0L).mean_luma === byId(1L).mean_luma)
    assert(byId(2L).phash === byId(3L).phash)
    // distinct payloads -> distinct phash (on this fixture)
    assert(byId(4L).phash !== byId(6L).phash)
  }

  test("decode stubs reproduce independently-computed golden vectors " +
    "(values pinned outside the JVM; a real decoder replaces exactly " +
    "these functions)") {
    // Expected values computed by an independent Python implementation
    // of the documented contracts (mean byte value; 64-block aHash),
    // NOT by running the stubs — a silent change to either stub's
    // arithmetic fails here even though it stays deterministic.
    val ramp256 = Array.tabulate(256)(i => i.toByte)
    val const7 = Array.fill(100)(7.toByte)
    val one255 = Array(255.toByte)
    val lcg300 = Array.tabulate(300)(i => ((i * 37 + 11) % 256).toByte)
    val golden = Seq[(Array[Byte], Double, Long)](
      (ramp256, 127.5, -4294967296L), // bits 32..63: upper ramp half
      (const7, 7.0, 0L),              // flat payload: no bit above mean
      (Array.emptyByteArray, 0.0, 0L),
      (one255, 255.0, 1L),            // only block 0 has data
      (lcg300, 127.246667, -6509015766999421614L))
    for (((bytes, luma, ph), i) <- golden.zipWithIndex) {
      assert(math.abs(Multimodal.decodeStub(bytes) - luma) < 1e-6,
        s"vector $i mean_luma")
      assert(Multimodal.phashStub(bytes) === ph, s"vector $i phash")
    }
    // resize golden: 100 bytes into a 2x2x3 budget strides exactly these
    val src = Array.tabulate(100)(_.toByte)
    assert(Multimodal.resizeStub(src, 10, 10, 2, 2).toSeq ===
      Seq(0, 8, 16, 25, 33, 41, 50, 58, 66, 75, 83, 91).map(_.toByte))
    // and the whole distributed boundary carries the same values
    import spark.implicits._
    val df = Seq((0L, "img", 16, 16, ramp256), (1L, "img", 16, 16, lcg300))
      .toDF("media_id", "kind", "width", "height", "bytes")
    val feats = Multimodal.decodeFeatures(df.repartition(2))
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(0L).phash === -4294967296L)
    assert(feats(1L).phash === -6509015766999421614L)
    assert(math.abs(feats(1L).mean_luma - 127.246667) < 1e-6)
  }

  test("resized meets the target byte budget and keeps ids") {
    val out = Multimodal.resized(media, dstW = 4, dstH = 4).collect()
    assert(out.length === 12)
    assert(out.forall(_._2.length === 4 * 4 * 3))
    // determinism
    val again = Multimodal.resized(media, dstW = 4, dstH = 4).collect()
    assert(out.sortBy(_._1).map(_._2.toSeq).toSeq ===
      again.sortBy(_._1).map(_._2.toSeq).toSeq)
  }

  test("sampledFrames keeps every stride-th fixed-size frame") {
    // 768-byte payloads, 64-byte frames -> 12 frames, stride 3 -> 4 kept
    val frames = Multimodal.sampledFrames(media, frameSize = 64, stride = 3)
      .collect()
    assert(frames.length === 12 * 4)
    assert(frames.forall(_._3.length === 64))
    val forOne = frames.filter(_._1 == 0L).map(_._2).sorted
    assert(forOne.toSeq === Seq(0, 3, 6, 9))
    // determinism: frame 0 of media 0 == first 64 payload bytes of media 1
    // (ids 0 and 1 share bytes)
    val f0 = frames.find(f => f._1 == 0L && f._2 == 0).get._3.toSeq
    val f1 = frames.find(f => f._1 == 1L && f._2 == 0).get._3.toSeq
    assert(f0 === f1)
  }

  test("jointFilter collapses a near-dup CLUSTER to its min-id keeper " +
    "(star through the max id: a~c, b~c, a!~c's partner b)") {
    import spark.implicits._
    // 2-D star: a at 0°, c at 20°, b at 40° -> cos(a,c)=cos(b,c)≈0.94 ≥ 0.9
    // but cos(a,b)≈0.77 < 0.9. Component {a,b,c} connected through c;
    // cluster-collapse keeps only a. (The round-2 "similar to any lower id"
    // form would have kept b — its only neighbor c has a HIGHER id.)
    def vec(deg: Double) = Seq(math.cos(math.toRadians(deg)),
      math.sin(math.toRadians(deg)))
    val media = Seq(
      (1L, "alpha beta gamma", vec(0)),
      (2L, "alpha beta gamma", vec(40)),
      (3L, "alpha beta gamma", vec(20)))
      .toDF("media_id", "caption", "embedding")
    val kept = Multimodal.jointFilter(media, minCaptionTokens = 3,
      dupThreshold = 0.9, pairSource = Multimodal.exactPairs)
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L))
  }

  test("jointFilter tolerates NULL embeddings (partial backfill): the " +
    "lshPairs dim probe must not NPE on a null-embedding row and such " +
    "rows cannot pair") {
    import spark.implicits._
    val rows = Seq(
      (1L, "alpha beta gamma", Some(Seq(1.0, 0.0))),
      (2L, "delta epsilon zeta", Option.empty[Seq[Double]]),
      (3L, "eta theta iota", Some(Seq(0.0, 1.0))))
      .toDF("media_id", "caption", "embedding")
    // pre-fix: limit(1) could sample row 2, size(NULL) -> NULL,
    // getInt(0) threw — a flaky data-dependent crash
    val kept = Multimodal.jointFilter(rows.orderBy(col("media_id").desc),
        minCaptionTokens = 3, dupThreshold = 0.9)
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(1L) && kept.contains(3L))
  }

  test("phashNearDupPairs surfaces the byte-identical payload pairs") {
    val pairs = Multimodal.phashNearDupPairs(media, maxDist = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ids (0,1) and (2,3) share payload bytes -> identical phash
    assert(pairs.contains((0L, 1L)) && pairs.contains((2L, 3L)))
  }

  test("jointFilter on a fully-filtered input returns empty, not a crash " +
    "(lshPairs dim probe has no row to read)") {
    val kept = Multimodal.jointFilter(media, minCaptionTokens = 10000,
      dupThreshold = 0.9) // default lshPairs pair source
      .collect()
    assert(kept.isEmpty)
  }

  test("jointFilter drops short captions and near-dup embeddings") {
    val kept = Multimodal.jointFilter(media, minCaptionTokens = 3,
      dupThreshold = 0.98)
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(8L) && !kept.contains(9L)) // short captions
    assert(kept.contains(0L) && !kept.contains(5L)) // 5 near-dups 0's embedding
    assert(kept.contains(2L) && kept.contains(3L)) // byte dups, distinct embeddings
  }
}
