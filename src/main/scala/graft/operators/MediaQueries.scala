package graft.operators

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Oracle coverage for the multimodal ingest path — the one family that was
  * ⚙-only through round 9. DuckDB cannot decode WAV/PNG, but it CAN read a
  * directory of blobs: q98 runs [[Multimodal.readMediaDir]]'s decode-free
  * metadata scan over a committed fixture directory (`fixtures/media/`, 22
  * files covering every modality dispatch arm: the JDK-decodable image and
  * audio formats, the declared-but-not-decodable ones (tiff/mp3/flac/ogg),
  * the video extensions, an extensionless file, an UPPER-case extension, and
  * a `.tar.gz`), and the oracle recomputes the same rows from DuckDB's
  * `read_blob` — pinning ingestion determinism (file identity, byte length,
  * extension→modality dispatch) end to end across engines.
  *
  * Cross-engine file key: md5 of the file's basename (xxhash64, the engine's
  * media_id, has no DuckDB mirror — the md5-twin pattern of q41b/q43b).
  * Fixture path is absolute because the oracle SQL is a static string
  * executed by the driver's DuckDB with an unknown working directory.
  */
object MediaQueries extends QueryGroup {

  /** Committed fixture (deterministic bytes, no timestamps — safe to hash).
    * The Spark side prefers the checkout-relative copy so tests run from
    * any clone/worktree; the driver-contract absolute path is the
    * fallback AND the only form the static oracle SQL can use — a clone
    * elsewhere with a MODIFIED fixture diverges from the oracle's read
    * and fails the hash check, which is the correct outcome. */
  val fixtureDir: String = {
    // accept the relative candidate only when it is recognizably THIS
    // fixture set (README marker + exact file count): a driver run
    // launched from a cwd that happens to contain an unrelated
    // fixtures/media would otherwise scan different files than the
    // oracle's absolute path and fail with a confusing hash diff
    val local = new java.io.File("fixtures/media")
    val isFixtureSet = local.isDirectory &&
      new java.io.File(local, "README").isFile &&
      Option(local.list()).exists(_.length == 22)
    if (isFixtureSet) local.getAbsolutePath else "/root/repo/fixtures/media"
  }

  private val q98: Q = (s, _) =>
    Multimodal.readMediaDir(s, fixtureDir, keepPath = true)
      .select(
        md5(regexp_extract(col("path"), "[^/]+$", 0).cast("binary"))
          .as("file_key"),
        col("modality"),
        col("meta.format").as("format"),
        length(col("bytes")).cast("long").as("n_bytes"))
      .orderBy("file_key")

  val queries: Seq[(String, Q)] = Seq(
    "q98_media_ingest_metadata" -> q98,
    // ⚙ rows-only: perceptual near-dup over generated deterministic
    // media with in-query constructed twins (DuckDB cannot decode
    // images/audio); recall/precision contracts spec-pinned in
    // MediaDedupSpec
    "q102_media_perceptual_dedup" -> ((s, _) => MediaDedup.q102(s)),
    "q103_media_audio_dedup" -> ((s, _) => MediaDedup.q103(s)),
  )

  // the CASE arms mirror readMediaDir's extension lists exactly
  // (ImageIoCodec.formats + tif/tiff; WavCodec.formats + mp3/flac/ogg)
  val oracles: Map[String, String] = Map(
    "q98_media_ingest_metadata" ->
      """WITH blobs AS (
        |  SELECT regexp_extract(filename, '[^/]+$') AS fname,
        |         lower(regexp_extract(filename, '\.([A-Za-z0-9]+)$', 1)) AS ext,
        |         octet_length(content) AS len
        |  FROM read_blob('/root/repo/fixtures/media/*'))
        |SELECT md5(fname) AS file_key,
        |  CASE WHEN ext IN ('bmp','gif','jpeg','jpg','png','wbmp','tif','tiff')
        |         THEN 'image'
        |       WHEN ext IN ('aif','aiff','au','wav','wave','mp3','flac','ogg')
        |         THEN 'audio'
        |       WHEN ext IN ('mp4','mkv','webm','avi') THEN 'video'
        |       ELSE 'binary' END AS modality,
        |  ext AS format,
        |  CAST(len AS BIGINT) AS n_bytes
        |FROM blobs ORDER BY file_key""".stripMargin,
  )
}
