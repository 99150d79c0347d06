package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucket-partitioned maintained-state generations — the state-I/O
  * discipline for every per-batch fold that maintains a corpus-sized
  * artifact (dedup cluster labels, the survivor manifest).
  *
  * The problem it solves: a fold whose COMPUTE is O(delta) but whose
  * generation write is a full snapshot pays O(standing state) I/O per
  * micro-batch — at a 10^10-doc corpus that is a full label-table
  * rewrite per batch. Here each generation dir holds ONLY the bucket
  * partitions the batch touched; every other bucket is SHARED with an
  * earlier generation through the owners map, so per-batch write I/O is
  * O(touched buckets), not O(corpus).
  *
  * Layout under `root`:
  * {{{
  *   gen-<id>/bucket=<b>/…parquet   // the buckets batch <id> rewrote
  *   gen-<id>/_owners.json          // {"rows":N,"owners":{"<b>":<gen>,…}}
  * }}}
  * The owners map names, for EVERY bucket, the generation dir holding
  * its current content; [[AtRest]] (-1) means the bucket is still the
  * staged at-rest state, untouched by any fold. `rows` carries the
  * standing row count so serving a count never re-reads the state.
  *
  * Commit discipline (q158's committed-predecessor rules, adapted):
  * the `_owners.json` file is the COMMIT MARKER, written after the
  * parquet payload — Spark's own `_SUCCESS` is not enough because a
  * crash between the payload and the owners map would leave a
  * generation that parses as committed but cannot be resolved. A
  * replayed batch id re-bases on the latest generation committed
  * STRICTLY BELOW it and overwrites its own torn dir whole, so folds
  * converge under foreachBatch's at-least-once delivery.
  */
private[graft] object BucketedGens {

  /** One committed generation: which gen owns each bucket's current
    * content, plus the standing row count. */
  final case class Gen(genId: Long, owners: Map[Int, Long], rows: Long)

  /** Owner sentinel: the bucket's content is the staged at-rest state. */
  val AtRest: Long = -1L

  /** Owner sentinel: the bucket holds NO rows (every cluster in it
    * dissolved) — parquet cannot represent an empty partition dir, so
    * emptiness lives in the owners map and reads skip the bucket. */
  val Empty: Long = -2L

  /** The owners map before any fold ran: every bucket at rest. */
  def initialOwners(nBuckets: Int): Map[Int, Long] =
    (0 until nBuckets).map(_ -> AtRest).toMap

  private def ownersFile(root: String, genId: Long) =
    new java.io.File(s"$root/gen-$genId/_owners.json")

  /** Commit generation `genId`: write the owners map + standing row
    * count ATOMICALLY (temp file + rename) after the parquet payload. */
  def commit(root: String, genId: Long, owners: Map[Int, Long], rows: Long): Unit = {
    val body = owners.toSeq.sortBy(_._1)
      .map { case (b, g) => s""""$b":$g""" }.mkString("{", ",", "}")
    val dir = new java.io.File(s"$root/gen-$genId")
    dir.mkdirs()
    val tmp = java.io.File.createTempFile("_owners", ".tmp", dir)
    val w = new java.io.PrintWriter(tmp, "UTF-8")
    try w.print(s"""{"rows":$rows,"owners":$body}""") finally w.close()
    java.nio.file.Files.move(tmp.toPath, ownersFile(root, genId).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  private def genNumOf(f: java.io.File): Long = f.getName.stripPrefix("gen-").toLong

  private def parse(root: String, genId: Long): Gen = {
    val text = new String(java.nio.file.Files.readAllBytes(
      ownersFile(root, genId).toPath), "UTF-8")
    val rows = """"rows"\s*:\s*(\d+)""".r.findFirstMatchIn(text)
      .map(_.group(1).toLong)
      .getOrElse(sys.error(s"BucketedGens: no rows field in gen-$genId owners"))
    val ownersBody = text.substring(text.indexOf("\"owners\""))
    val owners = """"(\d+)"\s*:\s*(-?\d+)""".r.findAllMatchIn(ownersBody)
      .map(m => m.group(1).toInt -> m.group(2).toLong).toMap
    Gen(genId, owners, rows)
  }

  /** Latest COMMITTED generation under `root` (optionally strictly below
    * `below` — the replay re-base read). Committed = owners file present. */
  def latest(root: String, below: Option[Long] = None): Option[Gen] =
    Option(new java.io.File(root).listFiles()).toSeq.flatten
      .filter(f => f.getName.startsWith("gen-") &&
        new java.io.File(f, "_owners.json").exists() &&
        below.forall(genNumOf(f) < _))
      .sortBy(genNumOf).lastOption.map(f => parse(root, genNumOf(f)))

  /** Read buckets `only` (or all) of generation `gen`: buckets grouped
    * by owning generation, ONE partition-pruned read per owner dir;
    * [[AtRest]] buckets come from `atRest` (the staged at-rest frame,
    * itself bucket-partitioned so the same pruning applies). Every
    * frame must carry the physical `bucket` partition column. */
  def read(s: SparkSession, root: String, gen: Gen, atRest: => DataFrame,
      only: Option[Seq[Int]] = None): DataFrame = {
    val wanted = only match {
      case None     => gen.owners
      case Some(bs) => gen.owners.filter { case (b, _) => bs.contains(b) }
    }
    val parts = wanted.filter(_._2 != Empty)
      .groupBy(_._2).toSeq.sortBy(_._1).map { case (o, kv) =>
        val bs = kv.keys.toSeq.sorted
        val df = if (o == AtRest) atRest else s.read.parquet(s"$root/gen-$o")
        df.filter(col("bucket").isin(bs.map(Int.box): _*))
      }
    parts.reduceOption(_.unionByName(_)).getOrElse(atRest.limit(0))
  }

  /** Vacuum after committing `nextId` on predecessor `base`: a
    * committed generation strictly below `base` that owns no bucket in
    * base's map is unreachable (a replay of the in-flight batch
    * re-bases on `base`, whose reads resolve only through its own
    * owners); an uncommitted dir below `nextId` is a torn write. Gens
    * still owning buckets stay — that is the point of sharing. */
  def vacuum(root: String, base: Option[Gen], nextId: Long): Unit = {
    val keep: Set[Long] = base.map(g => g.owners.values.toSet + g.genId).getOrElse(Set.empty)
    Option(new java.io.File(root).listFiles()).toSeq.flatten
      .filter(_.getName.startsWith("gen-"))
      .filter { f =>
        val id = genNumOf(f)
        if (new java.io.File(f, "_owners.json").exists())
          base.exists(id < _.genId) && !keep(id)
        else id < nextId
      }.foreach(EventQueries.rm)
  }
}
