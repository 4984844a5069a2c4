package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.{Dedup, TextOps}

/** Streaming NEAR-duplicate detection — the live-feed twin of
  * [[graft.operators.Dedup.simhashPairs]], completing the streaming
  * dedup story next to [[StreamingIngest.exactDedupStream]] (exact
  * fingerprints). No reference counterpart (the reference is batch
  * only); this is the roadmap extension for continuously-ingested
  * corpora where near-dups should surface as documents arrive, not at
  * the next batch dedup run.
  *
  * Same math as the batch operator: 64-bit SimHash over md5-derived
  * token hashes, pigeonhole banding (a pair within hamming `h` agrees
  * exactly on ≥1 of `h+1` bands), hamming verify inside each band
  * bucket. The banding state is a `flatMapGroupsWithState` keyed by
  * (band, bucket): each arriving signature is checked against the
  * bucket's members and appended. 100 TB posture:
  *  - state holds (id, sig) pairs only — 16 bytes/doc/band, never text;
  *  - state is event-time-bounded: a bucket idle past the watermark
  *    horizon is dropped (EventTimeTimeout), so state tracks the
  *    lateness window, not the stream's history — near-dup detection
  *    against ALL history is a batch join against a stored signature
  *    table, not stream state;
  *  - a pair colliding in several bands emits once per band (the batch
  *    operator's global `.distinct()` has no bounded-state streaming
  *    equivalent); the emitted event time lets a consumer run
  *    `dropDuplicatesWithinWatermark("id_a", "id_b")` for exact-once;
  *  - re-delivery is expected (at-least-once sources): an id already in
  *    a bucket is re-checked and its signature replaced (latest wins —
  *    an updated document must not be matched by its stale signature),
  *    and every arrival refreshes the bucket's expiry clock;
  *  - degenerate hot buckets (e.g. many empty documents all hash to
  *    sig 0 and collide in bucket 0 of EVERY band) make per-arrival
  *    work O(bucket size) — same bucket shape as the batch operator,
  *    but paid per arrival here. Pre-filter trivial documents upstream
  *    (`TextOps.tokenCount > 0`) rather than inside this operator,
  *    which deliberately mirrors batch semantics 1:1.
  */
object StreamingNearDup {

  final case class BandedSig(band: Int, bucket: Long, id: Long, sig: Long,
                             ts: java.sql.Timestamp)
  final case class BucketState(members: List[(Long, Long)], lastTs: Long)
  final case class NearDupPair(id_a: Long, id_b: Long, hamming: Int,
                               tsMillis: Long)

  /** @param docs streaming DataFrame with (tsCol timestamp, idCol, textCol)
    * @return streaming Dataset of near-dup pairs (id_a < id_b)
    */
  def simhashPairsStream(docs: DataFrame, tsCol: String, idCol: String,
                         textCol: String, maxHamming: Int = 3,
                         lateness: java.time.Duration =
                           java.time.Duration.ofHours(1)): Dataset[NearDupPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val horizonMs = lateness.toMillis

    // identical signature math to the batch operator — the ONE shared
    // pipeline (Dedup.bandedSignatures), so batch/stream cannot drift.
    // The watermark-tagged event-time column must reach the stateful
    // operator itself (EventTimeTimeout is validated on its child), so
    // the timestamp rides through the banding untouched.
    val banded = Dedup.bandedSignatures(
        docs.select(col(idCol).cast("long").as("id"),
            col(textCol).as("text"), col(tsCol).as("__ts"))
          .withWatermark("__ts", s"$horizonMs milliseconds"),
        "text", maxHamming)
      .select(col("band"), col("bucket"), col("id"), col("sig"),
        col("__ts").as("ts"))
      .as[BandedSig]

    banded.groupByKey(b => (b.band, b.bucket))
      .flatMapGroupsWithState[BucketState, NearDupPair](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, rows, state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            // bucket idle past the lateness horizon: release its members
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(BucketState(Nil, 0L))
            val out = List.newBuilder[NearDupPair]
            // event-time order within the micro-batch for deterministic
            // pair timestamps
            for (r <- rows.toVector.sortBy(b => (b.ts.getTime, b.id))) {
              for ((mid, msig) <- st.members if mid != r.id) {
                val h = java.lang.Long.bitCount(msig ^ r.sig)
                if (h <= maxHamming)
                  out += NearDupPair(math.min(mid, r.id), math.max(mid, r.id),
                    h, r.ts.getTime)
              }
              // latest-wins per id: a re-ingested doc whose content
              // changed must replace its stale signature, not be
              // silently ignored; lastTs refreshes on EVERY arrival so
              // a bucket kept alive by re-deliveries never expires
              st = BucketState(
                (r.id, r.sig) :: st.members.filterNot(_._1 == r.id),
                math.max(st.lastTs, r.ts.getTime))
            }
            state.update(st)
            // GroupState cannot outlive the watermark: expire when the
            // bucket has seen nothing for a full lateness horizon. The
            // watermark may have raced past lastTs+horizon within this
            // very batch (late re-delivery into a bucket that was about
            // to time out) — a timestamp at/below the watermark throws,
            // so clamp to just above it
            state.setTimeoutTimestamp(
              math.max(st.lastTs + horizonMs, state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
  }

  /** Streaming incremental dedup — the live twin of
    * [[graft.operators.Dedup.incrementalNearDups]]: documents arriving
    * on a stream are checked against a STATIC standing-corpus MinHash
    * index ([[graft.operators.Dedup.bandedSignatures]], the persisted
    * artifact). Emits one append-mode row per verified match
    * (idCol, dup_of, jaccard, tsCol); novel docs emit nothing (a
    * consumer that needs explicit novelty anti-joins downstream), and
    * best-match folding is a consumer-side aggregation — this relation
    * is exactly [[graft.operators.Dedup.incrementalVerifiedPairs]],
    * which the parity spec asserts.
    *
    * State posture: the ONLY stateful step is
    * `dropDuplicatesWithinWatermark(id, id_corpus)` collapsing multi-
    * band collisions of one pair, bounded by the lateness horizon.
    * Everything else is stateless projection or stream-static joins:
    * the per-row signature/banding math, the index probe, the
    * corpus-text fetch for candidates, the exact-Jaccard verify.
    * Corpus text is only read for colliding candidates — the stream
    * never shuffles corpus bodies.
    */
  def incrementalStream(docs: DataFrame, tsCol: String, idCol: String,
                        textCol: String, corpusBands: DataFrame,
                        corpusDocs: DataFrame, n: Int, threshold: Double,
                        numPerm: Int = 64, bands: Int = 16,
                        lateness: java.time.Duration =
                          java.time.Duration.ofHours(1)): DataFrame = {
    val wm = docs.withWatermark(tsCol, s"${lateness.toSeconds} seconds")
    val banded = Dedup.bandedSignatures(wm, idCol, textCol, n, numPerm,
      bands, carry = Seq(tsCol), carryText = true)
    banded
      .join(corpusBands.select(col("id").as("id_corpus"),
        col("band"), col("bucket")), Seq("band", "bucket"))
      // one row per (new doc, corpus doc) no matter how many bands
      // collided; band/bucket must go first or the retained row is
      // band-dependent
      .select(col("id"), col(tsCol), col("text"), col("id_corpus"))
      .dropDuplicatesWithinWatermark("id", "id_corpus")
      .join(corpusDocs.select(col(idCol).cast("long").as("id_corpus"),
        col(textCol).as("__text_corpus")), Seq("id_corpus"))
      .withColumn("jaccard",
        Dedup.jaccardTextUdf(n)(col("text"), col("__text_corpus")))
      .filter(col("jaccard") >= threshold)
      .select(col("id").as(idCol), col("id_corpus").as("dup_of"),
        col("jaccard"), col(tsCol))
  }

  /** Streaming incremental EMBEDDING dedup — the vector twin of
    * [[incrementalStream]] (see
    * [[graft.operators.Similarity.incrementalCosineDups]] for the
    * batch form): arriving vectors probe the static corpus hyperplane
    * index ([[graft.operators.Similarity.vectorBuckets]]) via
    * stream-static joins; the only stateful step is the
    * watermark-bounded multi-table collapse; exact cosine verifies
    * candidates against corpus vectors fetched for the sliver. Emits
    * append-mode (vec_id, dup_of, cos_sim, tsCol) rows — the relation
    * of `incrementalCosineVerifiedPairs`, which the parity spec
    * asserts.
    */
  def incrementalCosineStream(vecs: DataFrame, tsCol: String,
                              corpusBuckets: DataFrame,
                              corpusVecs: DataFrame, threshold: Double,
                              dim: Int, nPlanes: Int = 8, nTables: Int = 12,
                              lateness: java.time.Duration =
                                java.time.Duration.ofHours(1)): DataFrame = {
    import graft.operators.Similarity
    val wm = vecs.withWatermark(tsCol, s"${lateness.toSeconds} seconds")
    val allBuckets = Similarity.bucketsUdf(dim, nPlanes, nTables)
    wm.select(col("vec_id").cast("long").as("id"), col(tsCol),
        col("embedding"), posexplode(allBuckets(col("embedding"))))
      .select(col("id"), col(tsCol), col("embedding"),
        col("pos").as("table"), col("col").as("bucket"))
      .join(corpusBuckets.select(col("id").as("id_corpus"),
        col("table"), col("bucket")), Seq("table", "bucket"))
      .select(col("id"), col(tsCol), col("embedding"), col("id_corpus"))
      .dropDuplicatesWithinWatermark("id", "id_corpus")
      .join(corpusVecs.select(col("vec_id").cast("long").as("id_corpus"),
        col("embedding").as("__e_corpus")), Seq("id_corpus"))
      .withColumn("cos_sim",
        Similarity.cosRound6Udf(col("embedding"), col("__e_corpus")))
      .filter(col("cos_sim") >= threshold)
      .select(col("id").as("vec_id"), col("id_corpus").as("dup_of"),
        col("cos_sim"), col(tsCol))
  }
}
