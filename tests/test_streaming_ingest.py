"""Incremental KG ingestion (streaming/ingest.py): new page files →
micro-batch extract→link→validate→append, exactly-once across reruns.

The batch pipeline is the oracle: the union of all incremental batches
must emit exactly the validated candidate-triple SET the batch stages
produce on the full input (the incremental sink may hold one copy per
batch for triples extracted in several drops — the consolidation job
dedups — so comparison is on sets)."""

from pyspark.sql import functions as F

from shacl_rust_spark.pipeline import assemble, emit, extract, link, pages
from shacl_rust_spark.streaming import ingest

SF = "/root/testdata/sf0.001"


def _expected_triples(spark, pg):
    """The batch-path answer for a pages frame: validated candidate
    (s, p, o) set, before canonicalization (which the incremental
    path deliberately defers to the consolidation job)."""
    mentions = extract.detect_mentions(extract.extract_text(pg))
    cand = (
        assemble.assemble_triples(link.link_mentions(
            mentions, pages.entity_dict(spark, SF)))
        .select("s", "p", "o", "o_is_iri")
        .dropDuplicates(["s", "p", "o"])
        .localCheckpoint(eager=True)
    )
    valid, _ = emit.validate_candidates(
        spark, cand, pages.entity_dict(spark, SF))
    return {(r.s, r.p, r.o) for r in valid.select("s", "p", "o").collect()}


def test_incremental_ingest_exactly_once(spark, tmp_path):
    pg = pages.pages(spark, SF).localCheckpoint(eager=True)
    half = F.abs(F.hash("url")) % 2
    drops = str(tmp_path / "drops")
    out = str(tmp_path / "kg_inc")

    # drop 1: half the crawl arrives
    pg.where(half == 0).write.parquet(drops)
    ingest.ingest_pages_stream(spark, drops, out, SF)
    got1 = {(r.s, r.p, r.o)
            for r in ingest.read_ingested(spark, out).collect()}
    assert got1 == _expected_triples(spark, pg.where(half == 0))
    m1 = ingest.read_manifests(out)
    assert len(m1) == 1 and m1[0]["triples"] == len(got1)
    assert m1[0]["violations"] > 0  # unlinkable surfaces exist by seed

    # drop 2: the rest arrives as NEW files in the same directory —
    # the checkpoint must route only these into the next batch
    pg.where(half == 1).write.mode("append").parquet(drops)
    ingest.ingest_pages_stream(spark, drops, out, SF)
    got2 = {(r.s, r.p, r.o)
            for r in ingest.read_ingested(spark, out).collect()}
    assert got2 == _expected_triples(spark, pg)
    m2 = ingest.read_manifests(out)
    assert [m["batch_id"] for m in m2] == [0, 1]

    # rerun with nothing new: exactly-once — no batch, no manifest, no
    # change to the sink
    ingest.ingest_pages_stream(spark, drops, out, SF)
    assert ingest.read_manifests(out) == m2
    assert {(r.s, r.p, r.o)
            for r in ingest.read_ingested(spark, out).collect()} == got2

    # per-batch lineage: batch_id is a partition column of the sink
    cols = ingest.read_ingested(spark, out).columns
    assert "batch_id" in cols


def test_batch_replay_is_idempotent(spark, tmp_path):
    """Crash-recovery contract: a batch replayed under the SAME
    batch_id (what Structured Streaming does when the driver dies
    after foreachBatch started but before the checkpoint commit)
    overwrites only its own directory and manifest — the sink and
    lineage end identical to a single clean run, even when the first
    attempt left a PARTIAL write behind."""
    import os

    out = str(tmp_path / "kg_replay")
    pg = pages.pages(spark, SF).limit(200).localCheckpoint(eager=True)
    edict = pages.entity_dict(spark, SF)

    m1 = ingest.process_pages_batch(pg, 0, edict, out)

    # simulate a torn first attempt for batch 1: partial parquet dir,
    # no manifest (the atomic rename never happened)
    partial = f"{out}/batches/batch_id=1"
    os.makedirs(partial, exist_ok=True)
    with open(f"{partial}/part-junk.parquet", "w") as f:
        f.write("torn write")
    assert [m["batch_id"] for m in ingest.read_manifests(out)] == [0]

    # replay batch 1 cleanly; then replay it AGAIN (double delivery)
    m2a = ingest.process_pages_batch(pg, 1, edict, out)
    m2b = ingest.process_pages_batch(pg, 1, edict, out)
    assert m2a["triples"] == m2b["triples"] == m1["triples"]
    assert not os.path.exists(f"{partial}/part-junk.parquet")  # torn file gone

    rows = ingest.read_ingested(spark, out)
    per_batch = {r.batch_id: r.n for r in
                 rows.groupBy("batch_id").agg(F.count("*").alias("n"))
                 .collect()}
    assert per_batch == {0: m1["triples"], 1: m1["triples"]}
    assert [m["batch_id"] for m in ingest.read_manifests(out)] == [0, 1]


def test_read_ingested_skips_uncommitted_batches(spark, tmp_path):
    """A torn batch directory (part files, no manifest) is INVISIBLE to
    readers until its replay commits (review finding: the read side
    must honor the manifest protocol, not just the write side)."""
    import os

    out = str(tmp_path / "kg_torn")
    pg = pages.pages(spark, SF).limit(150).localCheckpoint(eager=True)
    edict = pages.entity_dict(spark, SF)
    m0 = ingest.process_pages_batch(pg, 0, edict, out)

    # torn batch 1: directory exists, manifest never renamed in
    partial = f"{out}/batches/batch_id=1"
    os.makedirs(partial, exist_ok=True)
    with open(f"{partial}/part-junk.parquet", "w") as f:
        f.write("garbage that would break a naive directory read")

    rows = ingest.read_ingested(spark, out)
    assert {r.batch_id for r in rows.select("batch_id").distinct()
            .collect()} == {0}
    assert rows.count() == m0["triples"]

    # an empty sink (no manifests at all) reads as an empty frame
    assert ingest.read_ingested(spark, str(tmp_path / "nothing")).count() == 0
