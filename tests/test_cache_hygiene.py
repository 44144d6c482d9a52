"""Storage hygiene: composing operators must not leak executor storage.

ADVICE r3: the dedup/triangle operators cached intermediates without
unpersist, so a library user running several queries on one session
accumulated InMemoryRelation blocks that only a harness-level
clearCache() would free. r4 removed those caches outright — the band
self-joins reuse their identical Exchanges (ReusedExchange) instead of
pinning storage, and A/B at sf0.1 measured every cache as a net loss.
This test is the regression gate: run the formerly-caching queries
back-to-back on one session, fully materialized, WITHOUT any
clearCache(), and assert no new persistent RDDs or cached tables
remain. (Queries that use localCheckpoint for lineage truncation are
excluded — checkpoint blocks are freed by the ContextCleaner on GC,
which is asynchronous by design.)
"""

from __future__ import annotations

from supabase_etl_spark.queries import load_all

SF = "/root/testdata/sf0.001"

# every query that cached an intermediate before r4 and has NOT since
# moved to the sanctioned localCheckpoint class.
# dedup_incremental_ingest left this list in r11: its shared shingle /
# band / incoming frames are now localCheckpoint(eager=False)-pinned
# (the r10 VERDICT task-2 fix for its 48-scan plan), and checkpoint
# blocks are ContextCleaner-freed on GC, per the exclusion above; the
# registry-wide tests/test_storage_hygiene_registry.py still guards it
# against persist()/cache() residue.
FORMERLY_CACHING = [
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_prefix",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "graph_triangle_count",
]


def _persistent_rdd_ids(spark) -> set[int]:
    it = spark.sparkContext._jsc.getPersistentRDDs().keySet().iterator()
    ids = set()
    while it.hasNext():
        ids.add(it.next())
    return ids


def test_composed_queries_leave_no_storage_behind(spark):
    qs = load_all()
    before = _persistent_rdd_ids(spark)
    for name in FORMERLY_CACHING:
        assert name in qs, f"registry lost {name}"
        qs[name].fn(spark, SF).write.format("noop").mode("overwrite").save()
    leaked = _persistent_rdd_ids(spark) - before
    assert not leaked, f"queries left persistent RDDs behind: {leaked}"
    cached_tables = [
        t.name for t in spark.catalog.listTables() if spark.catalog.isCached(t.name)
    ]
    assert not cached_tables, f"queries left cached tables behind: {cached_tables}"
