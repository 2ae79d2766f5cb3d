"""Kill/resume byte-identity: a run interrupted after round k and
resumed by a FRESH engine object must produce tables identical to an
uninterrupted run (north rule: resumable from checkpoint, byte-identical)."""

from __future__ import annotations

import hashlib

import pytest

from pyspider_spark.loop import CrawlEngine
from pyspider_spark.schemas import FRONTIER, IMAGES, ITEMS, METRICS, SEEN
from pyspider_spark.synth import GraphSpec

SPEC = GraphSpec(n_hosts=2, chains_per_host=2, seed_tag="resume1")
ROUNDS = 4


def digest(eng, name, schema) -> str:
    df = eng.store.read_or_empty(name, schema)
    rows = sorted(
        repr(sorted(r.asDict().items(), key=lambda kv: kv[0])) for r in df.collect()
    )
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()


TABLES = [("frontier", FRONTIER), ("seen", SEEN), ("items", ITEMS),
          ("images", IMAGES), ("metrics", METRICS)]


@pytest.fixture(scope="module")
def runs(spark, tmp_path_factory):
    wd_a = str(tmp_path_factory.mktemp("uninterrupted"))
    eng_a = CrawlEngine(spark, wd_a, SPEC, n_seen_partitions=4)
    eng_a.run(max_rounds=ROUNDS)

    wd_b = str(tmp_path_factory.mktemp("interrupted"))
    CrawlEngine(spark, wd_b, SPEC, n_seen_partitions=4).run(max_rounds=2)
    # fresh engine object = process restart; resume must roll forward
    eng_b = CrawlEngine(spark, wd_b, SPEC, n_seen_partitions=4)
    eng_b.run(max_rounds=ROUNDS, resume=True)
    return eng_a, eng_b


@pytest.mark.parametrize("table,schema", TABLES)
def test_resumed_tables_byte_identical(runs, table, schema):
    eng_a, eng_b = runs
    assert digest(eng_a, table, schema) == digest(eng_b, table, schema), table


def test_resume_discards_half_written_round(spark, tmp_path_factory):
    """Appends landed after the last checkpoint (a crashed half-round)
    must be invisible after resume and not perturb the final state."""
    wd = str(tmp_path_factory.mktemp("halfround"))
    eng = CrawlEngine(spark, wd, SPEC, n_seen_partitions=4)
    eng.run(max_rounds=2)
    # simulate a crash mid-round-2: an items append without a checkpoint
    junk = eng.store.read_or_empty("items", ITEMS).limit(3)
    eng.store.append("items", junk)

    eng2 = CrawlEngine(spark, wd, SPEC, n_seen_partitions=4)
    eng2.run(max_rounds=ROUNDS, resume=True)

    wd_ref = str(tmp_path_factory.mktemp("halfround_ref"))
    ref = CrawlEngine(spark, wd_ref, SPEC, n_seen_partitions=4)
    ref.run(max_rounds=ROUNDS)
    for table, schema in TABLES:
        assert digest(eng2, table, schema) == digest(ref, table, schema), table


def test_resume_prunes_crashed_dirs_for_streaming(spark, tmp_path_factory):
    """A file-source stream tails data dirs directly, so a crashed
    round's dirs must be physically gone after resume — otherwise the
    replayed round's identical re-appends show up twice downstream."""
    from pyspider_spark import streaming

    wd = str(tmp_path_factory.mktemp("streamcrash"))
    eng = CrawlEngine(spark, wd, SPEC, n_seen_partitions=4)
    eng.run(max_rounds=2)
    # crash mid-round-2: an items append that never reaches a checkpoint
    junk = eng.store.read_or_empty("items", ITEMS).limit(3)
    eng.store.append("items", junk)

    eng2 = CrawlEngine(spark, wd, SPEC, n_seen_partitions=4)
    eng2.run(max_rounds=ROUNDS, resume=True)

    batch_n = eng2.store.read_or_empty("items", ITEMS).count()
    stream = streaming.tail_table(spark, wd, "items")
    streaming.run_once_to_memory(
        stream.groupBy().count().withColumnRenamed("count", "n"), "items_crash_t"
    )
    stream_n = spark.sql("SELECT n FROM items_crash_t").collect()[0].n
    assert stream_n == batch_n


def test_resume_on_fresh_dir_bootstraps(spark, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("fresh"))
    eng = CrawlEngine(spark, wd, SPEC, n_seen_partitions=4)
    stats = eng.run(max_rounds=2, resume=True)
    assert len(stats) == 2
    assert stats[0].popped > 0
