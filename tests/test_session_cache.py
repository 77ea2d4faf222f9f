"""Session-lifetime correctness of the table cache and tune() memo.

Round-3 ADVICE: both were keyed on id(spark); a stopped session's id can be
reused by a brand-new session object, which would then inherit stale plans
and skip tuning. These tests pin the fixed keying (applicationId / weak set)
without paying a real JVM restart.
"""

import gc
from types import SimpleNamespace
from unittest.mock import MagicMock

from flink_wordcount_spark import io, session


class _FakeSession:
    """Weakref-able stand-in with the surface table()/tune() touch."""

    def __init__(self, app_id: str):
        self.sparkContext = SimpleNamespace(applicationId=app_id)
        self.conf = MagicMock()
        self.read = MagicMock()
        self.read.parquet.side_effect = lambda path: MagicMock(name=path)


def test_new_application_gets_fresh_reads():
    io._CACHE.clear()
    a = _FakeSession("app-a")
    df1 = io.table(a, "/tmp/sf", "orders")
    assert io.table(a, "/tmp/sf", "orders") is df1  # memoized within app
    # A NEW session (fresh applicationId) must not inherit app-a's plans,
    # even if CPython hands the new object the same id().
    b = _FakeSession("app-b")
    df2 = io.table(b, "/tmp/sf", "orders")
    assert df2 is not df1
    assert b.read.parquet.called


def test_cache_evicts_oldest_application():
    io._CACHE.clear()
    for i in range(io._CACHE_MAX_APPS + 2):
        io.table(_FakeSession(f"app-{i}"), "/tmp/sf", "orders")
    assert len(io._CACHE) <= io._CACHE_MAX_APPS
    assert f"app-{io._CACHE_MAX_APPS + 1}" in io._CACHE  # newest retained


def test_words_broadcast_keyed_and_bounded_like_io_cache():
    """r08: the vocabulary broadcast was the one remaining id()-keyed map —
    now applicationId-keyed and bounded like io._CACHE, so a new app never
    inherits a dead JVM's broadcast handle and dead apps' handles drop."""
    from flink_wordcount_spark.streaming import sentences as sn

    sn._WORDS_BC.clear()

    def fake(app_id: str):
        sc = SimpleNamespace(
            applicationId=app_id, broadcast=MagicMock(side_effect=lambda v: object())
        )
        return SimpleNamespace(sparkContext=sc)

    a = fake("app-a")
    h1 = sn._words_broadcast(a)
    assert sn._words_broadcast(a) is h1  # memoized within app
    assert sn._words_broadcast(fake("app-b")) is not h1  # fresh per app
    for i in range(sn._WORDS_BC_MAX_APPS + 2):
        sn._words_broadcast(fake(f"app-{i}"))
    assert len(sn._WORDS_BC) <= sn._WORDS_BC_MAX_APPS
    assert f"app-{sn._WORDS_BC_MAX_APPS + 1}" in sn._WORDS_BC
    sn._WORDS_BC.clear()


def test_words_broadcast_lru_and_unpersist_on_eviction():
    """ADVICE r08: eviction must approximate LRU (a hot app's live broadcast
    must not be the one dropped just because it was inserted first), and the
    evicted handle's JVM-side blocks must be released best-effort."""
    from flink_wordcount_spark.streaming import sentences as sn

    sn._WORDS_BC.clear()

    def fake(app_id: str):
        sc = SimpleNamespace(
            applicationId=app_id,
            broadcast=MagicMock(side_effect=lambda v: MagicMock(name=f"bc-{app_id}")),
        )
        return SimpleNamespace(sparkContext=sc)

    sessions = [fake(f"app-{i}") for i in range(sn._WORDS_BC_MAX_APPS)]
    handles = [sn._words_broadcast(s) for s in sessions]
    # app-0 is oldest by insertion — a HIT must refresh its recency...
    sn._words_broadcast(sessions[0])
    # ...so the next insertion over capacity evicts app-1, not app-0.
    sn._words_broadcast(fake("app-new"))
    assert "app-0" in sn._WORDS_BC
    assert "app-1" not in sn._WORDS_BC
    # and the evicted handle was released, the survivors untouched
    handles[1].unpersist.assert_called_once()
    handles[0].unpersist.assert_not_called()
    # a raising unpersist (dead JVM) must not break the cache path
    sn._WORDS_BC.clear()
    dead = MagicMock()
    dead.unpersist.side_effect = RuntimeError("JVM gone")
    sn._WORDS_BC["dead-app"] = dead
    for i in range(sn._WORDS_BC_MAX_APPS):
        sn._words_broadcast(fake(f"fill-{i}"))
    assert "dead-app" not in sn._WORDS_BC
    sn._WORDS_BC.clear()


def test_tune_memo_is_weak():
    s = _FakeSession("app-weak")
    session.tune(s)
    assert s in session._TUNED
    assert s.conf.set.called
    s.conf.set.reset_mock()
    session.tune(s)
    assert not s.conf.set.called  # idempotent while alive
    n_before = len(session._TUNED)
    del s
    gc.collect()
    assert len(session._TUNED) < n_before  # dead session can't alias a new one
