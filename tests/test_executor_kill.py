"""Hard-kill an executor JVM mid-stream and verify exactly-once recovery.

VERDICT r10 #3 (the last reference behavior without a faithful twin): the
reference's failure experiment is ``kill -9`` of a LIVE TaskManager while
the job runs (kill_worker.sh:8-18).  The drill itself lives in
``flink_wordcount_spark.streaming.killdrill`` (full setup documented
there); this gate runs it ONCE and asserts the exactly-once contract.

Publication policy (VERDICT r11 #3): the recovery SECONDS are noisy
(3.3-7.4 s across committed single runs), so this test deliberately does
NOT write the round artifact — quoting whichever single run last touched
the file is how the r11 docs drifted to the best of four measurements.
The quoted number comes from ``scripts/run_executor_kill.py``, which runs
the drill N >= 3 times in one session and publishes the MEDIAN (+ the
full run list) to ``EXECUTOR_KILL_r12.json``.
"""

from __future__ import annotations

from flink_wordcount_spark.streaming.killdrill import run_drill


def test_executor_hard_kill_exactly_once(tmp_path):
    result = run_drill(str(tmp_path))
    assert result["exactly_once_ok"] is True
    assert result["kill_to_next_commit_sec"] < 120
