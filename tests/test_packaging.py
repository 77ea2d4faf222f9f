"""Cluster-mode packaging (VERDICT r08 #4): the executor-shippable zip.

The Python DataSource and the stateful processors are unpickled BY
REFERENCE on executors, so a non-local cluster must be able to import
``flink_wordcount_spark`` without the repo on a shared filesystem. These
tests pin the whole remedy: the zip builds, a subprocess with the repo
STRIPPED from ``sys.path`` imports the package from the zip alone (including
the words.txt resource, which must load via importlib.resources to survive
zipimport), the generated sentences are bit-identical to the in-process
path, and ``ship_package`` routes the zip through ``addPyFile`` exactly when
the master is non-local.
"""

from __future__ import annotations

import subprocess
import sys
import zipfile
from pathlib import Path
from types import SimpleNamespace
from unittest.mock import MagicMock

from flink_wordcount_spark.packaging import package_zip, ship_package

REPO_ROOT = str(Path(__file__).resolve().parents[1])


def test_zip_contains_sources_and_resources(tmp_path):
    z = package_zip(str(tmp_path))
    names = set(zipfile.ZipFile(z).namelist())
    assert "flink_wordcount_spark/streaming/sentences.py" in names
    assert "flink_wordcount_spark/sources/sentence_source.py" in names
    assert "flink_wordcount_spark/resources/words.txt" in names
    assert not any("__pycache__" in n for n in names)


def test_zip_reused_until_member_changes(tmp_path):
    z1 = package_zip(str(tmp_path))
    mtime1 = Path(z1).stat().st_mtime_ns
    z2 = package_zip(str(tmp_path))
    assert z2 == z1 and Path(z2).stat().st_mtime_ns == mtime1  # reused
    # a touched member forces a rebuild
    import os
    import time

    member = Path(REPO_ROOT) / "flink_wordcount_spark" / "packaging.py"
    os.utime(member, (time.time() + 2, time.time() + 2))
    try:
        package_zip(str(tmp_path))
        assert Path(z1).stat().st_mtime_ns > mtime1  # rebuilt
    finally:
        os.utime(member)  # restore a sane mtime


def test_executor_import_path_from_zip_alone(tmp_path):
    """Simulate the executor: repo stripped from sys.path, zip prepended —
    the package must import and generate bit-identical sentences (which
    also exercises the zipimport-safe words.txt resource read)."""
    z = package_zip(str(tmp_path))
    child = f"""
import sys
sys.path = [p for p in sys.path if p != {REPO_ROOT!r} and p != '']
sys.path.insert(0, {z!r})
import flink_wordcount_spark.streaming.sentences as sn
assert sn.__file__.startswith({z!r}), sn.__file__
words = sn.wordlist()
print(len(words))
print(words[0], words[-1])
import numpy as np
out = sn.sentences_for_ids(np.arange(5, dtype=np.uint64), 4, 42, 0, np.array(words, dtype=object))
print("|".join(out))
"""
    proc = subprocess.run(
        [sys.executable, "-c", child],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # never implicitly importable from the repo cwd
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    n_words, ends, sents = proc.stdout.strip().splitlines()
    # same values the in-process (repo-on-sys.path) implementation produces
    import numpy as np

    from flink_wordcount_spark.streaming.sentences import (
        sentences_for_ids,
        wordlist,
    )

    words = wordlist()
    assert int(n_words) == len(words)
    assert ends == f"{words[0]} {words[-1]}"
    expect = sentences_for_ids(
        np.arange(5, dtype=np.uint64), 4, 42, 0, np.array(words, dtype=object)
    )
    assert sents == "|".join(expect)


def _fake_spark(master: str):
    sc = SimpleNamespace(addPyFile=MagicMock())
    conf = MagicMock()
    conf.get.side_effect = lambda k, d=None: master if k == "spark.master" else d
    return SimpleNamespace(sparkContext=sc, conf=conf)


def test_ship_package_skips_local_master():
    s = _fake_spark("local[32]")
    assert ship_package(s) is None
    s.sparkContext.addPyFile.assert_not_called()


def test_ship_package_ships_for_cluster_master():
    for master in ("spark://host:7077", "yarn", "k8s://https://host"):
        s = _fake_spark(master)
        z = ship_package(s)
        assert z is not None and z.endswith(".zip")
        s.sparkContext.addPyFile.assert_called_once_with(z)


def test_ship_package_force_overrides_local():
    s = _fake_spark("local[4]")
    z = ship_package(s, force=True)
    assert z is not None
    s.sparkContext.addPyFile.assert_called_once_with(z)


def test_zip_rebuilt_when_member_set_changes(tmp_path, monkeypatch):
    """mtime alone cannot see a deleted/renamed module (every remaining
    member is still older than the zip) — the embedded manifest must force
    a rebuild (review r09)."""
    import flink_wordcount_spark.packaging as pkg

    z1 = package_zip(str(tmp_path))
    n_before = len(zipfile.ZipFile(z1).namelist())
    real_members = pkg._members()
    monkeypatch.setattr(pkg, "_members", lambda: real_members[:-1])
    z2 = package_zip(str(tmp_path))
    assert len(zipfile.ZipFile(z2).namelist()) == n_before - 1


def test_torn_zip_is_rebuilt_not_served(tmp_path):
    """A crashed writer's torn artifact at the final path must trigger a
    rebuild, not a BadZipFile on every executor."""
    z = package_zip(str(tmp_path))
    Path(z).write_bytes(b"PK\x03\x04 torn")
    import os
    import time

    os.utime(z, (time.time() + 5, time.time() + 5))  # newer than members
    z2 = package_zip(str(tmp_path))
    assert zipfile.ZipFile(z2).testzip() is None  # valid again
