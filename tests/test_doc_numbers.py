"""Docs must quote drill numbers FROM the artifact, never from memory.

ADVICE r11 (COVERAGE.md:22): SCALE.md and COVERAGE.md quoted 3.36 s for
the executor-kill drill while the committed artifact said 6.6 — the docs
froze whichever single run they were written against.  This guard parses
every doc line that quotes a kill-to-next-commit figure and asserts it
equals the artifact's published MEDIAN, so a re-run that shifts the
artifact fails the suite until the prose is re-synced.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]

#: a kill-to-next-commit quote: "kill-to-next-commit median 6.6 s" or
#: "6.6 s from kill to the next commit" (prose may wrap mid-phrase)
_QUOTE = re.compile(
    r"kill[- ]to[- ]next[- ]commit[^0-9]{0,40}(\d+(?:\.\d+)?)\s*s"
    r"|(\d+(?:\.\d+)?)\s*s\s*from\s*\n?\s*kill to the next commit",
    re.IGNORECASE,
)


def test_kill_drill_quotes_match_artifact():
    artifact = json.loads((REPO_ROOT / "EXECUTOR_KILL_r12.json").read_text())
    median = artifact["kill_to_next_commit_sec_median"]
    assert artifact["n_runs"] >= 3, "published number must be a real median"
    quoted = []
    for doc in ("SCALE.md", "COVERAGE.md"):
        text = (REPO_ROOT / doc).read_text()
        for m in _QUOTE.finditer(text):
            val = float(m.group(1) or m.group(2))
            quoted.append((doc, val))
    assert quoted, "docs no longer quote the drill — update this guard"
    offenders = [(d, v) for d, v in quoted if v != median]
    assert not offenders, (
        f"doc-quoted kill-to-next-commit seconds {offenders} != artifact "
        f"median {median} (EXECUTOR_KILL_r12.json) — re-sync the prose"
    )
