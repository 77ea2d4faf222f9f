"""Cluster-mode packaging: ship this package to executors as a zip.

VERDICT r08 "What's missing" #3: the Python DataSource
(``sources/sentence_source.py``) re-inserts the repo's absolute path into
``sys.path`` on the executor, which only resolves when workers share the
driver's filesystem layout (local mode, or a same-path mount). On a real
cluster the package must travel with the job — the PySpark analog of the
reference's fat-jar submit (run_job.sh:70-74). This module builds that
artifact and registers it:

- ``package_zip()``: zip ``flink_wordcount_spark/`` (sources + the words.txt
  resource) into a temp file, importable via zipimport. Rebuilt only when a
  member is newer than the existing zip.
- ``ship_package(spark)``: ``sparkContext.addPyFile(zip)`` — workers get the
  zip on their ``sys.path`` for all subsequently-launched tasks, so
  unpickled readers/UDFs import the package without any shared filesystem.
  A no-op on ``local[*]`` masters (workers share the driver's process tree
  and filesystem) unless ``force=True``.

``session.get_spark`` calls ``ship_package`` after building a session, so a
non-local master gets the artifact automatically; a driver-handed session
can call it explicitly.

Zip-safety note: everything the executor-side paths touch must load through
zipimport-safe APIs — the wordlist resource reads via importlib.resources
(``streaming/sentences.py``), not a bare ``Path(__file__)``; tested by
``tests/test_packaging.py`` importing the package from the zip with the repo
stripped from ``sys.path``.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import zipfile
from pathlib import Path

_PKG_DIR = Path(__file__).resolve().parent
_PKG_NAME = _PKG_DIR.name


def _members() -> list[Path]:
    """Package files worth shipping: python sources + data resources."""
    keep_suffixes = {".py", ".txt"}
    return sorted(
        p
        for p in _PKG_DIR.rglob("*")
        if p.is_file() and p.suffix in keep_suffixes and "__pycache__" not in p.parts
    )


def _manifest(members: list[Path]) -> bytes:
    """Sorted ``name<TAB>sha256`` lines — stored as the zip comment so reuse
    is CONTENT-verified, not name/mtime-trusted.  A names-only manifest plus
    an mtime check let a different checkout with identical member names but
    older mtimes (mtime-preserving rsync/archive extraction) silently ship
    the other checkout's code (ADVICE r09); digesting every member closes
    that — any byte change anywhere invalidates the artifact."""
    lines = []
    for m in members:
        digest = hashlib.sha256(m.read_bytes()).hexdigest()
        lines.append(f"{m.relative_to(_PKG_DIR)}\t{digest}")
    return "\n".join(lines).encode("utf-8")


def _default_dest_dir() -> str:
    """Per-uid build dir (ADVICE r09): a fixed shared /tmp path makes
    ``os.replace`` over ANOTHER user's artifact raise EPERM under the
    sticky bit, failing session creation on multi-user hosts.  Mirrors
    the ``_protobuf_shim_dir`` pattern in ``streaming/tws.py``.

    The predictable name is also a squat target (review r10):
    ``mkdir(exist_ok=True)`` accepts a PRE-EXISTING directory without
    applying the mode, so a directory planted by another user would let
    them swap the zip between digest verification and the executor fetch.
    Ownership and symlinkness are therefore verified after the mkdir, and
    the mode is re-applied; a squatted path fails loudly instead of
    shipping attacker-writable artifacts."""
    d = Path(tempfile.gettempdir()) / f"fws_pyfiles_{os.getuid()}"
    d.mkdir(mode=0o700, exist_ok=True)
    import stat as _stat

    # Verify AND chmod through one fd (ADVICE r10): lstat-then-chmod left a
    # TOCTOU window where the dir could be swapped for a symlink between
    # the two calls and os.chmod (which follows symlinks) would hit an
    # attacker-chosen target.  O_NOFOLLOW|O_DIRECTORY refuses a symlink at
    # open, and fstat/fchmod on the held fd cannot be redirected.
    fd = os.open(d, os.O_RDONLY | os.O_DIRECTORY | os.O_NOFOLLOW)
    try:
        st = os.fstat(fd)
        if not _stat.S_ISDIR(st.st_mode) or st.st_uid != os.getuid():
            raise RuntimeError(
                f"refusing unsafe package build dir {d}: not a directory "
                "owned by this uid (symlink/squat?)"
            )
        os.fchmod(fd, 0o700)  # enforce even when the dir pre-existed
    finally:
        os.close(fd)
    return str(d)


def package_zip(dest_dir: str | None = None) -> str:
    """Build (or reuse) the executor-shippable zip; returns its path.

    The zip stores members under ``flink_wordcount_spark/...`` so the zip
    root itself is the importable ``sys.path`` entry. Reuse requires the
    embedded manifest (member names + sha256 content digests) to match the
    current member list exactly, so edits, renames, deletions — and a
    different checkout's artifact at the same path — all invalidate it.
    """
    dest_dir = dest_dir or _default_dest_dir()
    out = Path(dest_dir) / f"{_PKG_NAME}-pyfiles.zip"
    members = _members()
    manifest = _manifest(members)
    if out.exists():
        try:
            with zipfile.ZipFile(out) as zf:
                if zf.comment == manifest:
                    return str(out)
        except zipfile.BadZipFile:
            pass  # torn artifact from a crashed writer: rebuild
    # unique tmp name per writer: a FIXED .tmp path lets two concurrent
    # sessions interleave writes into one inode and publish a torn zip
    # (review r09); mkstemp in the same dir keeps os.replace atomic
    fd, tmp = tempfile.mkstemp(suffix=".zip.tmp", dir=dest_dir)
    try:
        with os.fdopen(fd, "wb") as fh, zipfile.ZipFile(
            fh, "w", zipfile.ZIP_DEFLATED
        ) as zf:
            for m in members:
                zf.write(m, arcname=str(Path(_PKG_NAME) / m.relative_to(_PKG_DIR)))
            zf.comment = manifest
        os.replace(tmp, out)  # atomic publish
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
    return str(out)


def ship_package(spark, force: bool = False) -> str | None:
    """addPyFile the package zip for non-local masters; returns the path
    shipped, or None when skipped (local mode, workers see the repo).

    ``local-cluster[n,c,m]`` counts as NON-local: its executors are real
    separate JVMs whose Python workers inherit the driver's environment,
    not its in-process ``sys.path`` — the zip is the only carrier there
    (pinned by tests/test_packaging.py's local-cluster round-trip)."""
    try:
        master = spark.conf.get("spark.master", "") or ""
    except Exception:
        master = ""
    # "local" / "local[n]" / "local[*]" are in-process; "local-cluster[...]"
    # never matches the "local[" prefix, so no extra exclusion is needed
    in_process_local = master == "local" or master.startswith("local[")
    if in_process_local and not force:
        return None
    z = package_zip()
    spark.sparkContext.addPyFile(z)
    return z
