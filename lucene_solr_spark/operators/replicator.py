"""Index replication — ``lucene/replicator`` analog.

The reference's protocol (``lucene/replicator/src/java/org/apache/lucene/
replicator/Replicator.java``, ``IndexRevision.java``, ``ReplicationClient.
java``): a *revision* is the immutable file set of one commit point,
published with per-file name+size metadata; a replica syncs by copying only
the files it does not already hold and switches atomically by installing
the revision's segments file last; files no longer referenced are deleted
after the switch.

The same protocol over our storage model: an index directory is a set of
immutable parquet part-files (postings / docs / terms / stats + the build
ledger).  ``publish_revision`` snapshots the current file set into
``revisions/rev-<n>.json``; ``replicate`` copies the missing files, installs
the revision manifest last (the commit switch), then garbage-collects
unreferenced files.  Part-file names are write-unique (Spark task UUIDs), so
name+size identity is sound exactly as in the reference (Lucene file names
are segment-generation-unique).

Scale note: locally this moves files with shutil; on a cluster the same
manifest diff drives an object-store server-side copy — the protocol (diff
by name+size, manifest-last commit, post-switch GC) is storage-agnostic and
never reads posting bytes, so replication cost is O(new segment bytes), not
O(index bytes) — exactly the reference's incremental-revision property.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass

_SUBDIRS = ("postings", "docs", "terms", "stats", "ledger")


def _rev_dir(path: str) -> str:
    return os.path.join(path, "revisions")


def _walk_files(path: str) -> dict:
    """relpath -> size for every data file of the index at `path`."""
    out = {}
    for sub in _SUBDIRS:
        root = os.path.join(path, sub)
        if not os.path.isdir(root):
            continue
        for dirpath, _, files in os.walk(root):
            for f in files:
                if f.startswith(".") or f.endswith(".crc") or f == "_SUCCESS":
                    # keep _SUCCESS markers out of the manifest; they are
                    # re-created on install
                    continue
                full = os.path.join(dirpath, f)
                out[os.path.relpath(full, path)] = os.path.getsize(full)
    return out


@dataclass
class Revision:
    version: int
    files: dict  # relpath -> size

    @property
    def total_bytes(self) -> int:
        return sum(self.files.values())


def publish_revision(path: str) -> Revision:
    """Snapshot the index's current file set as the next revision
    (Replicator.publish — the old revision stays until a replica no longer
    needs it; we keep all manifests, they are tiny)."""
    os.makedirs(_rev_dir(path), exist_ok=True)
    version = latest_revision_version(path) + 1
    rev = Revision(version=version, files=_walk_files(path))
    tmp = os.path.join(_rev_dir(path), f".rev-{version}.json.tmp")
    with open(tmp, "w") as fh:
        json.dump({"version": version, "files": rev.files}, fh)
    os.replace(tmp, os.path.join(_rev_dir(path), f"rev-{version}.json"))
    return rev


def latest_revision_version(path: str) -> int:
    rd = _rev_dir(path)
    if not os.path.isdir(rd):
        return 0
    versions = [
        int(f[4:-5]) for f in os.listdir(rd) if f.startswith("rev-") and f.endswith(".json")
    ]
    return max(versions, default=0)


def read_revision(path: str, version: int | None = None) -> Revision | None:
    version = version or latest_revision_version(path)
    if version == 0:
        return None
    with open(os.path.join(_rev_dir(path), f"rev-{version}.json")) as fh:
        d = json.load(fh)
    return Revision(version=d["version"], files=d["files"])


def replicate(src: str, dst: str) -> dict:
    """One ReplicationClient.updateNow() cycle: diff the replica against the
    source's latest revision, copy only missing/changed files, install the
    manifest last (atomic switch), then delete unreferenced files.

    Returns {"version", "copied", "skipped", "deleted", "bytes_copied"}.
    """
    rev = read_revision(src)
    if rev is None:
        raise FileNotFoundError(f"no published revision at {src}")
    if latest_revision_version(dst) == rev.version:
        return {"version": rev.version, "copied": 0, "skipped": len(rev.files), "deleted": 0, "bytes_copied": 0}
    have = _walk_files(dst)
    copied = skipped = bytes_copied = 0
    for rel, size in rev.files.items():
        if have.get(rel) == size:
            skipped += 1
            continue
        s, d = os.path.join(src, rel), os.path.join(dst, rel)
        os.makedirs(os.path.dirname(d), exist_ok=True)
        shutil.copyfile(s, d)
        copied += 1
        bytes_copied += size
    # re-create _SUCCESS markers so spark.read treats the dirs as committed
    for sub in _SUBDIRS:
        sdir = os.path.join(dst, sub)
        if os.path.isdir(sdir):
            open(os.path.join(sdir, "_SUCCESS"), "a").close()
    # the commit switch: manifest goes in only after every file landed
    os.makedirs(_rev_dir(dst), exist_ok=True)
    shutil.copyfile(
        os.path.join(_rev_dir(src), f"rev-{rev.version}.json"),
        os.path.join(_rev_dir(dst), f"rev-{rev.version}.json"),
    )
    # post-switch GC of files the new revision no longer references
    deleted = 0
    for rel in set(have) - set(rev.files):
        os.remove(os.path.join(dst, rel))
        deleted += 1
    return {
        "version": rev.version,
        "copied": copied,
        "skipped": skipped,
        "deleted": deleted,
        "bytes_copied": bytes_copied,
    }
