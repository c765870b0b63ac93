"""Index replication: the reference's replicator module re-expressed over
shared/copyable storage (replicator/LocalReplicator.java,
replicator/IndexRevision.java).

A REVISION is the committed manifest plus the exact file set it references
— postings/docs/points shard dirs and tombstone files. Two properties the
reference relies on hold here by construction:

* revision file sets are IMMUTABLE: shard ids are never reused (merges
  allocate fresh ids from next_shard_offset), so a file present in two
  revisions is byte-identical and a replica syncs by copying only file
  names it lacks (IndexRevision's per-file sync);
* the manifest is adopted LAST and atomically (os.replace), the replica
  equivalent of publishing segments_N after all segment files landed —
  a crash mid-pull leaves the replica on its previous revision.

Beyond single-host copy, `pull_revision` is the per-replica unit: on a
cluster, run one pull task per replica node against the shared store.
"""

from __future__ import annotations

import os
import shutil
from zlib import crc32

from .build import _atomic_write_json, load_manifest


def revision_files(index_dir: str) -> list[str]:
    """Relative paths of every file the committed manifest references."""
    manifest = load_manifest(index_dir)
    if not manifest or not manifest.get("committed"):
        raise ValueError("no committed revision to replicate")
    shard_ids = manifest.get("shard_ids") or list(range(manifest["num_shards"]))
    rels: list[str] = []
    for kind in ("postings", "docs", "points"):
        for s in shard_ids:
            d = os.path.join(index_dir, kind, f"shard={s}")
            if os.path.isdir(d):
                rels += [os.path.join(kind, f"shard={s}", f)
                         for f in sorted(os.listdir(d))]
    rels += [d["file"] for d in manifest.get("deletes") or []]
    return rels


def publish_revision(index_dir: str) -> dict:
    """Snapshot the current committed revision (IndexRevision role):
    generation, file list, sizes and checksums."""
    manifest = load_manifest(index_dir)
    files = {}
    for rel in revision_files(index_dir):
        p = os.path.join(index_dir, rel)
        with open(p, "rb") as f:
            data = f.read()
        files[rel] = {"size": len(data), "crc32": crc32(data) & 0xFFFFFFFF}
    return {"generation": manifest["generation"], "files": files,
            "manifest": manifest}


def pull_revision(src_index_dir: str, dst_index_dir: str,
                  verify: bool = True) -> dict:
    """Sync the replica at dst to src's committed revision. Copies only
    files the replica lacks (immutable revisions make name-presence a
    sufficient test; `verify` additionally checks size+crc of reused
    files), removes files the new revision no longer references, and
    adopts the manifest last. Returns {"copied": n, "removed": n,
    "generation": g}."""
    rev = publish_revision(src_index_dir)
    os.makedirs(dst_index_dir, exist_ok=True)
    have = set()
    cur = load_manifest(dst_index_dir)
    if cur and cur.get("committed"):
        if cur["generation"] == rev["generation"]:
            return {"copied": 0, "removed": 0, "generation": cur["generation"]}
        have = set(revision_files(dst_index_dir))

    copied = 0
    for rel, meta in rev["files"].items():
        dst = os.path.join(dst_index_dir, rel)
        if rel in have and os.path.exists(dst):
            if not verify:
                continue
            with open(dst, "rb") as f:
                data = f.read()
            if len(data) == meta["size"] and (crc32(data) & 0xFFFFFFFF) == meta["crc32"]:
                continue
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        tmp = dst + ".rep.tmp"
        shutil.copyfile(os.path.join(src_index_dir, rel), tmp)
        os.replace(tmp, dst)
        copied += 1

    # adopt the manifest LAST (the segments_N publish)
    _atomic_write_json(os.path.join(dst_index_dir, "manifest.json"),
                       rev["manifest"])

    # GC files the adopted revision no longer references
    removed = 0
    for rel in have - set(rev["files"]):
        p = os.path.join(dst_index_dir, rel)
        if os.path.exists(p):
            os.remove(p)
            removed += 1
        d = os.path.dirname(p)
        if os.path.isdir(d) and not os.listdir(d):
            os.rmdir(d)
    return {"copied": copied, "removed": removed,
            "generation": rev["generation"]}
