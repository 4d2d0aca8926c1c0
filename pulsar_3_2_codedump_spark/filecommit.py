"""Object-store manifest commit: conditional-put CAS, no lock server (§4).

The local engine serializes manifest read-modify-write with an exclusive
flock (``topic._topic_write_lock``) — the single-owning-broker analogue
(PersistentTopic's per-partition publish path serializes through the owner;
ManagedLedgerImpl.java uses the ZK/metadata-store version CAS for ledger
metadata updates, ``Stat.version`` compare-and-set). On object storage there
is no flock; the industry-standard replacement is a **versioned commit
chain**: the manifest for version N+1 is written with *put-if-absent*
(S3 ``If-None-Match: *`` conditional PUT / GCS ``x-goods-if-generation-match:
0`` / ABFS create-if-not-exists). Exactly one writer wins the name; losers
re-read the new head and retry their mutation. The version number IS the
ETag — this is the same protocol Delta Lake's transaction log and Iceberg's
metadata pointer use, and it is lost-update-proof WITHOUT any lock:

  read():   head = max N with manifest.v{N}.json present
  commit(): create manifest.v{head+1}.json with O_EXCL — atomic claim;
            EEXIST ⇒ somebody else committed first ⇒ CasConflict ⇒ retry

``os.open(..., O_CREAT|O_EXCL)`` is the local filesystem's put-if-absent —
byte-for-byte the same protocol shape, so the retry logic tested here runs
unchanged against a real store with the open() swapped for a conditional PUT.

Readers never coordinate: they read the highest complete version (each file
is written tmp + os.replace, so a listed version is always complete).
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid

_VER_RE = re.compile(r"^manifest\.v(\d+)\.json$")


class CasConflict(Exception):
    """Another writer committed the version this writer targeted."""


def read_head(commit_dir: str) -> tuple[dict | None, int]:
    """(manifest, version) at the chain head; (None, 0) for an empty chain."""
    try:
        names = os.listdir(commit_dir)
    except FileNotFoundError:
        return None, 0
    versions = [int(m.group(1)) for n in names if (m := _VER_RE.match(n))]
    if not versions:
        return None, 0
    head = max(versions)
    with open(os.path.join(commit_dir, f"manifest.v{head}.json")) as f:
        return json.load(f), head


def try_commit(commit_dir: str, manifest: dict, expected_version: int) -> int:
    """Conditional put of version ``expected_version + 1``.

    Returns the new version on success; raises CasConflict if that version
    already exists (= the head moved since the caller's read).

    The claim must be atomic WITH the content: an object PUT is
    all-or-nothing, so a listed version is always complete. Locally that
    means staging the bytes in a tmp file first and publishing them with
    ``os.link`` — the hardlink either creates the target name pointing at
    the complete content or fails with EEXIST; a concurrent ``read_head``
    can never observe a claimed-but-empty head."""
    os.makedirs(commit_dir, exist_ok=True)
    target = os.path.join(commit_dir, f"manifest.v{expected_version + 1}.json")
    tmp = os.path.join(commit_dir, f".tmp.{uuid.uuid4().hex}.json")
    data = json.dumps(manifest, indent=1, sort_keys=True).encode()
    fd = os.open(tmp, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    try:
        os.write(fd, data)
        os.fsync(fd)
    finally:
        os.close(fd)
    try:
        os.link(tmp, target)
    except FileExistsError:
        raise CasConflict(
            f"version {expected_version + 1} already committed in {commit_dir}"
        ) from None
    finally:
        os.remove(tmp)
    return expected_version + 1


def commit_with_retry(
    commit_dir: str, mutate, max_retries: int = 64, backoff_s: float = 0.002
) -> tuple[dict, int]:
    """Read-mutate-commit loop: ``mutate(manifest | None) -> manifest``.

    On CasConflict the head is re-read and ``mutate`` re-applied to the NEW
    head — the loser's change is replayed on top of the winner's, which is
    what makes lost updates impossible. Returns (manifest, version)."""
    for attempt in range(max_retries):
        head, version = read_head(commit_dir)
        updated = mutate(json.loads(json.dumps(head)) if head is not None else None)
        try:
            return updated, try_commit(commit_dir, updated, version)
        except CasConflict:
            # exponential-ish jittered backoff: contention on a hot topic's
            # manifest is writer-count-bounded, not data-bounded
            time.sleep(backoff_s * (1 + attempt) * (0.5 + (uuid.uuid4().int % 100) / 100))
    raise CasConflict(f"gave up after {max_retries} CAS retries in {commit_dir}")


def prune(commit_dir: str, keep_last: int = 10) -> int:
    """GC old chain versions (readers only need the head; a bounded tail
    covers in-flight readers — Delta's log-retention analogue). Returns the
    number of files removed."""
    _, head = read_head(commit_dir)
    removed = 0
    for n in os.listdir(commit_dir):
        m = _VER_RE.match(n)
        if m and int(m.group(1)) <= head - keep_last:
            try:
                os.remove(os.path.join(commit_dir, n))
                removed += 1
            except FileNotFoundError:
                pass
    return removed
