"""Fingerprinted, atomically-published /tmp fixture caches.

Several driver-gate queries exercise sinks/sources end-to-end by first
building a derived fixture (paged-JSON "API" pages, CDC/merge lakes) that
is a pure function of the driver's testdata parquet. The driver regenerates
testdata between rounds with changed types/distributions, so a cache keyed
only by the sf-dir basename can serve a stale fixture and diverge from an
oracle recomputed over the fresh tables. Here the cache directory is keyed
by a fingerprint of the source parquet files (size + mtime_ns): a testdata
regeneration changes the key, old caches are simply abandoned, and a warm
cache is provably the one built from the current inputs.

Builds land in a pid-tagged scratch sibling and are renamed into place
(`publish`), so a concurrent session never observes a half-built fixture
and the loser of a publish race discards its copy. The engine's snapshot
lakes store only root-relative paths (``sources/io.py`` `_CURRENT`
pointer + manifest file names), so the rename is transparent to readers.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile


def source_fingerprint(sf_dir: str, *tables: str) -> str:
    """Stable short key over the identity of the source parquet files."""
    h = hashlib.sha256()
    for t in tables:
        st = os.stat(os.path.join(sf_dir, f"{t}.parquet"))
        h.update(f"{t}:{st.st_size}:{st.st_mtime_ns};".encode())
    return h.hexdigest()[:12]


def fixture_root(kind: str, sf_dir: str, *tables: str) -> str:
    """Cache directory for a fixture derived from `tables` under `sf_dir`."""
    tag = os.path.basename(sf_dir.rstrip("/"))
    fp = source_fingerprint(sf_dir, *tables)
    return os.path.join(tempfile.gettempdir(), kind, f"{tag}-{fp}")


def building_dir(root: str) -> str:
    """Scratch sibling for an in-progress build of `root`."""
    scratch = f"{root}.building-{os.getpid()}"
    shutil.rmtree(scratch, ignore_errors=True)
    return scratch


def publish(scratch: str, root: str) -> None:
    """Atomically move a finished build into place; drop it if another
    process won the race (its build is byte-equivalent by construction)."""
    os.makedirs(os.path.dirname(root), exist_ok=True)
    try:
        os.rename(scratch, root)
    except OSError:
        shutil.rmtree(scratch, ignore_errors=True)
