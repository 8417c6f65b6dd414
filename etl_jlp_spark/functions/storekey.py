"""Content-aware store keys for persisted per-corpus indexes (IVF
cells, BM25 postings).

A store keyed only on the corpus *path* goes silently stale when the
files at that path are regenerated — exactly what the build driver does
to the testdata between rounds, and what any production re-ingest does
to a lake table. Folding the source file's (size, mtime) into the key
makes a regenerated corpus resolve to a NEW store path, so the index
rebuilds instead of serving answers for data that no longer exists.
(Stale stores are abandoned on disk — cheap, and a janitor can sweep
them by prefix.)
"""

from __future__ import annotations

import hashlib
import os


def corpus_store_key(sf_dir: str, table: str, algo: str = "") -> str:
    """8-hex key identifying (path, content-version, algorithm-version)
    of one corpus table. Content-version = size + mtime_ns of the
    table's parquet file (or the directory's file listing when the
    table is a directory), so any regeneration changes the key.
    ``algo`` folds the index algorithm's version into the key, so a
    change to how the index is BUILT (e.g. a new IVF seed-selection
    scheme) also resolves to a new store instead of serving cells laid
    out by the old algorithm."""
    path = os.path.join(os.path.abspath(sf_dir), f"{table}.parquet")
    sig = [path, algo] if algo else [path]
    try:
        if os.path.isdir(path):
            for root, _dirs, files in sorted(os.walk(path)):
                for f in sorted(files):
                    st = os.stat(os.path.join(root, f))
                    sig.append(f"{f}:{st.st_size}:{st.st_mtime_ns}")
        else:
            st = os.stat(path)
            sig.append(f"{st.st_size}:{st.st_mtime_ns}")
    except OSError:
        pass  # unstat-able (object store): fall back to path-only keying
    return hashlib.md5("|".join(sig).encode()).hexdigest()[:8]
