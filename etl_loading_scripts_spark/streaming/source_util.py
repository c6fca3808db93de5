"""Shared plumbing for pointing the streaming file source at test parquet.

The streaming file source lists a DIRECTORY; the driver's test tables are
single parquet files → expose each through a temp dir containing one
symlink (a real deployment points the source at a landing directory or a
Kafka topic instead).

One helper instead of per-query copies because the guard has a trap: a
dangling symlink (testdata regenerated at a new path) makes
``os.path.exists(link)`` False while ``os.symlink`` still raises
``FileExistsError`` — the check must be ``os.path.lexists`` with a
re-link when the target differs (ADVICE r2).
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import uuid


def stream_source_dir(src: str, prefix: str = "events_stream", unique: bool = False) -> str:
    """Return a directory containing a single ``events.parquet`` symlink
    to ``src``, creating or repairing it as needed.

    ``unique=False`` (default): the directory name is derived from the
    source path, so repeated calls in one session reuse the same listing
    directory. ``unique=True``: a fresh uuid-suffixed directory per call,
    for queries that must not share file-source listing state (e.g.
    paired with a per-run checkpoint).
    """
    if unique:
        stream_dir = os.path.join(
            tempfile.gettempdir(), f"{prefix}_{uuid.uuid4().hex[:8]}"
        )
    else:
        stream_dir = os.path.join(
            tempfile.gettempdir(),
            f"{prefix}_{hashlib.md5(src.encode()).hexdigest()[:8]}",
        )
    os.makedirs(stream_dir, exist_ok=True)
    link = os.path.join(stream_dir, "events.parquet")
    if os.path.lexists(link):
        if os.path.realpath(link) == os.path.realpath(src) and os.path.exists(link):
            return stream_dir
        os.remove(link)  # dangling or retargeted — re-link below
    os.symlink(src, link)
    return stream_dir
