"""Session-lifetime scratch directories for sink→source queries.

Round-trip queries write through a sink into a scratch directory and
return a plan that lazily reads it back, so the scratch data must
outlive plan CONSTRUCTION but not the process. The r4 shape was
``localCheckpoint(eager=True)`` + immediate ``rmtree``: correct, but
it pins the whole read-back in executor storage memory — fine for a
25-row dim, wrong for the corpus-sized tables the same queries
roundtrip at real SF — and it leaves persistent blocks whose release
depends on nondeterministic driver GC (a long-lived library session
accumulates them).

``scratch_dir`` instead registers the directory for removal at
interpreter exit: returned plans stay LAZY (no executor storage, no
driver materialization, valid at any scale), repeated harness runs in
one process reuse nothing and leak nothing, and process exit reclaims
the disk. The trade — scratch bytes live until exit instead of being
freed per-query — is bounded by what the query itself wrote.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_DIRS: list[str] = []


def scratch_dir(prefix: str) -> str:
    """mkdtemp whose tree is removed at interpreter exit."""
    d = tempfile.mkdtemp(prefix=prefix)
    _DIRS.append(d)
    return d


def register_scratch(path: str) -> str:
    """Adopt an existing directory into exit-time cleanup (for plan
    builders that mkdtemp themselves and hand ownership to the
    caller)."""
    _DIRS.append(path)
    return path


@atexit.register
def _cleanup() -> None:
    while _DIRS:
        shutil.rmtree(_DIRS.pop(), ignore_errors=True)
