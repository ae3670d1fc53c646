"""link(2)-election commit primitive shared by the LogTable commit log
and the watermark pointer chain.

Why link and not O_EXCL-create-then-write: the linked target appears to
every reader FULLY FORMED or not at all (the payload was written and
fsynced under a temp name first), which is the property the round-9
multi-writer stress pin showed O_EXCL-then-write lacks. Why not
os.replace: replace is last-writer-wins, so it cannot elect a single
winner for a version slot.

The trade is a filesystem requirement: link(2) must work in the state
directory. POSIX local filesystems and most NFS servers support it;
some object-store FUSE layers (and exotic mount options) return
EPERM / ENOTSUP / EOPNOTSUPP instead. Swallowing that as a retryable
election loss would spin forever, and silently falling back to a
non-atomic publish would reintroduce the torn-read bug — so the
failure is surfaced as an immediate, descriptive error telling the
operator to relocate the state dir (or, on a real object store, to
swap in a conditional-PUT commit service, which is what Delta-on-S3
does).
"""

from __future__ import annotations

import errno
import os

_NO_LINK_ERRNOS = {
    errno.EPERM,
    errno.EACCES,
    errno.ENOTSUP,
    getattr(errno, "EOPNOTSUPP", errno.ENOTSUP),
    errno.EXDEV,
}


class HardLinksUnsupported(RuntimeError):
    """The state directory's filesystem refused link(2)."""


def link_publish(tmp: str, target: str) -> bool:
    """Atomically publish ``tmp`` (a fully written + fsynced payload)
    as ``target`` via hard-link election.

    Returns True when this caller won the election, False when a
    concurrent committer already owns ``target`` (caller re-reads state
    and retries at the next sequence). Raises HardLinksUnsupported —
    not an election loss — when the filesystem cannot link at all."""
    try:
        os.link(tmp, target)
    except FileExistsError:
        return False
    except OSError as exc:
        if exc.errno in _NO_LINK_ERRNOS:
            raise HardLinksUnsupported(
                f"atomic commit needs hard-link support (os.link) in "
                f"{os.path.dirname(target) or '.'!r}, but the filesystem "
                f"returned {errno.errorcode.get(exc.errno, exc.errno)}; "
                "move the state/table directory to a POSIX filesystem or "
                "use an object-store commit service"
            ) from exc
        raise
    return True
