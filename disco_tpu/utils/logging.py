"""Leveled logging + phase timing.

Replaces the reference's logcpp logger (levels ERROR..DEBUG4,
src/SimplifyGraph/src/logcpp/log.h) and the CLOCKSTART/CLOCKSTOP wall-time +
RSS-delta telemetry (src/BuildGraph/src/Common.h:71-95,
src/SimplifyGraph/src/Config.h:129-134)."""
import logging
import os
import resource
import time
from contextlib import contextmanager

LEVELS = {"ERROR": logging.ERROR, "WARNING": logging.WARNING,
          "INFO": logging.INFO, "DEBUG": logging.DEBUG,
          "DEBUG1": logging.DEBUG, "DEBUG2": logging.DEBUG,
          "DEBUG3": logging.DEBUG, "DEBUG4": logging.DEBUG}

log = logging.getLogger("disco_tpu")
if not log.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(message)s"))
    log.addHandler(_h)
    log.setLevel(LEVELS.get(os.environ.get("DISCO_TPU_LOG", "WARNING"),
                            logging.WARNING))


def set_level(name: str) -> None:
    log.setLevel(LEVELS.get(name.upper(), logging.INFO))


def _rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def malloc_trim() -> None:
    """Return freed glibc heap pages to the OS.  Native phases (the
    in-process parsimplify arena, relation buffers) leave hundreds of MB
    of freed-but-retained heap behind; without the trim the NEXT phase's
    allocations stack on top of it and set a needlessly high peak RSS
    (the reference runs parsimplify as a separate process, so its peak
    never stacks — this is the in-process equivalent)."""
    import ctypes
    try:
        ctypes.CDLL("libc.so.6").malloc_trim(0)
    except OSError:
        pass


@contextmanager
def clock(name: str):
    """CLOCKSTART/CLOCKSTOP equivalent: wall seconds + RSS delta.

    DISCO_TPU_TRACEMALLOC=N additionally prints the top-N allocation
    sites (grouped by line) live at phase exit — the memory-diet
    diagnostic used for docs/MEMORY_PLAN.md."""
    t0 = time.perf_counter()
    m0 = _rss_mb()
    log.debug(">>> %s()", name)
    try:
        yield
    finally:
        log.info("<<< %s(): %.3fs, rss %.0f -> %.0f MB", name,
                 time.perf_counter() - t0, m0, _rss_mb())
        topn = int(os.environ.get("DISCO_TPU_TRACEMALLOC", "0") or 0)
        if topn:
            import tracemalloc
            if not tracemalloc.is_tracing():
                tracemalloc.start()
            else:
                snap = tracemalloc.take_snapshot()
                for stat in snap.statistics("lineno")[:topn]:
                    log.info("    [mem] %s", stat)
