"""Depth-scoped console logging — the reference's only observability
surface, re-derived: ``ConsoleLogger`` gates debug lines behind
``--verbose`` (src/CatalogCrawler/Logic/ConsoleLogger.cs:11-15) and
``DepthLogger`` indents messages two spaces per nesting scope
(Logic/DepthLogger.cs:17-27, IndentScope 31-45).

The crawl/download plans are set-based, so scopes wrap PHASES (index →
pages → leaves), not per-URL driver loops — the tree shape of the
output matches the reference's sequential log without ever iterating
rows on the driver."""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Callable


class DepthLogger:
    """Two-space-per-depth indented logger with a verbose gate.

    ``info`` always writes; ``debug`` writes only when ``verbose``
    (ConsoleLogger.cs:14: Debug vs Information threshold). ``indent()``
    is a context manager, the ``using (logger.Indent())`` analog.
    Thread-safe like the reference's Interlocked counter — Spark
    listener threads may log concurrently with the driver loop."""

    def __init__(self, write: Callable[[str], None] | None = None, *,
                 verbose: bool = False):
        self._write = write if write is not None else print
        self._verbose = verbose
        self._depth = 0
        self._lock = threading.Lock()

    @property
    def verbose(self) -> bool:
        return self._verbose

    @contextmanager
    def indent(self):
        with self._lock:
            self._depth += 1
        try:
            yield self
        finally:
            with self._lock:
                self._depth -= 1

    def info(self, message: str, *args) -> None:
        self._emit(message, args)

    def debug(self, message: str, *args) -> None:
        if self._verbose:
            self._emit(message, args)

    def _emit(self, message: str, args: tuple) -> None:
        text = message.format(*args) if args else message
        self._write("  " * self._depth + text)


class NullLogger(DepthLogger):
    """Default when no logger is passed: every line is dropped, zero
    formatting cost for hot paths (format() runs inside _emit only)."""

    def __init__(self):
        super().__init__(write=lambda _line: None, verbose=False)

    def _emit(self, message: str, args: tuple) -> None:  # noqa: D401
        pass
