"""Logging setup: the reference's logger surface, stdlib-only.

The reference wires an `es-translator` logger with a syslog handler
plus a (colored) stdout handler and attaches both from the CLI
(es_translator/logger.py:14-50, cli.py:195,258). Same surface here —
`logging.handlers.SysLogHandler` is stdlib, so no dependency is
needed; only the `coloredlogs` cosmetics are dropped (plain
StreamHandler). Engine modules log under the `sparkbm25` namespace;
build/search lineage additionally lands in the manifest (catalog.py),
which is the durable record — these handlers are the operational
stream the reference's ops setup expects.
"""

from __future__ import annotations

import logging
import sys
from logging.handlers import SysLogHandler

logger = logging.getLogger("sparkbm25")
logger.setLevel(logging.INFO)


def default_log_formatter() -> logging.Formatter:
    """Timestamp :: name :: level :: message (reference
    logger.py:18-24 format, verbatim)."""
    return logging.Formatter(
        "%(asctime)s :: %(name)s :: %(levelname)s :: %(message)s")


def add_syslog_handler(address: str = "localhost", port: int = 514,
                       facility: int = SysLogHandler.LOG_LOCAL7) -> logging.Handler:
    """Attach a syslog handler (reference logger.py:27-39; the
    LOG_LOCAL7 default facility matches). Returns the handler so
    callers/tests can detach it."""
    h = SysLogHandler(address=(address, port), facility=facility)
    h.setLevel(logging.INFO)
    h.setFormatter(default_log_formatter())
    logger.addHandler(h)
    return h


def add_stdout_handler(level: int = logging.ERROR) -> logging.Handler:
    """Attach a stdout handler (reference logger.py:42-50, minus the
    coloredlogs cosmetics)."""
    h = logging.StreamHandler(sys.stdout)
    h.setLevel(level)
    h.setFormatter(logging.Formatter("%(levelname)s %(message)s"))
    logger.addHandler(h)
    return h
