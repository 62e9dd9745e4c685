"""Structured logging (reference ``src/config/logging_config.py:9-61``).

The reference configures structlog with a console-vs-JSON renderer
toggle, ISO timestamps, and an optional rotating file handler, and
``get_logger`` binds (service, env) context. structlog is not baked
into this container, so the same surface rides stdlib ``logging``:

- ``configure_logging(settings)`` — stdout handler always; rotating
  ``logs/app.log`` when ``log_to_file``; level from ``log_level``;
  renderer from ``log_format`` (``console`` | ``json``).
- ``get_logger(name, settings)`` — a :class:`BoundLogger` carrying a
  context dict; ``.bind(**kw)`` returns a new logger with merged
  context (structlog's immutable-bind semantics); event methods accept
  arbitrary key-value fields.

Scale stance: logging is driver-side only — executors never call this
(Spark ships its own log4j pipeline); one process, one config call.
"""

from __future__ import annotations

import datetime as _dt
import json
import logging
import sys
from logging.handlers import RotatingFileHandler
from pathlib import Path
from typing import Any

_STRUCT_ATTR = "_structured_fields"


def _record_fields(record: logging.Record) -> dict[str, Any]:
    return getattr(record, _STRUCT_ATTR, {})


class JsonFormatter(logging.Formatter):
    """One JSON object per line: event, level, logger, ISO timestamp,
    then the bound/structured fields (the structlog JSONRenderer shape
    the reference asserts on: ``event`` and ``level`` keys present)."""

    def format(self, record: logging.Record) -> str:
        entry: dict[str, Any] = {
            "event": record.getMessage(),
            "level": record.levelname.lower(),
            "logger": record.name,
            "timestamp": _dt.datetime.fromtimestamp(
                record.created, _dt.timezone.utc
            ).isoformat(),
        }
        entry.update(_record_fields(record))
        if record.exc_info:
            entry["exception"] = self.formatException(record.exc_info)
        return json.dumps(entry, default=str)


class ConsoleFormatter(logging.Formatter):
    """Human renderer: ``timestamp [level] logger: event k=v ...``."""

    def format(self, record: logging.Record) -> str:
        ts = _dt.datetime.fromtimestamp(record.created).strftime("%H:%M:%S")
        fields = " ".join(f"{k}={v}" for k, v in _record_fields(record).items())
        base = f"{ts} [{record.levelname.lower():<8}] {record.name}: {record.getMessage()}"
        out = f"{base} {fields}".rstrip()
        if record.exc_info:
            out += "\n" + self.formatException(record.exc_info)
        return out


class BoundLogger:
    """structlog-style bound logger over a stdlib logger: immutable
    ``bind``, event methods taking keyword fields."""

    def __init__(self, logger: logging.Logger, context: dict[str, Any] | None = None):
        self._logger = logger
        self._context = dict(context or {})

    def bind(self, **fields: Any) -> "BoundLogger":
        return BoundLogger(self._logger, {**self._context, **fields})

    def _log(self, level: int, event: str, exc_info=None, **fields: Any) -> None:
        self._logger.log(
            level,
            event,
            exc_info=exc_info,
            extra={_STRUCT_ATTR: {**self._context, **fields}},
        )

    def debug(self, event: str, **fields: Any) -> None:
        self._log(logging.DEBUG, event, **fields)

    def info(self, event: str, **fields: Any) -> None:
        self._log(logging.INFO, event, **fields)

    def warning(self, event: str, **fields: Any) -> None:
        self._log(logging.WARNING, event, **fields)

    def error(self, event: str, exc_info=None, **fields: Any) -> None:
        self._log(logging.ERROR, event, exc_info=exc_info, **fields)


def configure_logging(settings_obj) -> None:
    """Configure root logging from Settings (reference
    ``logging_config.py:9-33``): stdout always, rotating file when
    ``log_to_file``, console-vs-JSON formatter from ``log_format``.
    Re-invocation reconfigures (idempotent via ``force``)."""
    formatter: logging.Formatter = (
        JsonFormatter() if settings_obj.log_format.lower() == "json" else ConsoleFormatter()
    )
    handlers: list[logging.Handler] = [logging.StreamHandler(sys.stdout)]
    if settings_obj.log_to_file:
        log_file_path = Path("logs/app.log")
        log_file_path.parent.mkdir(parents=True, exist_ok=True)
        handlers.append(
            RotatingFileHandler(
                log_file_path,
                maxBytes=settings_obj.log_file_max_bytes,
                backupCount=settings_obj.log_file_backup_count,
                encoding="utf-8",
            )
        )
    for h in handlers:
        h.setFormatter(formatter)
    logging.basicConfig(
        handlers=handlers,
        level=getattr(logging, settings_obj.log_level.upper(), logging.INFO),
        force=True,
    )


def get_logger(name: str, settings_obj=None) -> BoundLogger:
    """Named bound logger; with settings, binds (service, env) like the
    reference's ``get_logger`` (``logging_config.py:57-61``)."""
    log = BoundLogger(logging.getLogger(name))
    if settings_obj is not None:
        log = log.bind(service=settings_obj.service_name, env=settings_obj.app_env)
    return log
