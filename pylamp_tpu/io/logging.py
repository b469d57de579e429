"""Structured per-step metrics (SURVEY.md §5 'Metrics / logging'):
one JSON line per step with the [DRIVER] metric quantities (v_rms, vmax, dt,
Krylov iterations, residuals, wall time per phase)."""
from __future__ import annotations

import json
import sys
import time


class MetricsLogger:
    def __init__(self, path: str | None = None, echo: bool = False):
        if path:
            import os

            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._fh = open(path, "a") if path else None
        self._echo = echo
        self._t0 = time.perf_counter()

    def log(self, record: dict):
        record = {
            k: (float(v) if hasattr(v, "dtype") and getattr(v, "ndim", 1) == 0 else v)
            for k, v in record.items()
        }
        record.setdefault("wall_s", time.perf_counter() - self._t0)
        line = json.dumps(record)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        if self._echo:
            print(line, file=sys.stderr)

    def close(self):
        if self._fh:
            self._fh.close()
