"""Structured observability (SURVEY.md §5): per-step device logs →
host jsonl/parquet; solver counters (cost, nodes, bound gap, residuals)
recorded explicitly so parity deltas vs the oracle are auditable.

Device code accumulates stacked arrays (e.g. ClosedLoopResult); this
module flushes them to disk, replacing the reference's pandas-DataFrame
sim logs with an append-only jsonl stream plus a pandas exporter.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import numpy as np


class StructuredLog:
    def __init__(self, path: Optional[str] = None, run_name: str = "run"):
        self.path = path
        self.run_name = run_name
        self.records = []
        self._fp = None
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._fp = open(path, "a", buffering=1)

    def log(self, step: int, **fields) -> None:
        rec: Dict[str, Any] = {"run": self.run_name, "step": int(step),
                               "t": time.time()}
        for k, v in fields.items():
            a = np.asarray(v)
            rec[k] = a.item() if a.ndim == 0 else a.tolist()
        self.records.append(rec)
        if self._fp:
            self._fp.write(json.dumps(rec) + "\n")

    def log_closed_loop(self, result, every: int = 1) -> None:
        """Flush a ClosedLoopResult's stacked device arrays step-wise."""
        objs = np.asarray(result.objs)
        xs = np.asarray(result.xs)
        vs = np.asarray(result.vs)
        nodes = np.asarray(result.nodes)
        found = np.asarray(result.found)
        for k in range(0, len(objs), every):
            self.log(k, x=xs[k], v=vs[k], obj=objs[k],
                     nodes=nodes[k], found=bool(found[k]))

    def to_pandas(self):
        import pandas as pd

        return pd.DataFrame(self.records)

    def to_parquet(self, path: str) -> str:
        """Columnar export for large scenario studies (needs pyarrow;
        the jsonl stream is the always-available fallback). List-valued
        columns (x, v) are kept as arrow lists."""
        self.to_pandas().to_parquet(path, index=False)
        return path

    def close(self) -> None:
        if self._fp:
            self._fp.close()
            self._fp = None
